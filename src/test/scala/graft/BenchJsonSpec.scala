package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The driver parses Bench's single JSON line with json.load — this
  * pins the contract: parseable, per-query medians under "queries",
  * a failure reported as -1 AND poisoning the total by +3600 s.
  */
class BenchJsonSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  test("all-pass render is valid JSON with the driver's expected fields") {
    val line = Bench.renderJson(
      Seq(("q1", 1.5, true), ("q2", 0.25, true)), 3, "/data/sf0.1")
    val node = mapper.readTree(line)
    assert(node.get("metric").asText() == "total")
    assert(node.get("unit").asText() == "sec")
    assert(node.get("runs").asInt() == 3)
    assert(node.get("sf").asText() == "/data/sf0.1")
    assert(math.abs(node.get("value").asDouble() - 1.75) < 1e-9)
    assert(node.get("queries").get("q1").asDouble() == 1.5)
    assert(node.get("failures").size() == 0)
  }

  test("median averages the two middle samples for even run counts") {
    // upper-middle alone reported the SLOWER of two runs as "median"
    assert(Bench.median(Seq(1.0, 3.0)) == 2.0)
    assert(Bench.median(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
    assert(Bench.median(Seq(5.0, 1.0, 3.0)) == 3.0)
    assert(Bench.median(Seq(7.5)) == 7.5)
  }

  test("a failed query reports -1 and poisons the total by an hour") {
    val line = Bench.renderJson(
      Seq(("ok", 2.0, true), ("bad", -1.0, false)), 3, "sf")
    val node = mapper.readTree(line)
    assert(node.get("queries").get("bad").asDouble() == -1.0)
    assert(node.get("failures").get(0).asText() == "bad")
    assert(math.abs(node.get("value").asDouble() - 3602.0) < 1e-9,
      "one failure must add a full hour so a broken query can never look fast")
  }
}
