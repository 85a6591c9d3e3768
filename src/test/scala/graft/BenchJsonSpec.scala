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

  test("tiny summary line is short, parseable, and carries top-10 spreads") {
    // 50 queries: the tiny line must stay bounded (top-10 only) and
    // still report the same poisoned total as the full line
    val results = (1 to 50).map(i =>
      (s"q$i", Seq(i * 0.1, i * 0.1 + 0.05, i * 0.1 - 0.05), true)) :+
      (("bad", Seq(-1.0), false))
    val line = Bench.renderSummaryJson(results, 3, "/data/sf0.1", "bench_detail.json")
    val node = mapper.readTree(line)
    assert(node.get("metric").asText() == "total")
    assert(node.get("n_queries").asInt() == 51)
    assert(node.get("failures").get(0).asText() == "bad")
    assert(node.get("slowest").size() == 10)
    // slowest entry is q50: [min, median, max] ordered
    val q50 = node.get("slowest").get("q50")
    assert(q50.get(0).asDouble() <= q50.get(1).asDouble())
    assert(q50.get(1).asDouble() <= q50.get(2).asDouble())
    val expectedTotal = (1 to 50).map(_ * 0.1).sum + 3600.0
    assert(math.abs(node.get("value").asDouble() - expectedTotal) < 1e-6)
    assert(line.length < 1200,
      s"tiny line must survive a bounded tail capture, got ${line.length} bytes")
  }

  test("paths with quotes/backslashes/control chars stay parseable") {
    val nasty = "/tmp/we\"ird\\dir\n"
    val tiny = Bench.renderSummaryJson(
      Seq(("a", Seq(1.0), true)), 1, nasty, nasty)
    assert(mapper.readTree(tiny).get("sf").asText() == nasty)
    assert(mapper.readTree(tiny).get("detail").asText() == nasty)
    val full = Bench.renderJson(Seq(("a", 1.0, true)), 1, nasty)
    assert(mapper.readTree(full).get("sf").asText() == nasty)
  }

  test("detail JSON carries per-query telemetry when collected") {
    val line = Bench.renderDetailJson(
      Seq(("a", Seq(1.0), true)), 1, "sf",
      Map("a" -> Bench.Tele(120L, 1048576L, 2097152L, 0L, 33554432L)))
    val a = mapper.readTree(line).get("queries").get("a")
    assert(a.get("gc_ms").asLong() == 120L)
    assert(a.get("shuffle_read_b").asLong() == 1048576L)
    assert(a.get("shuffle_write_b").asLong() == 2097152L)
    assert(a.get("spill_b").asLong() == 0L)
    assert(a.get("peak_exec_mem_b").asLong() == 33554432L)
  }

  test("detail JSON wall entries carry load AND disk attribution per run") {
    val line = Bench.renderDetailJson(
      Seq(("a", Seq(1.0), true)), 1, "sf",
      Map.empty,
      Map("a" -> Seq(Bench.RunWall(1000L, 2000L, 3.5, 4.5,
        50L * (1L << 30), 48L * (1L << 30), 2L * (1L << 30)))))
    val w = mapper.readTree(line).get("queries").get("a").get("wall").get(0)
    assert(w.size() == 7,
      "wall = [t0, t1, load@t0, load@t1, free_b@t0, free_b@t1, written_b]")
    assert(w.get(0).asLong() == 1000L && w.get(1).asLong() == 2000L)
    assert(w.get(2).asDouble() == 3.5 && w.get(3).asDouble() == 4.5)
    assert(w.get(4).asLong() == 50L * (1L << 30))
    assert(w.get(5).asLong() == 48L * (1L << 30))
    assert(w.get(6).asLong() == 2L * (1L << 30))
    // unmeasurable host: the -1 sentinels must render as valid JSON
    val none = Bench.renderDetailJson(
      Seq(("a", Seq(1.0), true)), 1, "sf", Map.empty,
      Map("a" -> Seq(Bench.RunWall(1L, 2L, -1.0, -1.0))))
    val w2 = mapper.readTree(none).get("queries").get("a").get("wall").get(0)
    assert(w2.get(4).asLong() == -1L && w2.get(6).asLong() == -1L)
  }

  test("tele aggregate takes medians for flow metrics, max for peak") {
    val agg = Bench.aggTele(Seq(
      Bench.Tele(10, 100, 200, 0, 1000),
      Bench.Tele(30, 300, 600, 6, 3000),
      Bench.Tele(20, 200, 400, 2, 2000))).get
    assert(agg == Bench.Tele(20, 200, 400, 2, 3000))
    assert(Bench.aggTele(Nil).isEmpty)
  }

  test("tiny summary line reports total gc_sec when provided") {
    val line = Bench.renderSummaryJson(
      Seq(("a", Seq(1.0), true)), 1, "sf", "d.json", 4.25)
    assert(mapper.readTree(line).get("gc_sec").asDouble() == 4.25)
    val without = Bench.renderSummaryJson(
      Seq(("a", Seq(1.0), true)), 1, "sf", "d.json")
    assert(mapper.readTree(without).get("gc_sec") == null)
  }

  test("detail JSON records min/median/max and raw runs per query") {
    val line = Bench.renderDetailJson(
      Seq(("a", Seq(1.0, 3.0, 2.0), true), ("bad", Seq(-1.0), false)), 3, "sf")
    val node = mapper.readTree(line)
    val a = node.get("queries").get("a")
    assert(a.get("min").asDouble() == 1.0)
    assert(a.get("median").asDouble() == 2.0)
    assert(a.get("max").asDouble() == 3.0)
    assert(a.get("runs").size() == 3)
    assert(node.get("queries").get("bad").get("median").asDouble() == -1.0)
    assert(math.abs(node.get("value").asDouble() - 3602.0) < 1e-9)
  }
}
