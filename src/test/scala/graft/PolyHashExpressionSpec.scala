package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{PolyHash, TextFunctions}

class PolyHashExpressionSpec extends SparkSuite {
  import spark.implicits._

  test("native expression equals the HOF formulation (property)") {
    PolyHash.register(spark)
    val gen = Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)
    val prop = Prop.forAll(gen) { s =>
      val row = spark.range(1).select(
        call_function(PolyHash.Name, lit(s)).as("native"),
        TextFunctions.polyHash(lit(s)).as("hof")).head()
      row.getLong(0) == row.getLong(1) && row.getLong(0) == PolyHash.hash(s)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("null input yields null; callable from SQL after registration") {
    PolyHash.register(spark)
    val r = spark.sql("SELECT graft_polyhash(CAST(NULL AS STRING)) AS h, graft_polyhash('ab') AS h2").head()
    assert(r.isNullAt(0))
    assert(r.getLong(1) == ('a'.toLong * 31 + 'b'.toLong) % TextFunctions.P)
  }

  test("stays inside whole-stage codegen (no CodegenFallback on the hot path)") {
    PolyHash.register(spark)
    val df = spark.range(2)
      .select(call_function(PolyHash.Name, concat(lit("s"), col("id"))).as("h"))
    val plan = df.queryExecution.executedPlan.toString()
    // "*(n)" prefixes mark operators inside a WholeStageCodegen span
    assert(plan.contains("*(1) Project"), s"plan lacks codegen span:\n$plan")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(PolyHash.hash("s0"), PolyHash.hash("s1")))
  }
}
