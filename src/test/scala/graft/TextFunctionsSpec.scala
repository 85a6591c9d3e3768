package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.TextFunctions
import graft.functions.TextFunctions.P

class TextFunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("production exploded-codegen simhash equals the HOF reference formulation") {
    // The HOF path (docShingles -> simhash32) is the executable
    // REFERENCE implementation; the shipped Dedup.simhashDocs is the
    // codegen'd rewrite. This pins them equal so neither can drift.
    val production = graft.operators.Dedup.simhashDocs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val reference = graft.operators.Dedup.docShingles(spark, sfDir)
      .select(col("doc_id"), TextFunctions.simhash32(col("hashes")).as("simhash"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(production.nonEmpty && production == reference)
  }

  private def scalaPolyHash(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % P)

  private def eval1Long(c: org.apache.spark.sql.Column): Long =
    spark.range(1).select(c.as("v")).head().getLong(0)

  test("polyHash matches the reference fold") {
    for (s <- Seq("a", "hello world", "key agg row scan", "x" * 100)) {
      assert(eval1Long(TextFunctions.polyHash(lit(s))) == scalaPolyHash(s), s"for '$s'")
    }
  }

  test("polyHashFixed equals polyHash for every length <= n (codegen fast path)") {
    val prop = Prop.forAll(Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.choose(32.toChar, 126.toChar)).map(_.mkString))) { s =>
      eval1Long(TextFunctions.polyHashFixed(lit(s), 8)) == scalaPolyHash(s)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("shingles: distinct sliding character n-grams; short strings yield themselves") {
    val got = spark.range(1)
      .select(TextFunctions.shingles(lit("abcabc"), 4).as("s"))
      .head().getSeq[String](0)
    assert(got == Seq("abca", "bcab", "cabc"))
    val short = spark.range(1)
      .select(TextFunctions.shingles(lit("ab"), 4).as("s"))
      .head().getSeq[String](0)
    assert(short == Seq("ab"))
  }

  test("minhashSignature: k independent mins over the hash set") {
    val hashes = Seq(2L, 10L, 5L)
    val got = spark.range(1)
      .select(TextFunctions.minhashSignature(
        array(hashes.map(lit): _*), 4).as("sig"))
      .head().getSeq[Long](0)
    val want = (0 until 4).map { i =>
      hashes.map(x => ((i * 2 + 1) * x + (i * 5 + 3)) % P).min
    }
    assert(got == want)
  }

  test("simhash32 of a single hash is the hash itself (every bit vote = its bit)") {
    for (h <- Seq(0L, 1L, 0x5a5a5a5aL, P - 1)) {
      val got = spark.range(1)
        .select(TextFunctions.simhash32(array(lit(h))).as("s"))
        .head().getLong(0)
      assert(got == (h & 0xFFFFFFFFL), s"for $h")
    }
  }

  test("simhash32 majority vote across hashes") {
    // bits where >=2 of 3 hashes agree: {b0: 1,1,0 -> set}, {b1: 1,0,0 -> clear}
    val got = spark.range(1)
      .select(TextFunctions.simhash32(array(lit(3L), lit(1L), lit(0L))).as("s"))
      .head().getLong(0)
    assert(got == 1L)
  }
}
