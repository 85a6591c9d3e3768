package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Token-PMI: batch properties and the streaming count-store twin. */
class PmiSpec extends SparkSuite {
  import spark.implicits._

  test("PMI is symmetric in marginals: swapping a uniform corpus is stable") {
    // a corpus where every bigram is unique: c_ab = 1 < minCount -> empty
    val docs = Seq((1L, "q w e r t y")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenPmiFromCounts(
      TextAnalysis.bigramRowsFrom(docs).groupBy("a", "b").agg(count(lit(1)).as("c_ab")),
      TextAnalysis.unigramRowsFrom(docs).groupBy("tok").agg(count(lit(1)).as("c")))
    assert(out.count() === 0)
  }

  test("a doubled pair scores ln(2) above its single-occurrence PMI floor") {
    // "a b" occurs twice, tokens a,b occur twice each; with minCount=1:
    // pmi(a,b) = ln(c_ab * N_u^2 / (N_b * c_a * c_b))
    val docs = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenPmiFromCounts(
      TextAnalysis.bigramRowsFrom(docs).groupBy("a", "b").agg(count(lit(1)).as("c_ab")),
      TextAnalysis.unigramRowsFrom(docs).groupBy("tok").agg(count(lit(1)).as("c")),
      minCount = 1)
    val pmi = out.collect()(0).getAs[Double]("pmi")
    // c_ab=2, N_u=4, N_b=2, c_a=c_b=2 -> ln(2*16/(2*4)) = ln 4
    assert(math.abs(pmi - math.round(math.log(4.0) * 1e6) / 1e6) < 1e-9)
  }

  test("streaming count stores reproduce the batch PMI table (stream==batch + replay)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "pmi-").toString
    val (bigP, uniP) = (s"$base/big", s"$base/uni")
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch(graft.streaming.StreamingPmi.countsSink(bigP, uniP))
      .start()
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val (high, low) = docs.partition(_._1 >= 250)
    try {
      Seq(high, low).foreach { chunk =>
        ms.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    val got = rows(graft.streaming.StreamingPmi.pmi(spark, bigP, uniP))
    val want = rows(TextAnalysis.tokenPmi(spark, sfDir))
    assert(want.nonEmpty)
    assert(got == want, s"stream==batch: ${got.length} streamed vs ${want.length} batch rows")
    // replayed micro-batch (failure before checkpoint commit) must not
    // double-count: it overwrites its own batch_id partition
    graft.streaming.StreamingPmi.countsSink(bigP, uniP)(
      low.toDF("doc_id", "text"), 1L)
    assert(rows(graft.streaming.StreamingPmi.pmi(spark, bigP, uniP)) == want,
      "batch replay must not change the PMI table")
  }
}
