package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Winnowing fingerprint selection (Schleimer et al. SIGMOD'03): the
  * detection guarantee, the density bounds, the rightmost tie-break,
  * and the plan shape.
  */
class WinnowingSpec extends SparkSuite {
  import spark.implicits._

  private val k = Dedup.WinnowK
  private val w = Dedup.WinnowW

  private def docs(texts: (Long, String)*) =
    texts.toDF("doc_id", "text")

  test("guarantee: a shared run of w + k - 1 tokens yields a shared fingerprint") {
    // 11 shared tokens embedded in otherwise-disjoint documents
    val run = (0 until (w + k - 1)).map(i => s"s$i").mkString(" ")
    val a = ((0 until 20).map(i => s"a$i") :+ run) ++ (20 until 40).map(i => s"a$i")
    val b = ((0 until 15).map(i => s"b$i") :+ run) ++ (15 until 30).map(i => s"b$i")
    val sel = Dedup.winnowSelectedFrom(docs(1L -> a.mkString(" "), 2L -> b.mkString(" ")))
    val shared = sel.filter(col("doc_id") === 1).select("gh")
      .intersect(sel.filter(col("doc_id") === 2).select("gh"))
      .count()
    assert(shared >= 1, "winnowing guarantee violated: no shared fingerprint")
  }

  test("density bounds on the real corpus: windows/w <= n_fp <= windows") {
    val bad = Dedup.winnowStats(spark, sfDir)
      .withColumn("windows", greatest(col("n_grams") - (w - 1), lit(1L)))
      .filter(col("n_fp") > col("windows") ||
              col("n_fp") * w < col("windows"))
      .count()
    assert(bad === 0)
    assert(Dedup.winnowStats(spark, sfDir).count() > 0)
  }

  test("rightmost tie-break: an all-equal-hash document selects each window's last gram") {
    val n = 20 // tokens, all identical -> ng = 17 equal gram hashes
    val sel = Dedup.winnowSelectedFrom(docs(7L -> Seq.fill(n)("x").mkString(" ")))
    val ng = n - k + 1
    val positions = sel.select("pos").as[Long].collect().toSet
    assert(positions === (w.toLong to ng.toLong).toSet)
  }

  test("short documents (fewer grams than the window) still fingerprint") {
    val sel = Dedup.winnowSelectedFrom(docs(3L -> "t0 t1 t2 t3 t4")) // ng = 2 < w
    assert(sel.count() === 1) // one short window -> its (min, rightmost-tie) gram
  }

  test("corpus-wide guarantee audit measures recall exactly 1.0") {
    val r = Dedup.winnowGuaranteeAudit(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_truth_pairs") > 0)
    assert(r.getAs[Double]("recall") === 1.0)
  }

  test("overlap pairs surface on the real corpus; plan has no cartesian") {
    assert(Dedup.winnowOverlap(spark, sfDir).count() > 0,
      "fixture contains near-dup docs; winnowed overlap must find pairs")
    val plan = Dedup.winnowOverlap(spark, sfDir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("streaming fingerprint index reproduces the batch overlap report (stream==batch)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "winnow-").toString
    val index = s"$base/index"
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch(graft.streaming.StreamingWinnow.indexSink(index))
      .start()
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // out-of-order split: later-id docs arrive first
    val (high, low) = docs.partition(_._1 >= 250)
    try {
      Seq(high, low).foreach { chunk =>
        ms.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = pairs(graft.streaming.StreamingWinnow.overlap(spark, index))
    val want = pairs(Dedup.winnowOverlap(spark, sfDir))
    assert(want.nonEmpty)
    assert(got == want, s"stream==batch: ${got.length} streamed vs ${want.length} batch pairs")
    // the index equals the batch selection over the union of batches
    val idx = graft.streaming.StreamingWinnow.readIndex(spark, index)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batchSel = Dedup.winnowSelectedFrom(
        graft.Tables.documents(spark, sfDir))
      .select("doc_id", "gh").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(idx === batchSel)
    // replayed micro-batch must leave index and report unchanged
    graft.streaming.StreamingWinnow.indexSink(index)(
      low.toDF("doc_id", "text"), 1L)
    assert(pairs(graft.streaming.StreamingWinnow.overlap(spark, index)) == got,
      "batch replay must not change the overlap report")
  }
}
