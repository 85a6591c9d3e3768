package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.RefPipeline
import graft.streaming.{Sinks, StreamingSma}
import graft.streaming.StreamingSma.Tick

/** Stream/batch consistency (the key invariant per SURVEY §5.4) and
  * the observer fan-out semantics.
  */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  private def ticks(n: Int): Seq[Tick] =
    (1 to n).map(i => Tick(f"e$i%03d", if (i % 3 == 0) "B" else "A", i * 1.5))

  test("streaming SMA equals the batch window formulation across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Tick]
    val q = StreamingSma.withMovingAverage(ms.toDS(), n = 5)
      .writeStream.format("memory").queryName("sma_stream")
      .outputMode("append").start()
    try {
      val data = ticks(14)
      // three uneven micro-batches — state must carry across them
      ms.addData(data.take(4))
      q.processAllAvailable()
      ms.addData(data.slice(4, 9))
      q.processAllAvailable()
      ms.addData(data.drop(9))
      q.processAllAvailable()

      val streamed = spark.table("sma_stream")
        .orderBy("id")
        .select("id", "symbol", "price", "moving_average").collect()
      val batch = RefPipeline.movingAverage(
          data.toDF("id", "symbol", "price"), n = 5)
        .orderBy("id")
        .select("id", "symbol", "price", "moving_average").collect()
      assert(streamed.length == batch.length)
      streamed.zip(batch).foreach { case (s, b) =>
        assert(s == b, s"stream row $s != batch row $b")
      }
      // sanity: warm-up emitted nulls, steady state emitted values
      assert(streamed.exists(_.isNullAt(3)) && streamed.exists(!_.isNullAt(3)))
    } finally q.stop()
  }

  test("fan-out delivers each batch to every sink; a failing sink is swallowed (K4)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Tick]
    val seen    = scala.collection.mutable.ArrayBuffer.empty[String]
    val alerted = scala.collection.mutable.ArrayBuffer.empty[String]
    val sinks: Seq[Sinks.Sink] = Seq(
      df => seen ++= df.select("id").as[String](implicitly).collect(),
      _ => throw new RuntimeException("boom"),  // must not poison the others
      df => alerted ++= df.filter(col("price") > 10.0)
        .select("id").as[String](implicitly).collect()
    )
    val q = Sinks.attach(ms.toDS(), sinks).start()
    try {
      ms.addData(ticks(8))
      q.processAllAvailable()
      assert(seen.sorted == (1 to 8).map(i => f"e$i%03d"))
      assert(alerted.sorted == Seq("e007", "e008"))  // prices 10.5, 12.0
    } finally q.stop()
  }

  test("config-gated logging sink honors log_level (K2)") {
    val logged = scala.collection.mutable.ArrayBuffer.empty[String]
    val df = Seq(("e1", 1.0)).toDF("id", "price")
    Sinks.logging(Sinks.Config(logLevel = "INFO"), logged += _)(df)
    Sinks.logging(Sinks.Config(logLevel = "WARN"), logged += _)(df)
    assert(logged.length == 1, "only the INFO-level config may deliver")
  }

  test("alert sink applies the strict threshold over moving_average (K3)") {
    var got: Array[Row] = Array.empty
    val df = Seq(("e1", 108.0), ("e2", 110.0)).toDF("id", "moving_average")
    Sinks.alerts(Sinks.Config(alertThreshold = 108.0), got = _)(df)
    assert(got.map(_.getString(0)).toSeq == Seq("e2"))
  }

  test("transformWithState SMA (API v2) equals the batch window formulation") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[Tick]
    val q = graft.streaming.StreamingSmaV2.withMovingAverage(ms.toDS(), n = 5)
      .writeStream.format("memory").queryName("sma_v2")
      .outputMode("append").start()
    try {
      val data = ticks(12)
      ms.addData(data.take(7))
      q.processAllAvailable()
      ms.addData(data.drop(7))
      q.processAllAvailable()
      val streamed = spark.table("sma_v2").orderBy("id")
        .select("id", "symbol", "price", "moving_average").collect()
      val batch = RefPipeline.movingAverage(
          data.toDF("id", "symbol", "price"), n = 5)
        .orderBy("id")
        .select("id", "symbol", "price", "moving_average").collect()
      assert(streamed.length == batch.length)
      streamed.zip(batch).foreach { case (s, b) => assert(s == b, s"$s != $b") }
    } finally {
      q.stop()
      old match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("stream-static join enriches ticks against a dimension table") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Tick]
    val sectors = Seq(("A", "tech"), ("B", "energy")).toDF("symbol", "sector")
    val q = ms.toDF().join(sectors, Seq("symbol"), "left")
      .writeStream.format("memory").queryName("enriched_stream")
      .outputMode("append").start()
    try {
      ms.addData(Tick("e1", "A", 1.0), Tick("e2", "B", 2.0), Tick("e3", "C", 3.0))
      q.processAllAvailable()
      val rows = spark.table("enriched_stream").orderBy("id")
        .select("id", "sector").collect()
        .map(r => (r.getString(0), Option(r.getString(1)))).toSeq
      assert(rows == Seq(("e1", Some("tech")), ("e2", Some("energy")), ("e3", None)))
    } finally q.stop()
  }

  test("streaming dedup removes duplicate ids across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Tick]
    val q = ms.toDS().dropDuplicates("id")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      ms.addData(Tick("e1", "A", 1.0), Tick("e2", "A", 2.0), Tick("e1", "A", 1.0))
      q.processAllAvailable()
      ms.addData(Tick("e2", "A", 2.0), Tick("e3", "A", 3.0))  // e2 dup from batch 1
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("id").as[String].collect().sorted
      assert(ids.toSeq == Seq("e1", "e2", "e3"), s"got ${ids.toSeq}")
    } finally q.stop()
  }

  test("SMA state survives a query restart from checkpoint") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "ckpt-").toString
    val ms = MemoryStream[Tick]
    val sma = StreamingSma.withMovingAverage(ms.toDS(), n = 5)
    // memory sink can't recover from a checkpoint; foreachBatch can
    val got = scala.collection.mutable.ArrayBuffer.empty[(String, Option[Double])]
    def writer = sma.writeStream
      .option("checkpointLocation", ckpt).outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[_], _: Long) =>
        got.synchronized {
          got ++= b.toDF().select("id", "moving_average").collect()
            .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        }
        ()
      }
    val q1 = writer.start()
    try {
      ms.addData((1 to 3).map(i => Tick(f"e$i", "A", i.toDouble)))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(got.map(_._1).sorted.toSeq == Seq("e1", "e2", "e3"))
    got.clear()
    // restart against the same checkpoint: the per-key buffer of 3
    // prices must be restored, so the 5th overall tick completes the window
    val q2 = writer.start()
    try {
      ms.addData(Seq(Tick("e4", "A", 4.0), Tick("e5", "A", 5.0)))
      q2.processAllAvailable()
      val rows = got.sortBy(_._1).toSeq
      assert(rows.map(_._1) == Seq("e4", "e5"), s"got $rows")
      assert(rows(0)._2.isEmpty, "4th tick still warming up")
      assert(rows(1)._2.contains(3.0), "5th tick: mean(1..5) from restored state")
    } finally q2.stop()
  }

  test("dead-letter split: invalid records carry a reason, valid records flow on") {
    val df = Seq(
      ("e1", Option(10.0)), ("e2", Option.empty[Double]), ("e3", Option(-1.0))
    ).toDF("id", "price").withColumn("volume", lit(1L))
    val (valid, rejected) = RefPipeline.cleanWithDeadLetter(df)
    assert(valid.select("id").as[String].collect().toSeq == Seq("e1"))
    val rej = rejected.orderBy("id").select("id", "reject_reason").collect()
    assert(rej.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("e2", "null_price"), ("e3", "non_positive_price")))
  }

  test("watermarked hourly window aggregates by event time") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, Double)]
    val stream = ms.toDF().toDF("ts", "event_type", "value")
    val q = StreamingSma.hourlyCounts(stream)
      .writeStream.format("memory").queryName("hourly_stream")
      .outputMode("complete").start()
    try {
      val h = 3600L * 1000
      ms.addData(
        (new Timestamp(h), "view", 1.0),
        (new Timestamp(h + 60_000), "view", 2.0),
        (new Timestamp(h + 120_000), "click", 4.0),
        (new Timestamp(2 * h + 60_000), "view", 8.0))
      q.processAllAvailable()
      val rows = spark.table("hourly_stream")
        .orderBy("bucket_start", "event_type")
        .select("event_type", "n_events", "sum_value").collect()
      assert(rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
        Seq(("click", 1L, 4.0), ("view", 2L, 3.0), ("view", 1L, 8.0)))
    } finally q.stop()
  }
}
