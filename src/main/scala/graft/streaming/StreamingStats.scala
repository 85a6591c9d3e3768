package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental hypothesis-test statistics — the inferential member of
  * the streaming-twin family: the Welch-t pair table and the
  * chi-square independence test are both functions of BOUNDED
  * sufficient statistics (per-category count/sum/sum-of-squares;
  * contingency cell counts), so each arriving micro-batch appends its
  * partial statistics to a durable store and the fold reproduces the
  * batch test EXACTLY — integer/decimal sums are split- and
  * order-independent, and the final expression is shared verbatim
  * with the batch operator ([[graft.operators.Stats.welchFromStats]]
  * / [[graft.operators.Stats.chiFromCells]]).
  *
  * This is how a monitoring plane actually runs an A/B significance
  * test over an unbounded stream: never re-scan history, keep
  * category-bounded partials, re-evaluate the closed-form statistic
  * after each batch.
  *
  * Scale shape: executor state ZERO; the store carries
  * (categories x batches) rows of partials, never events. Batch
  * replay is idempotent: batch_id-partitioned dynamic overwrite
  * ([[StreamingDedup]]'s contract); store probes route through
  * Hadoop FileSystem ([[StoreIO]]) so hdfs://s3a:// paths work.
  */
object StreamingStats {

  private val WelchSchema =
    "event_type STRING, n BIGINT, s1 DECIMAL(38,0), s2 DECIMAL(38,0), batch_id BIGINT"
  private val CellSchema =
    "pri STRING, st STRING, o BIGINT, batch_id BIGINT"

  /** foreachBatch body: fold one micro-batch of
    * `(event_type, value, ...)` events into the Welch partials store. */
  def welchSink(statsPath: String): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      batch
        .withColumn("m", round(col("value") * 100).cast("bigint"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
             sum(col("m").cast("decimal(28,0)")).cast("decimal(38,0)").as("s1"),
             sum((col("m") * col("m")).cast("decimal(28,0)")).cast("decimal(38,0)")
               .as("s2"))
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(statsPath)
      ()
  }

  /** The Welch pair table over everything streamed — identical
    * columns and values to [[graft.operators.Stats.welchT]] over the
    * same events. */
  def welchPairs(spark: SparkSession, statsPath: String): DataFrame =
    graft.operators.Stats.welchFromStats(
      StoreIO.readOrEmpty(spark, statsPath, WelchSchema)
        .groupBy("event_type")
        .agg(sum(col("n")).as("n"),
             sum(col("s1")).as("s1"), sum(col("s2")).as("s2")))

  /** foreachBatch body: fold one micro-batch of order rows into the
    * contingency cell store. */
  def chiSink(cellPath: String): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      batch
        .groupBy(col("o_orderpriority").as("pri"), col("o_orderstatus").as("st"))
        .agg(count(lit(1)).as("o"))
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(cellPath)
      ()
  }

  /** Chi-square + Cramér's V over everything streamed — identical to
    * [[graft.operators.Stats.chiSquare]] over the same orders. */
  def chiSquare(spark: SparkSession, cellPath: String): DataFrame =
    graft.operators.Stats.chiFromCells(
      StoreIO.readOrEmpty(spark, cellPath, CellSchema)
        .groupBy("pri", "st")
        .agg(sum(col("o")).as("o")))
}
