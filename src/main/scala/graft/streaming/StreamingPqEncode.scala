package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Incremental PQ encoding over an embedding stream — the ingest side
  * of a vector store: the batch trainer publishes its codebooks
  * ([[Similarity.pqModel]]), and every arriving batch of vectors
  * is encoded to its 8 sub-codes (the ~64x-compressed form
  * [[Similarity.ivfPqRecall]] searches) and appended to the code
  * store. Encoding is per-vector against a FIXED codebook — no
  * cross-batch state at all — so the union of per-batch codes over
  * ANY split equals the batch encoding exactly (stream==batch
  * asserted in StreamingSpec; the arithmetic is shared code, not a
  * reimplementation: [[Similarity.pqMicroUnits]] +
  * [[Similarity.pqAssign]]).
  *
  * Scale shape: the codebook broadcast is 128 rows x 8 dims; each
  * batch contributes one (vec_id, sub, cid) row per subspace — 8
  * small ints per vector, which IS the compression. Batch replay is
  * idempotent: partitioned by batch_id with dynamic partition
  * overwrite ([[StreamingDedup]]'s contract).
  */
object StreamingPqEncode {

  private val CodeSchema = "vec_id BIGINT, sub BIGINT, cid BIGINT, batch_id BIGINT"

  /** All codes encoded so far `(vec_id, sub, cid)`. */
  def readCodes(spark: SparkSession, codesPath: String): DataFrame =
    if (new java.io.File(codesPath).exists())
      spark.read.schema(CodeSchema).parquet(codesPath)
        .select("vec_id", "sub", "cid")
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(CodeSchema))
      .select("vec_id", "sub", "cid")

  /** foreachBatch body: encode one micro-batch of
    * `(vec_id, embedding, ...)` rows against the published codebooks
    * and append its codes.
    */
  def encodeSink(codebookPath: String, codesPath: String): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val books = spark.read.parquet(codebookPath)
      Similarity.pqAssign(Similarity.pqMicroUnits(batch), books)
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(codesPath)
      ()
  }
}
