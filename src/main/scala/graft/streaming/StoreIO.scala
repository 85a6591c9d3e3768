package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared store I/O for the streaming twins' parquet side-stores.
  *
  * Every twin keeps its cross-batch state (survivor sets, gram
  * indexes, centroid stats, ...) in an idempotently-rewritten parquet
  * directory and needs "read it, or an empty frame with the right
  * schema if no batch has committed yet". The existence probe goes
  * through Hadoop's FileSystem API — resolved against the store URI
  * itself — so the twins work identically on local paths, HDFS, and
  * object stores; `java.io.File(path).exists()` (the pattern this
  * replaces) is always false for `hdfs://`/`s3a://` URIs and would
  * silently read a populated store as empty.
  */
object StoreIO {

  /** True iff `path` exists on whatever filesystem its URI names. */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The parquet store at `path` with schema `ddl`, or an empty frame
    * with that schema if the store has not been written yet. The
    * schema is always imposed (never inferred) so batch 0 and batch N
    * plans are column-compatible.
    */
  def readOrEmpty(spark: SparkSession, path: String, ddl: String): DataFrame =
    if (exists(spark, path)) spark.read.schema(ddl).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType.fromDDL(ddl))
}
