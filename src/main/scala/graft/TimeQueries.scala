package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: time named SparkEntry queries (args) at
  * SPARK_GRAFT_SF_DIR on local[32] — the per-query feedback loop for
  * plan tuning between full Bench runs. Cache is cleared per query so
  * each pays its own cost.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (name <- args) {
      Caches.releaseAll(spark)
      // timer covers query CONSTRUCTION too: operators with eager
      // internal actions (persist fills, iterative loops) do real work
      // before a DataFrame is returned
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      // noop sink, same as Bench: count() would let Catalyst prune the
      // very projections being tuned
      df.write.mode("overwrite").format("noop").save()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$name: $secs%.2f s, ${df.count()} rows")
    }
    spark.stop()
  }
}
