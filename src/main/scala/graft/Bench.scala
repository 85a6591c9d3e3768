package graft
import org.apache.spark.sql.SparkSession

/** Headline bench: time every SparkEntry query at SPARK_GRAFT_SF_DIR,
  * print ONE JSON line. Failures are NOT masked: a failed query is
  * reported with time -1, listed in "failures", and poisons the
  * headline metric (one hour added per failure) so a broken query can
  * never make the bench look faster.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, ok) => s"\"" + k + "\":" + (if (ok) v else -1.0) }
      .mkString("{", ",", "}")
    val failures = results.filterNot(_._3).map(_._1)
    val total = results.filter(_._3).map(_._2).sum + 3600.0 * failures.size
    val failJson = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$failJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
