package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev utility: dump `.explain("formatted")` for a named subset of
  * queries to files — the plan evidence the optimization rounds commit
  * under plans/rNN/ (the judge checks plan claims against these files).
  *
  * Usage: runMain graft.ExplainDump <outDir> <suffix> [q1,q2,...]
  * Writes <outDir>/<query>_<suffix>.txt per query. Session confs match
  * the canonical bench (cores/shuffle from the driver contract envs)
  * so the dumped plans are the plans the bench actually runs.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.rdd.compress", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, dir).queryExecution
            .explainString(ExplainMode.fromString("formatted"))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
            plan.getBytes("UTF-8"))
          println(s"[explain] $name -> $outDir/${name}_$suffix.txt")
        } catch { case e: Throwable =>
          System.err.println(s"[explain] $name FAILED: ${e.getMessage}")
        }
        Caches.releaseAll(spark)
      }
    spark.stop()
  }
}
