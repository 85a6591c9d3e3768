package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev utility: per-query physical-plan stats (exchange/sort/BNL
  * counts) — a cheap smell test across the whole query set.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        def c(s: String) = plan.linesIterator.count(_.contains(s))
        val hash = c("Arguments: hashpartitioning")
        val range = c("Arguments: rangepartitioning")
        val bnl = c("BroadcastNestedLoopJoin")
        val cart = c("CartesianProduct")
        val sorts = plan.linesIterator.count(l => l.trim.matches("\\(\\d+\\) Sort(| \\[codegen.*)"))
        println(f"$name%-24s hash=$hash range=$range sort=$sorts bnl=$bnl cart=$cart")
        spark.catalog.clearCache()
      } catch { case e: Throwable =>
        println(s"$name AUDIT-FAIL ${String.valueOf(e.getMessage).take(80)}")
      }
    }
    spark.stop()
  }
}
