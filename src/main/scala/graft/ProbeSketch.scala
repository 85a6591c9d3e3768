package graft
import org.apache.spark.sql.functions._
object ProbeSketch {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001","sf0.01","sf0.1")) {
      val li = Tables.lineitem(spark, s"/root/testdata/$sf")
      li.groupBy("l_returnflag").agg(
        approx_count_distinct(col("l_partkey")).cast("bigint").as("approx"),
        countDistinct(col("l_partkey")).as("exact"),
        expr("approx_percentile(l_quantity, 0.5)").as("p50a"),
        expr("percentile(l_quantity, 0.5)").as("p50e"),
        count(lit(1)).as("n"))
       .withColumn("hll_rel_err", abs(col("approx")-col("exact"))/col("exact"))
       .orderBy("l_returnflag").show(false)
      println(s"--- $sf done")
    }
    spark.stop()
  }
}
