package graft

import org.apache.spark.sql.functions._

/** Bucketed-storage co-location: several Analytics scale notes say
  * "at 100 TB, bucket both tables on the join key to remove the
  * shuffle" — this proves that claim on the actual engine. Both
  * sides are written bucketed+sorted by orderkey; the join must plan
  * as a SortMergeJoin with NO Exchange on either side.
  */
class BucketingSpec extends SparkSuite {

  test("join of co-bucketed tables runs without any shuffle exchange") {
    val nBuckets = 8
    Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderpriority")
      .write.bucketBy(nBuckets, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_bucketed")
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_extendedprice")
      .write.bucketBy(nBuckets, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_bucketed")

    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")  // tiny test tables would broadcast otherwise
      val joined = spark.table("lineitem_bucketed")
        .join(spark.table("orders_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle:\n$plan")
      // and it still computes the right thing
      val n = joined.count()
      assert(n == Tables.lineitem(spark, sfDir).count(),
        "every lineitem row joins its order")
    } finally {
      spark.conf.set(key, old)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
    }
  }
}
