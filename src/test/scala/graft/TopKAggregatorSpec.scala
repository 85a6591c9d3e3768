package graft

import org.apache.spark.sql.functions._

import graft.functions.TopKAggregator
import graft.functions.TopKAggregator.Item
import graft.operators.Analytics

class TopKAggregatorSpec extends SparkSuite {
  import spark.implicits._

  test("bounded top-k aggregator equals the window-rank formulation") {
    // exercises the SHIPPED pipeline (the x_topk_agg query), not a
    // private re-implementation that could drift from it
    val fromAggregator = Analytics.topkPerSupplierAgg(spark, sfDir, k = 3)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "rk")
      .collect()

    val fromWindow = Analytics.topkPerSupplier(spark, sfDir, k = 3)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "rk")
      .collect()

    assert(fromAggregator.length == fromWindow.length)
    fromAggregator.zip(fromWindow).foreach { case (a, w) =>
      assert(a == w, s"aggregator row $a != window row $w")
    }
  }

  test("merge keeps order and cap across partial buffers") {
    val top = new TopKAggregator.TopKByPrice(2)
    val b1 = top.reduce(top.reduce(top.zero, Item(1, 10, 1, 5.0)), Item(1, 11, 1, 9.0))
    val b2 = top.reduce(top.reduce(top.zero, Item(1, 12, 1, 7.0)), Item(1, 13, 1, 1.0))
    val merged = top.merge(b1, b2)
    assert(merged.map(_.price) == List(9.0, 7.0))
  }
}
