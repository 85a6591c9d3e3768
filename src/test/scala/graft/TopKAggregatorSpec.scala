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

  test("bounded min-k aggregator equals the salted-rank KMV sketch") {
    // exercises the SHIPPED pipelines (x_kmv_distinct vs x_kmv_agg)
    val fromWindow = graft.operators.Dedup.kmvDistinctShingles(spark, sfDir)
      .collect().map(_.toString).toSeq
    val fromAggregator = graft.operators.Dedup.kmvDistinctShinglesAgg(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(fromWindow.nonEmpty)
    assert(fromAggregator == fromWindow)
  }

  test("min-k buffer: any reduce/merge split yields the k smallest distinct values") {
    val agg = graft.functions.MinKAggregator.minK(4)
    val xs = Seq(9L, 3L, 3L, 7L, 1L, 8L, 1L, 5L, 2L, 9L, 4L)
    // straight fold
    val folded = xs.foldLeft(agg.zero)(agg.reduce)
    assert(folded == List(1L, 2L, 3L, 4L))
    // every split point: reduce two halves independently, then merge
    (0 to xs.length).foreach { cut =>
      val (l, r) = xs.splitAt(cut)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
                             r.foldLeft(agg.zero)(agg.reduce))
      assert(merged == List(1L, 2L, 3L, 4L), s"split at $cut: $merged")
    }
    // under-full buffer stays distinct and sorted
    val small = Seq(5L, 5L, 2L).foldLeft(agg.zero)(agg.reduce)
    assert(small == List(2L, 5L))
  }

  test("merge keeps order and cap across partial buffers") {
    val top = new TopKAggregator.TopKByPrice(2)
    val b1 = top.reduce(top.reduce(top.zero, Item(1, 10, 1, 5.0)), Item(1, 11, 1, 9.0))
    val b2 = top.reduce(top.reduce(top.zero, Item(1, 12, 1, 7.0)), Item(1, 13, 1, 1.0))
    val merged = top.merge(b1, b2)
    assert(merged.map(_.price) == List(9.0, 7.0))
  }
}
