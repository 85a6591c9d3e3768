package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom Aggregator (SURVEY §2.9: "the analog for any stateful
  * custom aggregate"): single-pass bounded top-k per group, the
  * optimization the window-rank form of top-k forgoes — a row_number
  * window must SORT every row of a key, this keeps only k candidates
  * per partial aggregate and merges map-side, so per-key work is
  * O(n log k) with O(k) state instead of O(n log n) with O(n) spill.
  * For small k over hot keys at 100 TB this is the difference between
  * a bounded buffer and a giant sort.
  *
  * Ordering: price descending with (orderkey, linenumber) tie-breaks —
  * identical to the deterministic window formulation, which the test
  * suite asserts.
  */
object TopKAggregator {

  final case class Item(suppkey: Long, orderkey: Long, linenumber: Int, price: Double)

  private def lt(a: Item, b: Item): Boolean =
    a.price > b.price ||
      (a.price == b.price &&
        (a.orderkey < b.orderkey ||
          (a.orderkey == b.orderkey && a.linenumber < b.linenumber)))

  final class TopKByPrice(k: Int) extends Aggregator[Item, List[Item], Seq[Item]] {
    override def zero: List[Item] = Nil

    override def reduce(buf: List[Item], a: Item): List[Item] =
      insert(buf, a)

    override def merge(b1: List[Item], b2: List[Item]): List[Item] =
      b2.foldLeft(b1)(insert)

    /** Keep the buffer sorted (best first) and capped at k. */
    private def insert(buf: List[Item], a: Item): List[Item] = {
      val (better, worse) = buf.span(x => lt(x, a))
      val merged = better ::: (a :: worse)
      if (merged.length > k) merged.take(k) else merged
    }

    override def finish(reduction: List[Item]): Seq[Item] = reduction

    override def bufferEncoder: Encoder[List[Item]] = Encoders.kryo[List[Item]]
    override def outputEncoder: Encoder[Seq[Item]] = Encoders.kryo[Seq[Item]]
  }

  def topKByPrice(k: Int) = new TopKByPrice(k)
}
