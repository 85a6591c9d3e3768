package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded min-k Aggregator — the distributed fold of the KMV
  * distinct sketch ([[graft.operators.Dedup.kmvDistinctShingles]]'s
  * scale path): each partial aggregate keeps only the k smallest
  * DISTINCT values in an O(k) sorted buffer and merges map-side,
  * where the window-rank form shuffles the whole distinct-value set
  * and sorts it per group. At 100 TB the distinct-hash set per group
  * is vocabulary-sized (10^8+); the sketch buffer is k longs — this
  * Aggregator is the difference between shipping the vocabulary and
  * shipping the sketch. The buffer is a sketch-merge in the formal
  * sense: KMV unions combine by merging min-k sets, which is exactly
  * `merge`.
  *
  * Duplicate handling: an incoming value equal to a buffered one is
  * skipped; one larger than a full buffer's maximum cannot be among
  * the k smallest distinct and is dropped — so the buffer always
  * holds exactly the k smallest distinct values seen.
  */
object MinKAggregator {

  final class MinKDistinct(k: Int) extends Aggregator[Long, List[Long], Seq[Long]] {
    require(k >= 1, "min-k needs a positive buffer bound")

    override def zero: List[Long] = Nil

    override def reduce(buf: List[Long], a: Long): List[Long] = insert(buf, a)

    override def merge(b1: List[Long], b2: List[Long]): List[Long] =
      b2.foldLeft(b1)(insert)

    /** Keep the buffer ascending, distinct, and capped at k. */
    private def insert(buf: List[Long], a: Long): List[Long] = {
      val (smaller, rest) = buf.span(_ < a)
      if (rest.nonEmpty && rest.head == a) buf // already present
      else {
        val merged = smaller ::: (a :: rest)
        if (merged.length > k) merged.take(k) else merged
      }
    }

    override def finish(reduction: List[Long]): Seq[Long] = reduction

    override def bufferEncoder: Encoder[List[Long]] = Encoders.kryo[List[Long]]
    override def outputEncoder: Encoder[Seq[Long]] = Encoders.kryo[Seq[Long]]
  }

  /** Typed row counter — pairs with [[MinKDistinct]] in one grouped
    * aggregation so the exact distinct count and the sketch come from
    * a single pass over the pre-distincted rows.
    */
  final class CountAll extends Aggregator[Long, Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, a: Long): Long = b + 1
    override def merge(b1: Long, b2: Long): Long = b1 + b2
    override def finish(reduction: Long): Long = reduction
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  def minK(k: Int) = new MinKDistinct(k)
  def countAll = new CountAll
}
