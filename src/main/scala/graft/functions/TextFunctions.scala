package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the dedup / text-analysis operators.
  * All pure integer/string arithmetic over built-in higher-order
  * functions — bit-for-bit reproducible in DuckDB for the oracle, no
  * UDFs, fully distributed. (A codegen'd custom Catalyst `Expression`
  * for the polynomial hash is the planned fast path if the bench shows
  * HOF overhead at scale; semantics are frozen by these definitions.)
  */
object TextFunctions {

  /** Modulus for all rolling hashes: fits products in int64
    * ((p-1)*31 + 255 < 2^63). */
  val P: Long = 1000000007L

  /** Polynomial rolling hash of a string: fold (acc*31 + charCode) mod P
    * over the characters. ASCII corpus; identical in DuckDB via
    * list_reduce over ascii(substr(s,i,1)).
    */
  def polyHash(s: Column): Column = polyHashInner(s)

  /** Distinct character n-gram shingles of a string (the unit set for
    * Jaccard / MinHash / SimHash). Short strings (<n chars) yield the
    * whole string as one shingle.
    */
  def shingles(s: Column, n: Int): Column =
    array_distinct(
      transform(sequence(lit(1), greatest(length(s) - (n - 1), lit(1))),
        i => s.substr(i, lit(n))))

  /** Hash each shingle to a long in [0, P). */
  def shingleHashes(s: Column, n: Int): Column =
    transform(shingles(s, n), sh => polyHashInner(sh))

  private def polyHashInner(s: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(s)), i => ascii(s.substr(i, lit(1)))),
      lit(0L),
      (acc, c) => (acc * 31 + c) % P)

  /** polyHash specialised to strings of length <= `n` (shingles),
    * unrolled into a chained-when Horner fold of PURE scalar
    * expressions. The generic [[polyHash]] is a higher-order-function
    * fold, and any HOF in an expression tree disables whole-stage
    * codegen for the entire projection — measured 4-8× slower on the
    * shingle hot path. Step k applies (acc*31 + ascii(c_k)) mod P only
    * while k <= length(s), so the result equals the per-step-mod fold
    * for every length <= n.
    */
  def polyHashFixed(s: Column, n: Int): Column = {
    require(n >= 1 && n <= 64, s"polyHashFixed: unrolled width $n out of range")
    (1 to n).foldLeft(lit(0L)) { (acc, k) =>
      when(length(s) >= k,
        (acc * 31 + ascii(substring(s, k, 1)).cast("long")) % P)
        .otherwise(acc)
    }
  }

  /** MinHash signature: k values, h_i = min over shingle hashes x of
    * ((2i+1)*x + (5i+3)) mod P. Odd multipliers, all arithmetic exact
    * in int64.
    */
  def minhashSignature(hashes: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(hashes, x => ((i * 2 + 1) * x + (i * 5 + 3)) % P)))

  /** 32-bit SimHash from shingle hashes: bit j of the result is set iff
    * the majority of shingle hashes have bit j set (sum of ±1 votes > 0).
    * The bit loop is unrolled at the Scala level (shiftleft/shiftright
    * take a literal Int shift), producing one flat codegen'd expression.
    */
  def simhash32(hashes: Column): Column =
    (0 until 32).map { j =>
      val votes = aggregate(
        transform(hashes, h => shiftright(h, j).bitwiseAND(lit(1L)) * 2 - 1),
        lit(0L), (a, v) => a + v)
      when(votes > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
}
