package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT>` embedding columns, built entirely
  * from codegen-friendly higher-order functions — no UDFs, so the
  * expressions inline into Catalyst plans and distribute trivially.
  * Floats are cast to double BEFORE multiplying so both Spark and the
  * DuckDB oracle do identical IEEE double arithmetic (float→double is
  * exact); sums are sequential folds in both engines and consumers
  * round(.,6) any emitted similarity.
  */
object VectorFunctions {

  /** Dot product of two float-array columns in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Deterministic integer pseudo-weight for hyperplane `j`, dimension
    * `i` (0-based): a 16-bit signed LCG step. Identical integer
    * arithmetic is expressible in DuckDB, which makes sign-LSH bucket
    * assignments oracle-checkable — no RNG state to ship.
    */
  def planeWeight(j: Column, i: Column): Column =
    ((j * 64 + i) * lit(1103515245L) + lit(12345L)) % 65536 - 32768

  /** Sign-LSH bucket id from `nPlanes` deterministic hyperplanes: bit j
    * is the sign of <emb, w_j>. One narrow projection per row — the
    * 100 TB path for ANN: candidates are then found with an equi-join
    * on (bucket) instead of an O(n²) cross product.
    *
    * `dim` must equal the embedding length; rows of any other length
    * fail loudly (raise_error) instead of silently null-padding through
    * zip_with into wrong bucket bits. The plane loop is unrolled at the
    * Scala level — shiftleft needs a literal Int shift.
    */
  def lshBucket(emb: Column, nPlanes: Int, dim: Int): Column = {
    val bucket = (0 until nPlanes).map { j =>
      val proj = aggregate(
        zip_with(emb, sequence(lit(0), lit(dim - 1)),
          (x, i) => x.cast("double") * planeWeight(lit(j), i).cast("double")),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    when(size(emb) === dim, bucket)
      .otherwise(raise_error(concat(
        lit(s"lshBucket: expected $dim-dim embedding, got "), size(emb).cast("string"))))
  }
}
