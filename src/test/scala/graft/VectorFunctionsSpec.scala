package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

class VectorFunctionsSpec extends SparkSuite {
  import spark.implicits._

  private def vec(xs: Double*) = array(xs.map(x => lit(x.toFloat)): _*)

  private def eval1(c: org.apache.spark.sql.Column): Double =
    spark.range(1).select(c.as("v")).head().getDouble(0)

  test("dot product in double precision") {
    assert(eval1(VectorFunctions.dot(vec(1, 2, 3), vec(4, 5, 6))) == 32.0)
  }

  test("l2 norm and cosine") {
    assert(eval1(VectorFunctions.l2Norm(vec(3, 4))) == 5.0)
    assert(math.abs(eval1(VectorFunctions.cosine(vec(1, 2), vec(1, 2))) - 1.0) < 1e-12)
    assert(math.abs(eval1(VectorFunctions.cosine(vec(1, 0), vec(0, 1)))) < 1e-12)
  }

  test("lshBucket matches a plain-Scala sign computation") {
    val emb = Array.tabulate(8)(i => (i + 1).toFloat)
    val got = spark.range(1)
      .select(VectorFunctions.lshBucket(
        array(emb.map(lit(_)): _*), nPlanes = 4, dim = 8).as("b"))
      .head().getLong(0)
    val want = (0 until 4).map { j =>
      val proj = (0 until 8).map { i =>
        val w = ((j * 64L + i) * 1103515245L + 12345L) % 65536L - 32768L
        emb(i).toDouble * w.toDouble
      }.sum
      if (proj > 0) 1L << j else 0L
    }.sum
    assert(got == want)
  }

  test("lshBucket fails loudly on a dimension mismatch (no silent null-padding)") {
    val e = intercept[Exception] {
      spark.range(1)
        .select(VectorFunctions.lshBucket(vec(1, 2, 3), nPlanes = 4, dim = 8).as("b"))
        .collect()
    }
    assert(e.getMessage.contains("lshBucket"), s"unexpected: ${e.getMessage}")
  }
}
