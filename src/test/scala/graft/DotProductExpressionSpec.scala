package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{DotProduct, VectorFunctions}

class DotProductExpressionSpec extends SparkSuite {
  import spark.implicits._

  private def floatArr(xs: Seq[Float]) =
    array(xs.map(x => lit(x)): _*).cast("array<float>")

  test("native expression equals the HOF formulation bit-for-bit (property)") {
    DotProduct.register(spark)
    val genVec = Gen.listOfN(8, Gen.choose(-4.0f, 4.0f))
    val prop = Prop.forAll(genVec, genVec) { (a, b) =>
      val row = spark.range(1).select(
        call_function(DotProduct.Name, floatArr(a), floatArr(b)).as("native"),
        VectorFunctions.dot(floatArr(a), floatArr(b)).as("hof")).head()
      // identical sequential double accumulation -> bit equality
      java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(1))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("length mismatch and null inputs yield null (zip_with pad semantics)") {
    DotProduct.register(spark)
    val r = spark.range(1).select(
      call_function(DotProduct.Name, floatArr(Seq(1f, 2f)), floatArr(Seq(1f))).as("mismatch"),
      call_function(DotProduct.Name, lit(null).cast("array<float>"), floatArr(Seq(1f))).as("nullin"))
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("stays inside whole-stage codegen and matches a plain Scala dot") {
    DotProduct.register(spark)
    val a = Seq(1.5f, -2.25f, 3.0f, 0.5f)
    val b = Seq(0.25f, 4.0f, -1.0f, 2.0f)
    val df = spark.range(2).select(
      call_function(DotProduct.Name, floatArr(a), floatArr(b)).as("d"))
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("*(1) Project"), s"plan lacks codegen span:\n$plan")
    val expected = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    assert(df.collect().forall(_.getDouble(0) == expected))
  }
}
