package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the polynomial rolling hash
  * (fold (acc*31 + char) mod P) with `doGenCode` — the preferred
  * extension shape when built-in functions can't stay in codegen:
  * the HOF formulation ([[TextFunctions.polyHash]]) is interpreted
  * per character, this compiles to a tight Java loop inside
  * whole-stage codegen. Semantics are identical for BMP strings
  * (char-by-char code points, which is what `ascii(substr(i,1))`
  * folds over); the corpus contract is ASCII.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |String $s = $c.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $acc = ($acc * 31L + $s.charAt($i)) % ${TextFunctions.P}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  val Name = "graft_polyhash"

  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      acc = (acc * 31 + s.charAt(i)) % TextFunctions.P
      i += 1
    }
    acc
  }

  private def info = new ExpressionInfo(classOf[PolyHash].getName, Name)

  private[functions] def builder(args: Seq[Expression]): Expression = {
    require(args.length == 1, s"$Name takes exactly one argument")
    PolyHash(args.head)
  }

  /** Register on an existing session (idempotent); afterwards the
    * expression is callable as `graft_polyhash(col)` from SQL or
    * `call_function`.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(Name, builder, "built-in")
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` injects the
  * function at session build time — the deployment-config path; the
  * programmatic [[PolyHash.register]] covers an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Arity-checked builders shared with the programmatic register
    // path — an unchecked `args.head` would silently hash only the
    // first argument of a miswritten graft_polyhash(a, b) SQL call.
    ext.injectFunction((
      FunctionIdentifier(PolyHash.Name),
      new ExpressionInfo(classOf[PolyHash].getName, PolyHash.Name),
      PolyHash.builder))
    ext.injectFunction((
      FunctionIdentifier(DotProduct.Name),
      DotProduct.info,
      DotProduct.builder))
  }
}
