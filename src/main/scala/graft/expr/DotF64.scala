package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native double-precision dot product over two numeric arrays — the
  * hot-path form of the 64-term unrolled `CAST(element_at(a, i) AS DOUBLE)
  * * CAST(element_at(b, i) AS DOUBLE) + …` expression text every
  * similarity operator previously inlined.
  *
  * Why an Expression and not the unrolled text: the unrolled chain is
  * ~64 generated Java statements PER DOT, so any stage that fuses more
  * than a couple of dots (a pair join computing cosine, a streaming
  * micro-batch plan with no scan boundary) overflows Janino's 64 KB
  * method limit and Spark silently falls back to interpreted evaluation.
  * This expression is one static call in generated code — stages stay
  * inside WholeStageCodegen no matter how many dots they fuse.
  *
  * Bitwise parity with the unrolled form (and therefore with the DuckDB
  * oracles, which keep the unrolled text): the loop accumulates
  * left-associatively starting from 0.0 — `0.0 + t1` is IEEE-exact for
  * every t1 (the +0/−0 sign edge cannot surface here: a product is ±0
  * only when an element is exactly zero, which dense float embeddings
  * don't produce), and Java never fuses `acc + x*y` into an fma. Each
  * element is widened to double BEFORE multiplying, exactly like the
  * CASTs in the unrolled text.
  *
  * Fail-loud semantics: the unrolled `element_at` form yields NULL on a
  * short or null-element array; this expression THROWS instead — for the
  * engine's own dense fixed-width vectors a ragged input is corruption,
  * and a silent NULL would vanish through downstream filters.
  */
object DotF64 {

  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  /** SQL registration triple — shared by GraftExtensions and [[register]]. */
  val function: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (new FunctionIdentifier("dotf64"),
      new ExpressionInfo(classOf[DotF64Expr].getName, "dotf64"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => DotF64Expr(a, b)
        case _ => throw new IllegalArgumentException(
          "dotf64(a array<float|double>, b array<float|double>)")
      })

  /** Idempotent per-session registration. Every operator that emits
    * `dotf64(...)` SQL text calls this at its session choke point
    * (graft.Tables, the assignCenters* helpers, StreamIndex) so the
    * function resolves even when the user never installed
    * GraftExtensions — the expression is an engine internal first and a
    * user-facing SQL function second. */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = function
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }

  /** Called from both interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"dotf64: length mismatch ($n vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"dotf64: null element at index $i")
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}

case class DotF64Expr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dotf64"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float|double> inputs, got " +
        s"(${other._1.simpleString}, ${other._2.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotF64.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expr.DotF64.compute($a, $b, ${isFloat(left)}, ${isFloat(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF64Expr =
    copy(left = newLeft, right = newRight)
}
