package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Morton (z-order) bit-interleave over two 16-bit cell
  * coordinates — the multi-dimensional clustering key lakehouse engines
  * sort on so that parquet min/max statistics prune on EVERY interleaved
  * dimension at once (a single-column sort key prunes on one dimension
  * and leaves range queries on the others as full scans). Sorting by
  * z-value places rows that are close in (x, y) space into the same
  * files, so each file's min/max box is tight in both dimensions.
  *
  * The interleave uses the classic magic-number spread (each step doubles
  * the gap between the kept bits): four shift-or-mask rounds per input,
  * then odd/even lane OR. The identical arithmetic is expressible in
  * portable SQL over BIGINT (`ZOrder.spreadSql`), which is what the
  * DuckDB oracle runs — the expression and the SQL text are proven
  * bit-identical by property test (ZOrderSpec).
  *
  * Codegen: one static call, same discipline as [[DotF64]]/[[SimHash64]]
  * — stages that fuse many z-computations stay inside WholeStageCodegen
  * instead of overflowing Janino with unrolled shift chains.
  */
object ZOrder {

  /** Spread the low 16 bits of x to the even bit positions 0,2,…,30. */
  def spread16(x0: Long): Long = {
    var x = x0 & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Morton code: x in even bits, y in odd bits — a 32-bit value. */
  def interleave(x: Long, y: Long): Long = spread16(x) | (spread16(y) << 1)

  /** Inverse of [[spread16]]: collect the even bits back into 16 bits. */
  def compact16(z0: Long): Long = {
    var z = z0 & 0x55555555L
    z = (z | (z >> 1)) & 0x33333333L
    z = (z | (z >> 2)) & 0x0F0F0F0FL
    z = (z | (z >> 4)) & 0x00FF00FFL
    z = (z | (z >> 8)) & 0x0000FFFFL
    z
  }

  /** The same spread as portable SQL text over an integer expression —
    * masks as decimal literals (hex literals aren't portable SQL).
    * Shared by the DuckDB oracles; Spark SQL parses the identical text. */
  def spreadSql(e: String): String = {
    val m1 = 0x00FF00FFL; val m2 = 0x0F0F0F0FL
    val m3 = 0x33333333L; val m4 = 0x55555555L
    val s1 = s"((($e) | (($e) << 8)) & $m1)"
    val s2 = s"(($s1 | ($s1 << 4)) & $m2)"
    val s3 = s"(($s2 | ($s2 << 2)) & $m3)"
    s"(($s3 | ($s3 << 1)) & $m4)"
  }

  /** zval as SQL text: spread(x) | spread(y) << 1. */
  def interleaveSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"

  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val function: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (new FunctionIdentifier("zorder2"),
      new ExpressionInfo(classOf[ZOrderExpr].getName, "zorder2"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => ZOrderExpr(a, b)
        case _ => throw new IllegalArgumentException(
          "zorder2(x bigint, y bigint) — 16-bit cell coordinates")
      })

  /** Idempotent per-session SQL registration (same seam as dotf64). */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = function
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}

case class ZOrderExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint) cell coordinates, got $other")
    }

  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrder.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.ZOrder.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderExpr =
    copy(left = newLeft, right = newRight)
}

object ZOrderFunctions {
  import org.apache.spark.sql.graftshim.Bridge

  /** Column API: zorder2(x, y) over 16-bit cell coordinates. */
  def zorder2(x: Column, y: Column): Column =
    Bridge.column(ZOrderExpr(Bridge.expression(x), Bridge.expression(y)))
}
