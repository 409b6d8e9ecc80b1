package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Hilbert-curve index over two 16-bit cell coordinates — the
  * stronger sibling of the Morton interleave ([[ZOrder]]): both map a 2-d
  * grid onto a 1-d sort key, but the Hilbert traversal never makes the
  * long diagonal jumps Morton's Z-shape makes, so consecutive key ranges
  * cover more compact (x, y) boxes and file-level min/max statistics come
  * out tighter on BOTH dimensions (q151 measures the difference on real
  * data against identical file splits; Hilbert is what newer lakehouse
  * clustering implementations offer over classic Z-ordering for exactly
  * this reason).
  *
  * Algorithm: the standard top-down quadrant walk — at each level the
  * quadrant index ((3·rx) XOR ry) contributes s² cells, then the frame
  * rotates/reflects so the child quadrant's curve orientation lines up.
  * The reflection uses the full-grid constant (2¹⁶ − 1), keeping both
  * coordinates non-negative at every step — intermediate negatives would
  * make the portable-SQL mirror depend on each engine's two's-complement
  * shift semantics. The per-level state updates are a fixed 16-iteration
  * loop in one static method (the [[DotF64]]/[[ZOrder]] codegen
  * discipline: stages computing many keys stay inside WholeStageCodegen).
  *
  * The identical arithmetic is emitted as a 16-step chained-CTE SQL text
  * ([[Hilbert.chainSql]]) for the DuckDB oracle — each step references the
  * previous step's (x, y, acc) columns exactly once per output column, so
  * the text stays linear in the level count (a single nested expression
  * would grow exponentially). HilbertSpec proves the expression against a
  * bits-parameterized reference (full bijection + unit-step adjacency on a
  * small grid — the DEFINING curve property — plus d→(x,y) round-trips at
  * full 16-bit scale) and proves the SQL text equal to the native
  * expression on Spark's own parser.
  */
object Hilbert {

  val Bits = 16
  val N1: Long = (1L << Bits) - 1

  /** Hilbert index of (x, y) on the 2^bits × 2^bits grid. */
  def index(x0: Long, y0: Long, bits: Int = Bits): Long = {
    val n1 = (1L << bits) - 1
    var x = x0 & n1
    var y = y0 & n1
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n1 - x; y = n1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse walk (d → (x, y)) — not shipped as an expression; used by the
    * spec to prove [[index]] is the bijection it claims to be. */
  def inverse(d0: Long, bits: Int = Bits): (Long, Long) = {
    var x = 0L; var y = 0L
    var t = d0
    var s = 1L
    while (s < (1L << bits)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      // rotate back (the s-local frame of the bottom-up reconstruction)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tt = x; x = y; y = tt
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  /** The same walk as a chained-CTE SQL text: emits
    * `h0 AS (SELECT <cols>, <x> AS hx, <y> AS hy, 0 AS hacc FROM <from>),
    * h1 … h16`, where h16 carries `hacc` = the Hilbert index. `cols` are
    * passthrough column names. Pure integer CASE arithmetic — the quadrant
    * index (3·rx) XOR ry is expanded to `CASE WHEN rx = 0 THEN ry ELSE
    * 3 - ry END` so no engine needs a bitwise XOR operator. */
  def chainSql(from: String, cols: Seq[String], x: String, y: String): String = {
    val passthrough = cols.mkString(", ")
    // every input reference is qualified with the step alias `p` so it can
    // never bind to the SAME SELECT's fresh `hx`/`hy` aliases (both engines
    // support lateral column aliases, which would silently chain the new
    // hx into the new hy)
    val steps = (0 until Bits).map { lvl =>
      val i = Bits - 1 - lvl // bit examined at this step
      val s = 1L << i
      val rx = s"((p.hx >> $i) & 1)"
      val ry = s"((p.hy >> $i) & 1)"
      s"""h${lvl + 1} AS (
         |  SELECT $passthrough,
         |    CASE WHEN $ry = 1 THEN p.hx WHEN $rx = 0 THEN p.hy ELSE $N1 - p.hy END AS hx,
         |    CASE WHEN $ry = 1 THEN p.hy WHEN $rx = 0 THEN p.hx ELSE $N1 - p.hx END AS hy,
         |    p.hacc + ${s * s} * (CASE WHEN $rx = 0 THEN $ry ELSE 3 - $ry END) AS hacc
         |  FROM h$lvl p)""".stripMargin
    }.mkString(",\n")
    s"""h0 AS (
       |  SELECT $passthrough, $x AS hx, $y AS hy, CAST(0 AS BIGINT) AS hacc
       |  FROM $from),
       |$steps""".stripMargin
  }

  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val function: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (new FunctionIdentifier("hilbert2"),
      new ExpressionInfo(classOf[HilbertExpr].getName, "hilbert2"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => HilbertExpr(a, b)
        case _ => throw new IllegalArgumentException(
          "hilbert2(x bigint, y bigint) — 16-bit cell coordinates")
      })

  /** Idempotent per-session SQL registration (same seam as zorder2). */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = function
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}

case class HilbertExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert2"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint) cell coordinates, got $other")
    }

  override protected def nullSafeEval(x: Any, y: Any): Any =
    Hilbert.index(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.Hilbert.index($a, $b, 16)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertExpr =
    copy(left = newLeft, right = newRight)
}

object HilbertFunctions {
  import org.apache.spark.sql.graftshim.Bridge

  /** Column API: hilbert2(x, y) over 16-bit cell coordinates. */
  def hilbert2(x: Column, y: Column): Column =
    Bridge.column(HilbertExpr(Bridge.expression(x), Bridge.expression(y)))
}
