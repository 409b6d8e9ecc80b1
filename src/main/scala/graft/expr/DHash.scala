package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst difference-hash (dHash) over an opaque `binary` media
  * payload — the perceptual-hash member of the dedup signature family
  * (SimHash covers token text, frame signatures cover video; this covers
  * still images). Classic dHash resizes an image to a 9×8 grayscale grid
  * and emits one bit per horizontally adjacent pixel pair ("is the right
  * pixel brighter?"); brightness survives re-encodes and resizes, so
  * near-identical images land within a small Hamming distance.
  *
  * The DECODE step (decode → grayscale → 9×8 resample) is this container's
  * stubbed seam, same as `multimodal.Multimodal.FakeDecoder`: the grid cell
  * k ∈ [0, 72) is the sum of payload bytes whose index i satisfies
  * `i * 72 div n == k` — a deterministic stand-in with the exact shape of a
  * box-filter downsample (contiguous byte stripes ≈ pixel blocks). A real
  * deployment swaps the stripe loop for a codec call; the banding, pair
  * join and Hamming verify around it do not change.
  *
  * 63 bits, not 64: bit b = (row·8 + col) for col ∈ [0,8), and bit 63
  * (row 7, col 7) is dropped so the integer formulation stays inside a
  * SIGNED BIGINT — the same oracle-checkability discipline as
  * [[SimHash64]] (a set bit 63 would make the two engines' `sum(1<<b)`
  * arithmetic diverge on overflow).
  *
  * Codegen'd via a static call (no CodegenFallback virtual dispatch), so a
  * scan → dhash → band-explode pipeline stays in one WholeStageCodegen
  * span; one pass over the payload, one 72-long array per row.
  */
object DHash64 {

  /** Grid geometry: 8 rows × 9 columns → 8 comparisons per row. */
  val Rows = 8
  val Cols = 9
  val Stripes: Int = Rows * Cols
  val Bits = 63

  /** Evaluated from both interpreted eval and generated code. */
  def compute(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val stripes = new Array[Long](Stripes)
    var i = 0
    while (i < n) {
      stripes(((i.toLong * Stripes) / n).toInt) += (bytes(i) & 0xFF).toLong
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < Bits) {
      val cell = (b / 8) * Cols + (b % 8)
      if (stripes(cell + 1) > stripes(cell)) sig |= 1L << b
      b += 1
    }
    sig
  }
}

case class DHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    DHash64.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.DHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): DHashExpr =
    copy(child = newChild)
}

object DHashFunctions {
  import org.apache.spark.sql.graftshim.Bridge

  def dhash64(payload: Column): Column =
    Bridge.column(DHashExpr(Bridge.expression(payload)))
}
