package graft.expr

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst MinHash over a shingle array — the hot-path form of the
  * 8-lane signature (vs the explode → md5 → group-MIN relational
  * formulation in DedupOps.minhashSignatures): ONE pass over each row's
  * distinct shingles computes all eight lane minima with no explode and no
  * signature shuffle at all — at 100 TB that removes a corpus × shingles
  * row blow-up and a doc-keyed aggregate, the same explode-elimination
  * win [[SimHashExpr]] gives q44 over q43.
  *
  * Lane layout matches the relational form bit-for-bit (q200 pins it
  * against the same DuckDB oracle as the SQL lanes): lanes 0–3 are the
  * four 8-hex-char windows of md5(shingle), lanes 4–7 of
  * md5('1:' + shingle); each lane value is the lexicographic MIN across
  * shingles (hex strings — identical to numeric min on the 32-bit
  * window). An empty shingle array yields all-null lanes (SQL MIN over
  * zero rows).
  *
  * Codegen'd via a static call (no CodegenFallback virtual dispatch), so
  * the signature stage stays inside WholeStageCodegen.
  */
object MinHash8 {

  private val HexDigits = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): Array[Char] = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((bytes(i) >> 4) & 0xF)
      out(2 * i + 1) = HexDigits(bytes(i) & 0xF)
      i += 1
    }
    out
  }

  /** hex window [off, off+8) of `cand` < same window of `cur`? */
  private def lt(cand: Array[Char], cur: Array[Char], off: Int): Boolean = {
    var j = 0
    while (j < 8) {
      val c = cand(off + j); val m = cur(j)
      if (c != m) return c < m
      j += 1
    }
    false
  }

  /** Evaluated from both interpreted eval and generated code. Allocation
    * discipline: per shingle only the two digests and their hex buffers —
    * lane minima live in fixed char[8] scratch (copied in place), no
    * per-lane String churn; the UTF8String bytes feed md5 directly
    * (UTF8String IS utf-8), the second digest through one prefixed
    * buffer. */
  def compute(shingles: ArrayData): ArrayData = {
    val mins = Array.ofDim[Char](8, 8)
    val seen = new Array[Boolean](8)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    val n = shingles.numElements()
    while (i < n) {
      val sh = shingles.getUTF8String(i)
      if (sh != null) {
        val raw = sh.getBytes
        val h1 = hex(md.digest(raw))
        val pre = new Array[Byte](raw.length + 2)
        pre(0) = '1'; pre(1) = ':'
        System.arraycopy(raw, 0, pre, 2, raw.length)
        val h2 = hex(md.digest(pre))
        var lane = 0
        while (lane < 8) {
          val h = if (lane < 4) h1 else h2
          val off = 8 * (lane % 4)
          if (!seen(lane) || lt(h, mins(lane), off)) {
            var j = 0
            while (j < 8) { mins(lane)(j) = h(off + j); j += 1 }
            seen(lane) = true
          }
          lane += 1
        }
      }
      i += 1
    }
    new GenericArrayData((0 until 8).map(l =>
      if (!seen(l)) null else UTF8String.fromString(new String(mins(l)))).toArray)
  }
}

case class MinHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash8"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHash8.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.MinHash8.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashExpr =
    copy(child = newChild)
}

object MinHashFunctions {
  import org.apache.spark.sql.graftshim.Bridge

  /** Column API: minhash8(shingles) → array of 8 lane minima. */
  def minhash8(shingles: Column): Column =
    Bridge.column(MinHashExpr(Bridge.expression(shingles)))
}
