package graft.expr

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst SimHash over a token array — the hot-path form of the
  * dedup signature (vs the 16×SUM(CASE) relational formulation in
  * DedupOps.simhash): one pass over the tokens per row, codegen'd via a
  * static call so it stays inside the WholeStageCodegen pipeline (no
  * CodegenFallback virtual dispatch), no shuffle, no per-row allocations
  * beyond the digest.
  *
  * Bit b of the signature is the sign of Σ_tokens (bit b of md5(token) ? +1
  * : −1) — the same md5-nibble convention as the SQL formulation, so a
  * 16-bit call reproduces q43 exactly and any width ≤ 63 is DuckDB-checkable
  * (bit 63 would overflow a signed BIGINT oracle).
  */
object SimHash64 {

  /** Evaluated from both interpreted eval and generated code. */
  def compute(tokens: ArrayData, bits: Int): Long = {
    val counts = new Array[Int](bits)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        val h = md.digest(t.getBytes)
        var b = 0
        while (b < bits) {
          // bit b = bit (3 - b%4) of nibble b/4; nibble = high/low half-byte
          val byte = h(b / 8) & 0xFF
          val nibble = if (b % 8 < 4) byte >> 4 else byte & 0xF
          val bit = (nibble >> (3 - b % 4)) & 1
          counts(b) += (if (bit == 1) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

case class SimHashExpr(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 63, s"bits must be in [1, 63], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  // fail at analysis, not with garbage signatures at runtime (ADVICE r1):
  // the eval reads UTF8Strings, so anything but array<string> is misuse
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SimHash64.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHashFunctions {
  import org.apache.spark.sql.graftshim.Bridge

  /** Column API: simhash(tokens, bits). */
  def simhash(tokens: Column, bits: Int = 63): Column =
    Bridge.column(SimHashExpr(Bridge.expression(tokens), bits))
}
