package graft.expr

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined chunking (q71's hot path): one compiled pass per
  * document computing rolling-hash boundaries and per-chunk md5 — the form
  * that is BOTH zero-shuffle and codegen'd.
  *
  * The two relational formulations each lose one of those: exploding
  * window positions through a doc_id Window carries the full text across a
  * shuffle (O(len²/32) shuffle bytes per doc), while the higher-order
  * `filter(sequence(...))` form is narrow but Spark evaluates lambda
  * functions interpreted per element (~2× wall-clock at sf0.1). A static
  * call from generated code (the [[SimHash64]] discipline) keeps the whole
  * scan inside WholeStageCodegen with zero shuffle.
  *
  * Semantics are bitwise those of the SQL oracle: a boundary at position 1
  * and wherever the first byte of md5(substr(text, i, window)) <
  * boundaryMax (character-based substr, md5 over UTF-8 bytes); a chunk
  * runs from its boundary to the position before the next (or end of
  * text); chunk md5 = md5(substr(text, start, len)).
  */
object CdcChunks {

  /** Evaluated from both interpreted eval and generated code. */
  def compute(text: UTF8String, window: Int, boundaryMax: Int): ArrayData = {
    val len = text.numChars()
    val md = MessageDigest.getInstance("MD5")
    val bounds = scala.collection.mutable.ArrayBuffer[Int](1)
    val hi = math.max(len - (window - 1), 1)
    var i = 2
    while (i <= hi) {
      val h0 = md.digest(text.substringSQL(i, window).getBytes)(0) & 0xFF
      if (h0 < boundaryMax) bounds += i
      i += 1
    }
    val out = new Array[Any](bounds.length)
    var j = 0
    while (j < bounds.length) {
      val start = bounds(j)
      val end = if (j + 1 < bounds.length) bounds(j + 1) - 1 else len
      val clen = math.max(end - start + 1, 0)
      val digest = md.digest(text.substringSQL(start, clen).getBytes)
      val hex = new Array[Byte](32)
      var k = 0
      while (k < 16) {
        val b = digest(k) & 0xFF
        hex(2 * k) = "0123456789abcdef".charAt(b >> 4).toByte
        hex(2 * k + 1) = "0123456789abcdef".charAt(b & 0xF).toByte
        k += 1
      }
      out(j) = InternalRow(start.toLong, clen.toLong, UTF8String.fromBytes(hex))
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class CdcChunksExpr(child: Expression, window: Int, boundaryMax: Int)
    extends UnaryExpression {

  require(window >= 1, s"window must be >= 1, got $window")
  require(boundaryMax >= 1 && boundaryMax <= 255,
    s"boundaryMax must be in [1, 255], got $boundaryMax")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", LongType, nullable = false),
    StructField("len", LongType, nullable = false),
    StructField("md5", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[UTF8String], window, boundaryMax)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.CdcChunks.compute($c, $window, $boundaryMax)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunksExpr =
    copy(child = newChild)
}

object CdcChunksFunctions {
  import org.apache.spark.sql.graftshim.Bridge

  /** Column API: cdc_chunks(text, window, boundaryMax) →
    * array<struct<start, len, md5>>. */
  def cdcChunks(text: Column, window: Int, boundaryMax: Int): Column =
    Bridge.column(CdcChunksExpr(Bridge.expression(text), window, boundaryMax))
}
