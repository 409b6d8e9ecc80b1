package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native minimum-md5-over-character-shingles — the hot-path form of
  * `array_min(transform(sequence(1, length(text) - k + 1),
  * i -> md5(substr(text, i, k))))` (q33's document fingerprint).
  *
  * Why an Expression: the HOF form evaluates an INTERPRETED lambda per
  * shingle (higher-order functions don't codegen), materializes a 32-char
  * hex UTF8String per shingle plus the full array of them per document,
  * and then scans that array for the minimum — on a corpus scan that is
  * len(text) string allocations per row for a single 32-byte answer. This
  * expression walks the text's UTF-8 bytes once, feeds each k-codepoint
  * window straight into a thread-local MessageDigest, and keeps a running
  * 16-byte minimum: zero per-shingle allocations, one static call in
  * generated code.
  *
  * Bitwise parity with the HOF form (the DuckDB oracle keeps the
  * `list_min(list_transform(...))` text):
  *  - `substr(text, i, k)` counts CODEPOINTS; the byte walk advances by
  *    UTF-8 lead bytes, so window i covers exactly the bytes
  *    `substringSQL(i, k)` would return, and md5 consumes the identical
  *    byte sequence;
  *  - `array_min` over StringType compares UTF8String bytes; for
  *    fixed-length lowercase-hex ASCII that ordering is exactly unsigned
  *    byte order of the 16-byte digests, which is what the running min
  *    compares (hex digit order '0'<…<'9'<'a'<…<'f' matches nibble order);
  *  - texts SHORTER than k chars take the literal slow path: Spark's
  *    `sequence(1, n)` with n < 1 counts DOWN (step −1), so the HOF hashed
  *    substrings at positions 1, 0, …, n — replicated verbatim via
  *    `substringSQL` so behavior is unchanged even on degenerate inputs;
  *  - a NULL text yields NULL (standard null propagation), like
  *    `transform(NULL, …)`.
  */
object MinShingleMd5 {

  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}
  import org.apache.spark.sql.types.IntegerType

  val function: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (new FunctionIdentifier("minshinglemd5"),
      new ExpressionInfo(classOf[MinShingleMd5Expr].getName, "minshinglemd5"),
      (args: Seq[Expression]) => args match {
        case Seq(t, Literal(k: Int, IntegerType)) if k >= 1 => MinShingleMd5Expr(t, k)
        case _ => throw new IllegalArgumentException(
          "minshinglemd5(text string, k int literal >= 1)")
      })

  /** Idempotent per-session registration (the DotF64 shape). */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = function
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }

  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  private val hexDigits = "0123456789abcdef".getBytes

  private def toHex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) & 0xff) >>> 4)
      out(2 * i + 1) = hexDigits(d(i) & 0x0f)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** unsigned lexicographic digest compare — identical to UTF8String
    * ordering of the equivalent lowercase-hex strings. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Called from both interpreted eval and generated code. */
  def compute(text: UTF8String, k: Int): UTF8String = {
    val bytes = text.getBytes
    // byte offsets of each codepoint start (+ end sentinel)
    var nChars = 0
    var p = 0
    while (p < bytes.length) {
      p += UTF8String.numBytesForFirstByte(bytes(p))
      nChars += 1
    }
    if (nChars < k) {
      // degenerate (< k chars): replicate the HOF's descending sequence
      // exactly — positions 1 down to nChars - k + 1, SQL substr semantics
      val digest = md.get()
      var best: Array[Byte] = null
      var i = 1
      while (i >= nChars - k + 1) {
        digest.reset()
        val sub = text.substringSQL(i, k)
        val d = digest.digest(sub.getBytes)
        if (best == null || less(d, best)) best = d
        i -= 1
      }
      return toHex(best)
    }
    val offs = new Array[Int](nChars + 1)
    var c = 0
    p = 0
    while (p < bytes.length) {
      offs(c) = p
      p += UTF8String.numBytesForFirstByte(bytes(p))
      c += 1
    }
    offs(nChars) = bytes.length
    val digest = md.get()
    var best: Array[Byte] = null
    var i = 0
    val last = nChars - k
    while (i <= last) {
      digest.reset()
      digest.update(bytes, offs(i), offs(i + k) - offs(i))
      val d = digest.digest()
      if (best == null || less(d, best)) best = d
      i += 1
    }
    toHex(best)
  }
}

case class MinShingleMd5Expr(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "minshinglemd5"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(t: Any): Any =
    MinShingleMd5.compute(t.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expr.MinShingleMd5.compute($t, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinShingleMd5Expr =
    copy(child = newChild)
}
