package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003) over a token array: md5 each k-token shingle, take the
  * minimum hash of every FULL w-length shingle window, return the distinct
  * selected fingerprints — the per-document half of q101's winnow index.
  *
  * Why an Expression: the previous plan evaluated an INTERPRETED HOF lambda
  * per shingle (allocating a 32-char hex string each), posexploded O(len)
  * (doc_id, pos, hash) rows, SHUFFLED them into a per-doc Window for the
  * w-row running min, filtered to full windows and ran a global DISTINCT —
  * two shuffles and len(doc) string allocations per document for what is a
  * per-row computation. This expression does the walk in one pass with a
  * thread-local MessageDigest and 16-byte digest compares: the winnow index
  * becomes a NARROW scan (explode of a per-row array), no shuffle at all.
  * At 100 TB that converts the index build from corpus-shuffle to
  * map-only.
  *
  * Parity with the HOF+Window form (the DuckDB oracle keeps the windowed
  * CTE): md5 consumes the identical `tok_i ' ' tok_(i+1) … ' ' tok_(i+k-1)`
  * UTF-8 bytes; the window min over hex strings equals unsigned digest
  * order (hex digit order matches nibble order); full-window selection is
  * `pos <= ntok - (k-1) - (w-1)` exactly; per-doc DISTINCT of (doc_id, fp)
  * equals the old global distinct because doc_id is in the key. Output
  * order is first-occurrence by position — downstream consumers aggregate,
  * join, or ORDER BY, so set equality is what the gates hash.
  *
  * Fail-loud: a null token (impossible from `split`) throws rather than
  * silently vanishing through the old window-min's null skipping.
  */
object WinnowFps {

  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}
  import org.apache.spark.sql.types.IntegerType

  val function: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (new FunctionIdentifier("winnowfps"),
      new ExpressionInfo(classOf[WinnowFpsExpr].getName, "winnowfps"),
      (args: Seq[Expression]) => args match {
        case Seq(t, Literal(k: Int, IntegerType), Literal(w: Int, IntegerType))
            if k >= 1 && w >= 1 =>
          WinnowFpsExpr(t, k, w)
        case _ => throw new IllegalArgumentException(
          "winnowfps(toks array<string>, k int literal >= 1, w int literal >= 1)")
      })

  /** Idempotent per-session registration (the DotF64 shape). */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = function
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }

  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  private val hexDigits = "0123456789abcdef".getBytes
  private val space = ' '.toByte

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
  def compute(toks: ArrayData, k: Int, w: Int): ArrayData = {
    val n = toks.numElements()
    val m = n - k + 1          // shingle-hash positions
    val f = m - w + 1          // full-window positions
    if (f < 1) return new GenericArrayData(Array.empty[Any])
    val digest = md.get()
    val hs = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      digest.reset()
      var j = 0
      while (j < k) {
        if (toks.isNullAt(i + j))
          throw new IllegalArgumentException(s"winnowfps: null token at index ${i + j}")
        if (j > 0) digest.update(space)
        val t = toks.getUTF8String(i + j)
        digest.update(t.getBytes)
        j += 1
      }
      hs(i) = digest.digest()
      i += 1
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var pos = 0
    while (pos < f) {
      var best = hs(pos)
      var j = 1
      while (j < w) {
        if (less(hs(pos + j), best)) best = hs(pos + j)
        j += 1
      }
      seen.add(toHex(best))
      pos += 1
    }
    new GenericArrayData(seen.toArray[AnyRef](new Array[AnyRef](seen.size)))
  }
}

case class WinnowFpsExpr(child: Expression, k: Int, w: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnowfps"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(t: Any): Any =
    WinnowFps.compute(t.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expr.WinnowFps.compute($t, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFpsExpr =
    copy(child = newChild)
}
