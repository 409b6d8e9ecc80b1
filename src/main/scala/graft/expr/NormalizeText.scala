package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native canonical TEXT NORMALIZATION — the step every dedup/tokenize
  * stage assumes (case-fold → map non-[a-z0-9] to space → collapse space
  * runs → trim), as ONE codegen'd pass instead of the
  * `trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "),
  * " +", " "))` chain: that formulation walks the text four times and
  * pays two regex engines per row, which made q210 CPU-bound on a single
  * input split at the 10× sweep (a narrow map should be bounded by scan
  * bytes, not regex throughput). Byte-identical to the chain for any
  * input whose lowercase mapping is 1:1 per char: ASCII folds inline on
  * the hot path, and any OTHER char takes `Character.toLowerCase` — so
  * the rare non-ASCII chars whose 1:1 lowercase IS in [a-z] (U+212A
  * KELVIN SIGN → 'k') keep the letter exactly as the lower+regex chain
  * does, instead of being spaced. The only remaining divergence is the
  * handful of Unicode one-to-MANY lowercase expansions (e.g. İ U+0130,
  * whose FULL lowercase is i + combining dot): `String.toLowerCase` in
  * the chain expands it and the regex spaces the combining mark — "İx"
  * → "i x" — while `Character.toLowerCase` here SIMPLE-maps U+0130 to
  * 'i' (JDK 17), so the fold yields "ix". The divergence is a lost word
  * boundary after such a char, not a spaced-out letter: acceptable for
  * a normalizer whose output alphabet is [a-z0-9 ] by definition, and
  * DuckDB's lower() disagrees with the JVM's on those codepoints anyway.
  */
object NormalizeAscii {

  /** Evaluated from both interpreted eval and generated code. */
  def normalize(in: UTF8String): UTF8String = {
    val s = in.toString
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var pendingSpace = false // a separator seen since the last kept char
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      val k: Char =
        if (c >= 'a' && c <= 'z' || c >= '0' && c <= '9') c
        else if (c >= 'A' && c <= 'Z') (c + 32).toChar
        else if (c < 128) 0 // ASCII hot path never pays the library call
        else { // 1:1 non-ASCII foldings into [a-z] (U+212A → 'k') keep
          // the letter, matching the lower-then-regex chain exactly
          val lc = Character.toLowerCase(c)
          if (lc >= 'a' && lc <= 'z') lc else 0
        }
      if (k != 0) {
        if (pendingSpace && out.length > 0) out.append(' ')
        pendingSpace = false
        out.append(k)
      } else pendingSpace = true // runs collapse; edges trim (never emitted)
      i += 1
    }
    UTF8String.fromString(out.toString)
  }

  /** Column form: `normalize_text(text)`. */
  def apply(c: Column): Column = {
    import org.apache.spark.sql.graftshim.Bridge
    Bridge.column(NormalizeTextExpr(Bridge.expression(c)))
  }
}

case class NormalizeTextExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    NormalizeAscii.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.NormalizeAscii.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeTextExpr =
    copy(child = newChild)
}
