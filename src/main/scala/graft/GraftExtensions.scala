package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{DecimalType, IntegerType}

import graft.expr.SimHashExpr

/** Session extensions: SQL-level registration of the engine's function
  * surface, mirroring the reference's JEXL `converters:` namespace
  * (JexlFilterService.java:36-39, JexlFilterFunctions.java:4-21) plus the
  * native simhash (graft.expr.SimHashExpr).
  *
  * Activate with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`; after that
  * `SELECT to_big_decimal(x)`, `compare_to(a, b)` and
  * `simhash(tokens, bits)` work in plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def tryDecimal(e: Expression): Expression =
    Cast(e, DecimalType(38, 18), None, EvalMode.TRY)

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("to_big_decimal"),
      new ExpressionInfo(classOf[Cast].getName, "to_big_decimal"),
      (args: Seq[Expression]) => tryDecimal(args.head)),

    (new FunctionIdentifier("compare_to"),
      new ExpressionInfo(classOf[Signum].getName, "compare_to"),
      (args: Seq[Expression]) =>
        Cast(Signum(Subtract(tryDecimal(args(0)), tryDecimal(args(1)), EvalMode.TRY)),
          IntegerType)),

    graft.expr.DotF64.function,

    graft.expr.NearestF64.function,

    graft.expr.MinShingleMd5.function,

    graft.expr.ZOrder.function,

    (new FunctionIdentifier("simhash"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "simhash"),
      (args: Seq[Expression]) => args match {
        case Seq(tokens) => SimHashExpr(tokens, 63)
        case Seq(tokens, Literal(bits: Int, IntegerType)) => SimHashExpr(tokens, bits)
        case _ => throw new IllegalArgumentException(
          "simhash(tokens array<string>[, bits int literal])")
      }),

    (new FunctionIdentifier("minhash8"),
      new ExpressionInfo(classOf[graft.expr.MinHashExpr].getName, "minhash8"),
      (args: Seq[Expression]) => args match {
        case Seq(shingles) => graft.expr.MinHashExpr(shingles)
        case _ => throw new IllegalArgumentException(
          "minhash8(shingles array<string>)")
      }),

    (new FunctionIdentifier("dhash64"),
      new ExpressionInfo(classOf[graft.expr.DHashExpr].getName, "dhash64"),
      (args: Seq[Expression]) => args match {
        case Seq(payload) => graft.expr.DHashExpr(payload)
        case _ => throw new IllegalArgumentException("dhash64(payload binary)")
      }),

    // Spark's own runtime-filter Bloom expressions (codegen'd, two-phase
    // distributive aggregation), surfaced as session SQL functions — the
    // optimizer keeps them internal-only, but a membership sketch the user
    // BUILDS (holdout fingerprints, snapshot chunk hashes) is the same
    // machinery applied deliberately. bloom_filter_agg's child must be an
    // xxhash64 value; might_contain's filter side must be constant-ish
    // (literal or scalar subquery), which is exactly the build-once/
    // probe-everywhere shape.
    (new FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (args: Seq[Expression]) => args match {
        case Seq(c) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c)
        case Seq(c, est) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, est)
        case Seq(c, est, bits) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, est, bits)
        case _ => throw new IllegalArgumentException(
          "bloom_filter_agg(xxhash64(x)[, est_items[, num_bits]])")
      }),

    (new FunctionIdentifier("might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "might_contain"),
      (args: Seq[Expression]) => args match {
        case Seq(bf, v) => BloomFilterMightContain(bf, v)
        case _ => throw new IllegalArgumentException("might_contain(bloom, xxhash64(x))")
      }))

  /** Register into an already-running session (extensions only apply at
    * session construction; getOrCreate on an existing session ignores
    * withExtensions). Also registers the `embed` UDF — the V1 embedding
    * operator's expression form (SURVEY.md §4.3: `embed(text, dims)`), using
    * the deterministic offline embedder; production swaps the provider. */
  def install(spark: org.apache.spark.sql.SparkSession,
      embedder: graft.streaming.Sinks.Embedder = graft.streaming.Sinks.HashEmbedder): Unit = {
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    spark.udf.register("embed",
      (text: String, dims: Int) => embedder.embed(text, dims))
  }
}
