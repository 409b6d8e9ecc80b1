package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native nearest-center argmin over a baked codebook — the hot-path form
  * of the unrolled `array_min(array(struct((e1-c1)²+…+(e64-c64)², label),
  * …))` expression text the assignment/encode operators previously inlined
  * (k centers × 64 dims ≈ 512 literal nodes per argmin).
  *
  * Why an Expression and not the unrolled text (the [[DotF64]] argument,
  * plus one more that matters for ITERATIVE trainers): the unrolled chain
  * inlines every center component as a Java double constant, so
  *  - each k-means/PQ Lloyd iteration generates DIFFERENT source and pays
  *    a fresh Janino compile of a multi-thousand-statement method (the
  *    measured driver gap of the round-16 baseline: 4.3 s of 7.6 s on
  *    index:embed_kmeans_model), and
  *  - the serialized plan ships ~1.6 MB task binaries per stage.
  * This expression keeps the codebook as an array VALUE (a codegen
  * reference object), so the generated source is one static call,
  * IDENTICAL across iterations and subspaces — compiled once per JVM,
  * metadata-sized task binaries.
  *
  * `nearestf64(vec, centers[, offset])` where `centers` is
  * `array<struct<l bigint, v array<double>>>` (normally a literal) and
  * `offset` (int literal, default 0) is the 0-based start of the subspace
  * window inside `vec` (PQ subspace m passes m×subDims). Returns
  * `struct<d double, l bigint>`: the smallest squared distance and its
  * center label.
  *
  * Bitwise parity with the unrolled form (and therefore with the DuckDB
  * oracles, which keep the unrolled text):
  *  - each element is widened to double BEFORE subtracting, exactly like
  *    the `CAST(element_at(vec, i) AS DOUBLE)` in the unrolled text;
  *  - per-center d² accumulates left-associatively from 0.0 (`0.0 + t1`
  *    is IEEE-exact: t1 = d·d is never −0.0);
  *  - the argmin replicates Spark's struct ordering over (d, l):
  *    `java.lang.Double.compare` is exactly Spark's double ordering here
  *    (NaN greatest, NaN == NaN; −0.0 cannot occur in a sum of squares),
  *    ties on d fall to the smaller label — identical to
  *    `array_min(array(struct(d, l), …))`.
  *
  * Fail-loud semantics (the [[DotF64]] discipline): a vector too short
  * for the requested window, or a null element, throws instead of
  * yielding NULL — for dense fixed-width vectors that is corruption.
  */
object NearestF64 {

  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}

  val function: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (new FunctionIdentifier("nearestf64"),
      new ExpressionInfo(classOf[NearestF64Expr].getName, "nearestf64"),
      (args: Seq[Expression]) => args match {
        case Seq(v, c) => NearestF64Expr(v, c, 0)
        case Seq(v, c, Literal(o: Int, IntegerType)) => NearestF64Expr(v, c, o)
        case _ => throw new IllegalArgumentException(
          "nearestf64(vec array<float|double>, centers array<struct<l bigint, " +
            "v array<double>>>[, offset int literal])")
      })

  /** Idempotent per-session registration (the [[DotF64.register]] shape). */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = function
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }

  /** Called from both interpreted eval and generated code. */
  def compute(vec: ArrayData, centers: ArrayData, offset: Int,
      vecFloat: Boolean): InternalRow = {
    val k = centers.numElements()
    if (k == 0)
      throw new IllegalArgumentException("nearestf64: empty codebook")
    var bestD = 0.0
    var bestL = 0L
    var c = 0
    while (c < k) {
      val cs = centers.getStruct(c, 2)
      val l = cs.getLong(0)
      val cv = cs.getArray(1)
      val n = cv.numElements()
      if (vec.numElements() < offset + n)
        throw new IllegalArgumentException(
          s"nearestf64: vector of ${vec.numElements()} elements too short " +
            s"for window [$offset, ${offset + n})")
      var d = 0.0
      var j = 0
      while (j < n) {
        val i = offset + j
        if (vec.isNullAt(i))
          throw new IllegalArgumentException(s"nearestf64: null element at index $i")
        val x = if (vecFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        val diff = x - cv.getDouble(j)
        d += diff * diff
        j += 1
      }
      val cmp = java.lang.Double.compare(d, bestD)
      if (c == 0 || cmp < 0 || (cmp == 0 && l < bestL)) {
        bestD = d
        bestL = l
      }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestD, bestL))
  }
}

case class NearestF64Expr(left: Expression, right: Expression, offset: Int)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("l", LongType, nullable = false)))

  override def prettyName: String = "nearestf64"

  private def vecIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
          ArrayType(StructType(Array(
            StructField(_, LongType, _, _),
            StructField(_, ArrayType(DoubleType, _), _, _))), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float|double>, array<struct<bigint, " +
          s"array<double>>>), got (${other._1.simpleString}, ${other._2.simpleString})")
    }

  override protected def nullSafeEval(v: Any, c: Any): Any =
    NearestF64.compute(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData],
      offset, vecIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.expr.NearestF64.compute($v, $c, $offset, $vecIsFloat)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestF64Expr =
    copy(left = newLeft, right = newRight)
}
