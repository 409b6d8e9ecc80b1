package graft.expr


import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[DotF64Expr]] replaced the 64-term unrolled `element_at` dot-product
  * text in every vector operator; the DuckDB oracles KEEP the unrolled
  * form, so the whole vector gate rests on the two forms being bitwise
  * equal. This spec pins that equality directly, plus the fail-loud
  * contract the unrolled form did not have.
  */
class DotF64Spec extends SparkSpec {
  import spark.implicits._

  graft.GraftExtensions.install(spark)

  private val Dims = 64

  /** Deterministic pseudo-random vectors, same shape as the embeddings table. */
  private def vecs(seed: Int, n: Int): Seq[(Long, Array[Float], Array[Float])] = {
    val rng = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong,
        Array.fill(Dims)((rng.nextDouble() * 2 - 1).toFloat),
        Array.fill(Dims)((rng.nextDouble() * 2 - 1).toFloat))
    }
  }

  private val unrolled: String =
    (1 to Dims).map(i =>
      s"CAST(element_at(a, $i) AS DOUBLE) * CAST(element_at(b, $i) AS DOUBLE)")
      .mkString(" + ")

  test("bitwise-equals the unrolled element_at form on float vectors") {
    val df = vecs(seed = 42, n = 200).toDF("id", "a", "b")
    val both = df.selectExpr("id", s"dotf64(a, b) AS native", s"$unrolled AS rolled")
      .as[(Long, Double, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (id, native, rolled) =>
      assert(java.lang.Double.doubleToRawLongBits(native) ==
        java.lang.Double.doubleToRawLongBits(rolled), s"row $id: $native != $rolled")
    }
  }

  test("double arrays and mixed float/double widths are accepted") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    assert(df.selectExpr("dotf64(a, b)").as[Double].head() == 32.0)
  }

  test("codegen agrees with interpreted eval") {
    val df = vecs(seed = 7, n = 50).toDF("id", "a", "b")
      .selectExpr("dotf64(a, b) AS d")
    val gen = df.as[Double].collect().toSeq
    val interp = {
      val prev = spark.conf.get("spark.sql.codegen.wholeStage")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try df.as[Double].collect().toSeq
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", prev)
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    assert(gen.map(java.lang.Double.doubleToRawLongBits) ==
      interp.map(java.lang.Double.doubleToRawLongBits))
  }

  /** local[4] surfaces the raw exception; a real cluster wraps it in
    * SparkException — walk the cause chain for the marker instead of
    * pinning the wrapper type. */
  private def assertThrowsWith(marker: String)(body: => Unit): Unit = {
    val e = intercept[Exception](body)
    val messages = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(messages.exists(_.contains(marker)), s"no '$marker' in $messages")
  }

  test("ragged input throws instead of yielding NULL") {
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    assertThrowsWith("length mismatch")(df.selectExpr("dotf64(a, b)").collect())
  }

  test("null element throws instead of yielding NULL") {
    val df = Seq((Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](1.0f, 2.0f)))
      .toDF("a", "b")
    assertThrowsWith("null element")(df.selectExpr("dotf64(a, b)").collect())
  }

  test("null array input yields NULL (standard BinaryExpression null propagation)") {
    val df = Seq((Option.empty[Array[Float]], Some(Array(1.0f))))
      .toDF("a", "b")
    assert(df.selectExpr("dotf64(a, b)").collect().head.isNullAt(0))
  }
}
