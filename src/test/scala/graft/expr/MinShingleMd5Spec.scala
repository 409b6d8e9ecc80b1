package graft.expr


import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[MinShingleMd5Expr]] replaced the interpreted
  * `array_min(transform(sequence(1, length(text) - k + 1),
  * i -> md5(substr(text, i, k))))` HOF in q33's fingerprint; the DuckDB
  * oracle keeps the equivalent `list_min(list_transform(...))` text, so the
  * gate rests on the two forms being byte-identical — including on
  * multi-byte UTF-8 (substr counts codepoints) and on texts shorter than
  * the shingle (where Spark's sequence(1, n<1) counts DOWN).
  */
class MinShingleMd5Spec extends SparkSpec {
  import spark.implicits._

  graft.GraftExtensions.install(spark)

  private def hof(k: Int): String =
    s"array_min(transform(sequence(1, length(text) - ${k - 1}), i -> md5(substr(text, i, $k))))"

  private def assertMatches(texts: Seq[String], k: Int): Unit = {
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .selectExpr("id", s"minshinglemd5(text, $k) AS native", s"${hof(k)} AS rolled")
      .as[(Long, String, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, r) =>
      assert(n == r, s"row $id ('${texts(id.toInt)}'): $n != $r")
    }
  }

  test("matches the HOF form on ASCII text") {
    val rng = new scala.util.Random(42)
    val texts = (0 until 100).map { _ =>
      val n = 5 + rng.nextInt(200)
      (0 until n).map(_ => ('a' + rng.nextInt(27)).toChar match {
        case c if c > 'z' => ' '
        case c => c
      }).mkString
    }
    assertMatches(texts, 5)
  }

  test("matches the HOF form on multi-byte UTF-8 (substr counts codepoints)") {
    val texts = Seq(
      "héllo wörld — ünïcode",
      "日本語のテキストです、五文字以上",
      "mixé ascii ánd ütf — ok",
      "ééééé",
      "abcdé")
    assertMatches(texts, 5)
  }

  test("matches the HOF form at other shingle widths") {
    val texts = Seq("the quick brown fox", "jumps over", "abcdefgh")
    (1 to 8).foreach(k => assertMatches(texts, k))
  }

  test("texts shorter than the shingle replicate the descending-sequence HOF path") {
    // Spark's sequence(1, n) with n < 1 counts DOWN (step -1): the HOF
    // hashed substr positions 1, 0, ..., n. Degenerate but pinned so the
    // native form never silently changes behavior on short inputs.
    val texts = Seq("a", "ab", "abc", "abcd", "é", "éa")
    assertMatches(texts, 5)
  }

  test("null text yields NULL") {
    val df = Seq((1L, Option.empty[String])).toDF("id", "text")
    assert(df.selectExpr("minshinglemd5(text, 5)").collect().head.isNullAt(0))
  }

  test("codegen agrees with interpreted eval") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text").selectExpr("minshinglemd5(text, 5) AS fp")
    val gen = df.as[String].head()
    val interp = {
      val prev = spark.conf.get("spark.sql.codegen.wholeStage")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try df.as[String].head()
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", prev)
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    assert(gen == interp)
  }
}
