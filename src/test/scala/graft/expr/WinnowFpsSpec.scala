package graft.expr


import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[WinnowFpsExpr]] replaced the posexplode + per-doc Window + distinct
  * winnow-index plan; the DuckDB oracle keeps the windowed CTE, so the
  * q101/q102/q88 gates rest on the two forms producing the identical
  * (doc_id, fp) SET. This spec pins that equality against the exact plan
  * the operator used through round 15, on pseudo-random corpora including
  * repeated tokens (duplicate fingerprints) and short documents.
  */
class WinnowFpsSpec extends SparkSpec {
  import spark.implicits._

  graft.GraftExtensions.install(spark)

  private val K = graft.ops.TextOpsImpl.WinnowK
  private val W = graft.ops.TextOpsImpl.WinnowW

  /** The round-15 plan, verbatim: HOF md5 per shingle, posexplode, per-doc
    * window min, full-window filter, global distinct. */
  private def legacy(docs: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val psh = docs
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= K)
      .withColumn("ntok", size(col("toks")).cast(LongType))
      .select(col("doc_id"), col("ntok"),
        posexplode(expr(s"transform(sequence(1, size(toks) - ${K - 1}), " +
          "i -> md5(concat(try_element_at(toks, i), ' ', try_element_at(toks, i + 1), " +
          "' ', try_element_at(toks, i + 2))))")).as(Seq("pos0", "h")))
      .withColumn("pos", col("pos0") + 1).drop("pos0")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, W - 1)
    psh.withColumn("fp", min(col("h")).over(w))
      .filter(col("pos") <= col("ntok") - (K - 1) - (W - 1))
      .select(col("doc_id"), col("fp")).distinct()
  }

  private def native(docs: org.apache.spark.sql.DataFrame) = {
    graft.expr.WinnowFps.register(spark)
    docs.withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= K)
      .select(col("doc_id"), explode(expr(s"winnowfps(toks, $K, $W)")).as("fp"))
  }

  private def corpus(seed: Int, n: Int): org.apache.spark.sql.DataFrame = {
    val rng = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x", "yy", "zzz",
      "répét", "日本", "tok")
    (0 until n).map { i =>
      val len = rng.nextInt(30) // includes docs shorter than k and k+w-1
      (i.toLong, (0 until len).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("fingerprint SET matches the legacy windowed plan (random corpora)") {
    (1 to 3).foreach { seed =>
      val docs = corpus(seed, 120)
      val l = legacy(docs).collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val nv = native(docs).collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(nv == l, s"seed $seed: sets differ " +
        s"(only-legacy=${(l -- nv).take(3)}, only-native=${(nv -- l).take(3)})")
    }
  }

  test("native emits no duplicate (doc_id, fp) rows — the distinct is per-row now") {
    val docs = corpus(7, 120)
    val rows = native(docs).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.length == rows.toSet.size)
  }

  test("documents with no full window produce no rows, like the filtered plan") {
    // k + w - 1 = 6 tokens is the minimum for one full window
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e f")).toDF("doc_id", "text")
    val nv = native(docs).collect()
    val l = legacy(docs).collect()
    assert(nv.map(_.getLong(0)).distinct.toSet == Set(2L))
    assert(nv.map(r => (r.getLong(0), r.getString(1))).toSet ==
      l.map(r => (r.getLong(0), r.getString(1))).toSet)
  }
}
