package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** DISTINCTIVE-VOCABULARY mining (q176) — per source, the tokens most
  * over-represented vs the rest of the corpus by χ² association on
  * document frequency. This is the dataset-fingerprinting step of corpus
  * curation (what IS "src7", in words?) and the feature-selection step of
  * a source classifier — the supervised sibling of the q134 cluster
  * cards (which explain unsupervised structure; this explains a given
  * labeling).
  *
  * χ² = N(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)) over the 2×2 presence table
  * (a: docs of the source containing the token, etc.) — pure rational
  * arithmetic: integer cell counts, then ONE double expression evaluated
  * in the same order in both engines (no libm; the q35/q111 discipline).
  * The squared term is computed in doubles because (ad−bc)² overflows
  * BIGINT at corpus scale; ad and bc themselves stay exact BIGINTs. Only
  * positively-associated tokens rank (observed a above expectation), so
  * "distinctive" means over-, not under-represented.
  *
  * Scale shape: one distinct (doc, token) reduce → (source, token)
  * doc-frequency rows (map-side combined), a vocab-keyed join to global
  * token df (the only shuffle that grows with vocabulary), broadcast
  * source sizes, then the [[graft.plans.TopK]] bounded-heap operator
  * takes the per-source top [[ChiTopK]] without a full sort. Nothing
  * corpus-sized moves after the first reduce.
  */
object AssociationOpsImpl {

  val ChiTopK = 5

  def sourceChi2Tokens(s: SparkSession, dir: String): DataFrame = {
    val dt = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))
      .filter(col("tok") =!= "")
    val st = dt.groupBy(col("source"), col("tok")).agg(count(lit(1)).as("a"))
    val tokDf = st.groupBy(col("tok")).agg(sum(col("a")).as("df_t"))
    val srcN = dt.select(col("source"), col("doc_id")).distinct()
      .groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    val total = srcN.agg(sum(col("n_s")).as("n_docs"))
    val cells = st
      .join(tokDf, "tok")
      .join(broadcast(srcN), "source")
      .crossJoin(broadcast(total))
      .withColumn("b", col("n_s") - col("a"))
      .withColumn("c", col("df_t") - col("a"))
      .withColumn("d", col("n_docs") - col("n_s") - col("c"))
    val scored = cells
      // positive association only: observed a above its expectation
      .filter(col("a") * col("n_docs") > col("df_t") * col("n_s"))
      .withColumn("chi2", expr(
        """CASE WHEN (a + b) > 0 AND (c + d) > 0 AND (a + c) > 0 AND (b + d) > 0
          |THEN CAST(n_docs AS DOUBLE)
          |  * CAST(a * d - b * c AS DOUBLE) * CAST(a * d - b * c AS DOUBLE)
          |  / (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
          |     * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)) END""".stripMargin))
      .filter(col("chi2").isNotNull)
    graft.plans.TopK.topKPerKey(
        scored.select(col("source"), col("tok"), col("a"), col("df_t"), col("chi2")),
        ChiTopK, Seq("source"),
        Seq(graft.plans.TopK.Ord("chi2", descending = true),
          graft.plans.TopK.Ord("tok")))
      .select(col("source"), col("rank"), col("tok"),
        col("a").as("df_in_source"), col("df_t").as("df_total"), col("chi2"))
      .orderBy(col("source"), col("rank"))
  }

  private lazy val q176Sql: String =
    s"""WITH dt AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, source, tok FROM (
       |    SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
       |    FROM documents) t
       |  WHERE tok <> ''),
       |st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS a
       |  FROM dt GROUP BY source, tok),
       |tokdf AS (SELECT tok, CAST(SUM(a) AS BIGINT) AS df_t FROM st GROUP BY tok),
       |srcn AS (SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_s
       |  FROM dt GROUP BY source),
       |tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n_docs FROM srcn),
       |cells AS (
       |  SELECT st.source, st.tok, a, df_t, n_s, n_docs,
       |    n_s - a AS b, df_t - a AS c, n_docs - n_s - (df_t - a) AS d
       |  FROM st JOIN tokdf USING (tok) JOIN srcn USING (source), tot),
       |sc AS (
       |  SELECT source, tok, a, df_t,
       |    CASE WHEN (a + b) > 0 AND (c + d) > 0 AND (a + c) > 0 AND (b + d) > 0
       |    THEN CAST(n_docs AS DOUBLE)
       |      * CAST(a * d - b * c AS DOUBLE) * CAST(a * d - b * c AS DOUBLE)
       |      / (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
       |         * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)) END AS chi2
       |  FROM cells
       |  WHERE a * n_docs > df_t * n_s),
       |rk AS (
       |  SELECT source, tok, a, df_t, chi2,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY chi2 DESC, tok) AS BIGINT) AS rank
       |  FROM sc WHERE chi2 IS NOT NULL)
       |SELECT source, rank, tok, a AS df_in_source, df_t AS df_total, chi2
       |FROM rk WHERE rank <= $ChiTopK
       |ORDER BY source, rank""".stripMargin

  lazy val queries: Seq[Q] = Seq(
    Q("q176_source_chi2_tokens", sourceChi2Tokens, Some(q176Sql),
      headline = true))
}

object AssociationOps {
  lazy val queries: Seq[Q] = AssociationOpsImpl.queries
}
