package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{Q, Tables}

/** EMBEDDING-DRIFT monitor (q185) — per-source centroid movement between
  * the early and late halves of the corpus (vec_id order = ingest order):
  * the distribution-shift check a pipeline owner runs before blending a
  * refreshed crawl into an existing mixture. q177 answers "how close are
  * two SOURCES"; this answers "how far did ONE source move between two
  * ingestion eras" — drift cosine ≈ 1 with a small shift norm means the
  * new crawl is more of the same; a low cosine or large shift flags a
  * changed domain (new site mix, template change, scraper regression)
  * before it contaminates training.
  *
  * Determinism: the era split is integer (vec_id < max div 2, broadcast
  * single-row frame — no driver collect); centroids use the repo's
  * quantized-mean accumulation; dot/norm chains are the same
  * left-associated expression text in both engines; sqrt is IEEE.
  *
  * Scale shape: identical to q177 — ONE embeddings⋈documents join (id-
  * keyed, co-partitionable by bucketing), a map-side-combined reduce to
  * sources × 2 × 65 cells, then per-source arithmetic on a broadcast
  * frame. The corpus is touched once.
  */
object DriftOpsImpl {

  import VectorOpsImpl.Dims

  def sourceDrift(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("source"))
    val mid = e.agg(expr("max(vec_id) div 2").as("mid"))
    val halves = e.crossJoin(broadcast(mid))
      .join(d, e("vec_id") === d("doc_id"))
      .withColumn("era", when(col("vec_id") < col("mid"), "early").otherwise("late"))
    val aggs = count(lit(1)).as("n") +: (1 to Dims).map(i =>
      (expr(VectorOpsImpl.sparkCentComp(i)) / count(lit(1))).as(s"c$i"))
    val cent = halves.groupBy(col("source"), col("era"))
      .agg(aggs.head, aggs.tail: _*)
    def side(tag: String) = cent.filter(col("era") === tag).select(
      col("source") +: col("n").as(s"${tag}_n") +:
        (1 to Dims).map(i => col(s"c$i").as(s"${tag}_c$i")): _*)
    val dot = (1 to Dims).map(i => col(s"early_c$i") * col(s"late_c$i")).reduce(_ + _)
    val ne = (1 to Dims).map(i => col(s"early_c$i") * col(s"early_c$i")).reduce(_ + _)
    val nl = (1 to Dims).map(i => col(s"late_c$i") * col(s"late_c$i")).reduce(_ + _)
    val sq = (1 to Dims).map(i => (col(s"early_c$i") - col(s"late_c$i")) *
      (col(s"early_c$i") - col(s"late_c$i"))).reduce(_ + _)
    side("early").join(broadcast(side("late")), "source")
      .select(col("source"),
        col("early_n").cast(LongType).as("n_early"),
        col("late_n").cast(LongType).as("n_late"),
        (dot / (sqrt(ne) * sqrt(nl))).as("drift_cosine"),
        sqrt(sq).as("shift_l2"))
      .orderBy(col("source"))
  }

  /** q195: STRUCTURAL drift — the two-sample χ² between a source's early
    * and late token-length distributions (power-of-2 length bins, the
    * q178 binning trick on plain integers). q185 answers "did the
    * MEANING move" (embedding centroids); this answers "did the SHAPE
    * move" (a template change, a scraper truncating, boilerplate
    * injection — all of which shift length structure before they shift
    * semantics). χ² = Σ (observed − expected)²/expected over both eras'
    * bins with expected from the pooled distribution; bin counts are
    * exact BIGINTs, each bin's χ² term is floor-1e9-quantized and summed
    * as DECIMAL so the cross-engine sum is order-independent (the q189
    * lesson applied to a sum of doubles).
    *
    * Scale shape: one narrow corpus pass → (source, era, bin) counts
    * (map-side combined, ≤ sources × 2 × 61 rows) → per-source joins on
    * that metadata frame. */
  def lengthDrift(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    val mid = d.agg(expr("max(doc_id) div 2").as("mid"))
    val binned = d.crossJoin(broadcast(mid))
      .select(col("source"),
        when(col("doc_id") < col("mid"), "early").otherwise("late").as("era"),
        expr(s"CAST(size(split(text, ' ')) AS BIGINT)").as("n_tok"))
      .withColumn("bin", expr(QuantileSketchOpsImpl.binSql("n_tok")))
    val cnt = binned.groupBy(col("source"), col("era"), col("bin"))
      .agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy(col("source"), col("era"))
      .agg(sum(col("c")).cast(LongType).as("n_era"))
    val pooled = cnt.groupBy(col("source"), col("bin"))
      .agg(sum(col("c")).cast(LongType).as("c_bin"))
    val nsrc = tot.groupBy(col("source"))
      .agg(sum(col("n_era")).cast(LongType).as("n_src"))
    // densify to the full (source, bin) × era grid: a bin one era never
    // produced still contributes its (0 − E)²/E term
    val eras = s.sql("SELECT 'early' AS era UNION ALL SELECT 'late' AS era")
    val terms = pooled.crossJoin(broadcast(eras))
      .join(tot, Seq("source", "era"))
      .join(nsrc, Seq("source"))
      .join(cnt, Seq("source", "era", "bin"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      // expected = n_era * c_bin / n_src; term = (c - E)^2 / E
      .withColumn("e", expr(
        "CAST(n_era AS DOUBLE) * CAST(c_bin AS DOUBLE) / CAST(n_src AS DOUBLE)"))
      .withColumn("term", expr("(CAST(c AS DOUBLE) - e) * (CAST(c AS DOUBLE) - e) / e"))
    terms.groupBy(col("source"))
      .agg(
        max(when(col("era") === "early", col("n_era"))).as("n_early"),
        max(when(col("era") === "late", col("n_era"))).as("n_late"),
        countDistinct(col("bin")).as("n_bins"),
        expr("CAST(SUM(CAST(FLOOR(term * 1e9) AS DECIMAL(38,0))) AS DOUBLE) / 1e9")
          .as("chi2"))
      .orderBy(col("source"))
  }

  private lazy val q195Sql: String =
    s"""WITH mid AS (SELECT max(doc_id) // 2 AS mid FROM documents),
       |b AS (
       |  SELECT source,
       |    CASE WHEN doc_id < mid THEN 'early' ELSE 'late' END AS era,
       |    ${QuantileSketchOpsImpl.binSql(
              "CAST(len(string_split(text, ' ')) AS BIGINT)")} AS bin
       |  FROM documents, mid),
       |cnt AS (SELECT source, era, bin, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM b GROUP BY 1, 2, 3),
       |tot AS (SELECT source, era, CAST(SUM(c) AS BIGINT) AS n_era
       |  FROM cnt GROUP BY 1, 2),
       |pooled AS (SELECT source, bin, CAST(SUM(c) AS BIGINT) AS c_bin
       |  FROM cnt GROUP BY 1, 2),
       |nsrc AS (SELECT source, CAST(SUM(n_era) AS BIGINT) AS n_src
       |  FROM tot GROUP BY 1),
       |eras AS (SELECT 'early' AS era UNION ALL SELECT 'late'),
       |grid AS (
       |  SELECT pooled.source, eras.era, pooled.bin, pooled.c_bin,
       |    tot.n_era, nsrc.n_src, COALESCE(cnt.c, 0) AS c
       |  FROM pooled CROSS JOIN eras
       |  JOIN tot ON tot.source = pooled.source AND tot.era = eras.era
       |  JOIN nsrc ON nsrc.source = pooled.source
       |  LEFT JOIN cnt ON cnt.source = pooled.source AND cnt.era = eras.era
       |    AND cnt.bin = pooled.bin),
       |t2 AS (SELECT source, era, bin, c, n_era,
       |    CAST(n_era AS DOUBLE) * CAST(c_bin AS DOUBLE) / CAST(n_src AS DOUBLE) AS e
       |  FROM grid),
       |t3 AS (SELECT source, era, bin, n_era,
       |    (CAST(c AS DOUBLE) - e) * (CAST(c AS DOUBLE) - e) / e AS term
       |  FROM t2)
       |SELECT source,
       |  CAST(MAX(CASE WHEN era = 'early' THEN n_era END) AS BIGINT) AS n_early,
       |  CAST(MAX(CASE WHEN era = 'late' THEN n_era END) AS BIGINT) AS n_late,
       |  CAST(COUNT(DISTINCT bin) AS BIGINT) AS n_bins,
       |  CAST(SUM(CAST(FLOOR(term * 1e9) AS DECIMAL(38,0))) AS DOUBLE) / 1e9 AS chi2
       |FROM t3 GROUP BY source ORDER BY source""".stripMargin

  private lazy val q185Sql: String = {
    val comps = (1 to Dims).map(i =>
      s"${VectorOpsImpl.duckCentComp(i)} / COUNT(*) AS c$i").mkString(",\n    ")
    def chain(f: Int => String) = (1 to Dims).map(f).mkString(" + ")
    val dot = chain(i => s"a.c$i * b.c$i")
    val ne = chain(i => s"a.c$i * a.c$i")
    val nl = chain(i => s"b.c$i * b.c$i")
    val sq = chain(i => s"(a.c$i - b.c$i) * (a.c$i - b.c$i)")
    s"""WITH mid AS (SELECT max(vec_id) // 2 AS mid FROM embeddings),
       |cent AS MATERIALIZED (
       |  SELECT d.source,
       |    CASE WHEN e.vec_id < mid THEN 'early' ELSE 'late' END AS era,
       |    CAST(COUNT(*) AS BIGINT) AS n,
       |    $comps
       |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id, mid
       |  GROUP BY 1, 2)
       |SELECT a.source, a.n AS n_early, b.n AS n_late,
       |  ($dot) / (sqrt($ne) * sqrt($nl)) AS drift_cosine,
       |  sqrt($sq) AS shift_l2
       |FROM cent a JOIN cent b ON a.source = b.source
       |WHERE a.era = 'early' AND b.era = 'late'
       |ORDER BY a.source""".stripMargin
  }

  lazy val queries: Seq[Q] = Seq(
    Q("q185_source_drift", sourceDrift, Some(q185Sql)),
    Q("q195_length_drift", lengthDrift, Some(q195Sql)))
}

object DriftOps {
  lazy val queries: Seq[Q] = DriftOpsImpl.queries
}
