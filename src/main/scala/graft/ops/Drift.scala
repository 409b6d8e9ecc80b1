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
    Q("q185_source_drift", sourceDrift, Some(q185Sql)))
}

object DriftOps {
  lazy val queries: Seq[Q] = DriftOpsImpl.queries
}
