package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Q

/** GRAPH-EXPANSION REACH panel (q192) — the measurement that justifies
  * the q99 graph-search design: per query node, how many distinct
  * candidates one hop along the kNN graph supplies, how many the second
  * hop adds, and what fraction of the EXACT top-5 the expanded set
  * already contains (reach-recall@5). q77 rates the search's final
  * output; this rates the CANDIDATE GENERATOR itself, which is the knob
  * a tuner actually turns (hops and k trade candidate count against
  * recall — the NN-descent argument made measurable).
  *
  * Scale shape: both hops are |queries|-scale joins against the ranked
  * edge list (≤ k then ≤ k² rows per query — 12 here); the exact top-5
  * reference is the memoized q51 artifact; counts and intersections are
  * integer, recall = n/5.0 is the only double. The corpus is never
  * scanned.
  */
object GraphReachImpl {

  import VectorOpsImpl.KnnK

  def graphReach(s: SparkSession, dir: String): DataFrame = {
    val edges = VectorOpsImpl.knnGraphRaw(s, dir).select(col("src"), col("dst"))
    val q = edges.filter(col("src") < 8).select(col("src").as("query_id"))
      .distinct()
    val hop1 = edges.filter(col("src") < 8)
      .select(col("src").as("query_id"), col("dst").as("cand"))
    val hop2 = hop1.join(edges.withColumnRenamed("src", "cand"), "cand")
      .select(col("query_id"), col("dst").as("cand"))
      .filter(col("cand") =!= col("query_id"))
    val all = hop1.unionByName(hop2).distinct()
    val h1n = hop1.distinct().groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_hop1"))
    val alln = all.groupBy(col("query_id")).agg(count(lit(1)).as("n_reached"))
    val exact = VectorOpsImpl.cosineTopK(s, dir)
      .select(col("query_id"), col("neighbor_id").as("cand"))
    val hit = exact.join(all, Seq("query_id", "cand"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
    q.join(h1n, Seq("query_id"), "left")
      .join(alln, Seq("query_id"), "left")
      .join(hit, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hop1"), lit(0L)).cast(LongType).as("n_hop1"),
        coalesce(col("n_reached"), lit(0L)).cast(LongType).as("n_reached"),
        coalesce(col("n_hit"), lit(0L)).cast(LongType).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") / 5.0).as("reach_recall5"))
      .orderBy(col("query_id"))
  }

  private lazy val q192Sql: String = {
    // the q51 exact chain under disambiguated names + the graph chain
    val dot = VectorOpsImpl.duckDot("a.embedding", "b.embedding")
    val na = VectorOpsImpl.duckDot("a.embedding", "a.embedding")
    val nb = VectorOpsImpl.duckDot("b.embedding", "b.embedding")
    s"""${VectorOps.knnGraphSqlCtes},
       |g AS MATERIALIZED (SELECT src, dst FROM r WHERE rn <= $KnnK),
       |qn AS (SELECT DISTINCT src AS query_id FROM g WHERE src < 8),
       |h1 AS (SELECT src AS query_id, dst AS cand FROM g WHERE src < 8),
       |h2 AS (
       |  SELECT h1.query_id, g2.dst AS cand
       |  FROM h1 JOIN g g2 ON g2.src = h1.cand
       |  WHERE g2.dst <> h1.query_id),
       |allc AS (SELECT DISTINCT query_id, cand FROM
       |  (SELECT * FROM h1 UNION ALL SELECT * FROM h2) u),
       |h1n AS (SELECT query_id, CAST(COUNT(DISTINCT cand) AS BIGINT) AS n_hop1
       |  FROM h1 GROUP BY 1),
       |alln AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_reached
       |  FROM allc GROUP BY 1),
       |ep AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS cand,
       |    ($dot) / (sqrt($na) * sqrt($nb)) AS cosine
       |  FROM embeddings a, embeddings b
       |  WHERE a.vec_id < 8 AND b.vec_id <> a.vec_id),
       |er AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, cand) AS BIGINT) AS rn FROM ep),
       |ex AS (SELECT query_id, cand FROM er WHERE rn <= 5),
       |hit AS (
       |  SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
       |  FROM ex e JOIN allc c ON c.query_id = e.query_id AND c.cand = e.cand
       |  GROUP BY 1)
       |SELECT qn.query_id,
       |  CAST(COALESCE(h1n.n_hop1, 0) AS BIGINT) AS n_hop1,
       |  CAST(COALESCE(alln.n_reached, 0) AS BIGINT) AS n_reached,
       |  CAST(COALESCE(hit.n_hit, 0) AS BIGINT) AS n_hit,
       |  CAST(COALESCE(hit.n_hit, 0) AS DOUBLE) / 5.0 AS reach_recall5
       |FROM qn
       |LEFT JOIN h1n ON h1n.query_id = qn.query_id
       |LEFT JOIN alln ON alln.query_id = qn.query_id
       |LEFT JOIN hit ON hit.query_id = qn.query_id
       |ORDER BY qn.query_id""".stripMargin
  }

  lazy val queries: Seq[Q] = Seq(
    Q("q192_graph_reach", graphReach, Some(q192Sql)))
}

object GraphReachOps {
  lazy val queries: Seq[Q] = GraphReachImpl.queries
}
