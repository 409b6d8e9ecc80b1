package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{Q, Tables}

/** CLUSTERING-QUALITY panel (q184) — external validation of the q97
  * mutual-kNN communities against the embeddings' labels: PURITY (the
  * share of points whose cluster's majority label is their own) and the
  * pair-counting RAND INDEX (the share of point pairs on which the
  * clustering and the labeling agree). This closes the evaluation loop
  * the ANN family opened: recall/NDCG panels (q77/q113) rate the INDEX,
  * this rates the downstream CLUSTERING a curation pipeline actually
  * consumes (SemDeDup's cluster-scoped dedup q109, the exemplar cards
  * q134/q135).
  *
  * Determinism discipline: every input to both metrics is an exact BIGINT
  * from the clusters × labels contingency table — pair counts via
  * C(x,2) = x·(x−1) div 2 (always even, integer division exact in both
  * engines) — and the only doubles are the two final ratios, computed by
  * the same expression text both sides (numerators and denominators are
  * also emitted as BIGINTs, so the hash compare does not rest on the
  * division at all).
  *
  * Scale shape: the community map is pair-graph-sized; one join against
  * the (vec_id, label) projection and a map-side-combined contingency
  * reduce produce ≤ clusters × labels rows, and everything after is
  * metadata-scale arithmetic on single-row frames (broadcast cross
  * joins). The corpus-sized embedding table is touched once, narrowly.
  */
object ClusterEvalImpl {

  def clusterQuality(s: SparkSession, dir: String): DataFrame = {
    val cl = VectorOpsImpl.knnClusters(s, dir)
    val lab = Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("label").cast(LongType).as("label"))
    val cont = cl.join(lab, "vec_id")
      .groupBy(col("cluster"), col("label")).agg(count(lit(1)).as("c"))
    val tot = cont.agg(
      sum(col("c")).cast(LongType).as("n"),
      sum(expr("c * (c - 1) DIV 2")).cast(LongType).as("a_pairs"))
    val byCluster = cont.groupBy(col("cluster"))
      .agg(sum(col("c")).cast(LongType).as("nc"),
        max(col("c")).cast(LongType).as("maxc"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(expr("nc * (nc - 1) DIV 2")).cast(LongType).as("b1"),
        sum(col("maxc")).cast(LongType).as("pure"))
    val byLabel = cont.groupBy(col("label"))
      .agg(sum(col("c")).cast(LongType).as("nl"))
      .agg(sum(expr("nl * (nl - 1) DIV 2")).cast(LongType).as("b2"))
    tot.crossJoin(broadcast(byCluster)).crossJoin(broadcast(byLabel))
      .withColumn("all_pairs", expr("n * (n - 1) DIV 2"))
      .withColumn("ri_num", expr("all_pairs + 2 * a_pairs - b1 - b2"))
      .select(col("n"), col("n_clusters"), col("pure"),
        expr("CAST(pure AS DOUBLE) / CAST(n AS DOUBLE)").as("purity"),
        col("ri_num"), col("all_pairs").as("ri_den"),
        expr("CAST(ri_num AS DOUBLE) / CAST(all_pairs AS DOUBLE)").as("rand_index"))
  }

  private lazy val q184Sql: String =
    s"""${VectorOps.clustersSqlCtes},
       |cont AS (
       |  SELECT cl.cluster, CAST(e.label AS BIGINT) AS label,
       |    CAST(COUNT(*) AS BIGINT) AS c
       |  FROM cl JOIN embeddings e ON e.vec_id = cl.vec_id
       |  GROUP BY 1, 2),
       |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
       |    CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS a_pairs FROM cont),
       |rows_ AS (SELECT cluster, CAST(SUM(c) AS BIGINT) AS nc,
       |    CAST(MAX(c) AS BIGINT) AS maxc FROM cont GROUP BY 1),
       |rb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
       |    CAST(SUM(nc * (nc - 1) // 2) AS BIGINT) AS b1,
       |    CAST(SUM(maxc) AS BIGINT) AS pure FROM rows_),
       |cols_ AS (SELECT label, CAST(SUM(c) AS BIGINT) AS nl FROM cont GROUP BY 1),
       |cb AS (SELECT CAST(SUM(nl * (nl - 1) // 2) AS BIGINT) AS b2 FROM cols_)
       |SELECT n, n_clusters, pure,
       |  CAST(pure AS DOUBLE) / CAST(n AS DOUBLE) AS purity,
       |  (n * (n - 1) // 2 + 2 * a_pairs - b1 - b2) AS ri_num,
       |  n * (n - 1) // 2 AS ri_den,
       |  CAST(n * (n - 1) // 2 + 2 * a_pairs - b1 - b2 AS DOUBLE)
       |    / CAST(n * (n - 1) // 2 AS DOUBLE) AS rand_index
       |FROM tot, rb, cb""".stripMargin

  lazy val queries: Seq[Q] = Seq(
    Q("q184_cluster_quality", clusterQuality, Some(q184Sql)))
}

object ClusterEvalOps {
  lazy val queries: Seq[Q] = ClusterEvalImpl.queries
}
