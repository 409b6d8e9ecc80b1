package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Q

/** Persisted-index lifecycle for the GRAPH family (kNN edges, community
  * map, PageRank vector) — the discipline PersistedIndexSpec proves for PQ
  * codes and `streaming.StreamIndex` proves for IVF, applied to the graph
  * artifacts: at 100 TB these are not session caches; the build job WRITES
  * them as parquet tables and every consumer (exemplar pick, cards,
  * centrality-weighted sampling) SCANS them with fresh lineage. q140 runs
  * that round trip inside the correctness gate: build → persist → read
  * back → exemplar pick, hash-checked against the SAME oracle as q135's
  * in-session rebuild — so the persisted artifacts are proven equal to the
  * batch build, not merely written.
  *
  * Incremental refresh on corpus append is [[VectorOpsImpl.refreshKnnGraph]]
  * (GraphRefreshSpec proves delta-refresh row-equality with a full
  * rebuild); persistence + refresh together give the production loop:
  * write once, append deltas, re-rank only affected nodes, rewrite the
  * touched partition slices.
  */
object GraphPersistImpl {

  /** One persisted root per (session, corpus dir) — the write happens once
    * and every later consumer scans parquet, exactly the deployment shape. */
  private val roots = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  def clearCaches(): Unit = roots.clear()

  private def ensurePersisted(s: SparkSession, dir: String): String =
    graft.ops.Memo.getOrCacheAny(roots, s, dir, { _ =>
      val root = java.nio.file.Files.createTempDirectory("graft_graph_index").toString
      VectorOpsImpl.knnGraph(s, dir).write.mode("overwrite").parquet(s"$root/edges")
      VectorOpsImpl.knnClusters(s, dir).write.mode("overwrite").parquet(s"$root/clusters")
      VectorOpsImpl.knnPagerank(s, dir).write.mode("overwrite").parquet(s"$root/pagerank")
      root
    })

  /** q140: the q135 exemplar pick computed from the PERSISTED artifacts —
    * fresh parquet lineage, no memoized plan reuse past the build step.
    * Scale shape: two narrow metadata-scale scans joined on vec_id and one
    * per-cluster window; the corpus and the embedding table are never
    * touched at query time. */
  def persistedExemplars(s: SparkSession, dir: String): DataFrame = {
    val root = ensurePersisted(s, dir)
    val cl = s.read.parquet(s"$root/clusters")
    val pr = s.read.parquet(s"$root/pagerank")
    val w = Window.partitionBy(col("cluster")).orderBy(col("score").desc, col("vec_id"))
    cl.join(pr, "vec_id")
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") === 1)
      .select(col("cluster"), col("vec_id").as("exemplar_id"), col("score"))
      .orderBy(col("cluster"))
  }
}

object GraphPersistOps {
  def queries: Seq[Q] = Seq(
    // identical oracle to q135 on purpose: persisted == rebuilt, bitwise
    Q("q140_graph_persisted_exemplars", GraphPersistImpl.persistedExemplars,
      Some(VectorOps.exemplarsOracleSql)))
}
