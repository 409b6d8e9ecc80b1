package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{Q, Tables}

/** Persisted ANN GROUND TRUTH with incremental refresh on corpus append —
  * the [[GraphPersistImpl]] lifecycle (q140) applied to the panel's most
  * expensive input: the exact cosine top-k. A recall/NDCG/MRR panel
  * re-rates approximate indexes constantly, but the exact top-k it rates
  * against only changes when the corpus does — so the production loop
  * WRITES it once as a parquet artifact and, when a batch of vectors is
  * appended, REFRESHES it by scoring each query against ONLY the appended
  * vectors and re-ranking them into the persisted lists (exact top-k over
  * base ∪ delta ≡ top-k of persisted-top-k ∪ scored delta, because a
  * brute-force list can only be displaced by a new candidate). The full
  * brute pass over the corpus never re-runs.
  *
  * The q181 gate runs that lifecycle INSIDE the correctness gate: build
  * the truth over the first ~80% of the corpus by vec_id, persist, score
  * the appended ~20% only, merge-re-rank, persist v2 — and the refreshed
  * artifact must hash-match DuckDB's one-shot brute force over the WHOLE
  * corpus (the identical q51 oracle — persisted+refreshed == rebuilt,
  * bitwise, the q140 discipline).
  *
  * Scale shape: the refresh scores |queries| × |delta| pairs (queries
  * broadcast, delta scanned once) plus the queries × k persisted rows —
  * at 100 TB this is the difference between a nightly full brute pass and
  * a delta-sized touch-up. Cosines for surviving old rows are the
  * PERSISTED doubles (computed by the same expression), so refresh output
  * is bit-identical to a rebuild.
  */
object AnnPersistImpl {

  private val roots = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  def clearCaches(): Unit = roots.clear()

  private def cosineExpr: String = {
    val dot = VectorOpsImpl.sparkDot("qe", "ce")
    val qn = VectorOpsImpl.sparkDot("qe", "qe")
    val cn = VectorOpsImpl.sparkDot("ce", "ce")
    s"($dot) / (sqrt($qn) * sqrt($cn))"
  }

  private def queriesOf(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))

  /** Score every (query, candidate) pair — queries broadcast, candidates
    * scanned once; the only corpus-sized stage of build AND refresh. */
  private def scorePairs(q: DataFrame, cands: DataFrame): DataFrame =
    broadcast(q).join(cands, col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", expr(cosineExpr))
      .select(col("query_id"), col("neighbor_id"), col("cosine"))

  private def top5(pairs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    pairs.withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= 5)
      .select(col("query_id"), col("rn"), col("neighbor_id"), col("cosine"))
  }

  /** Incremental refresh: merge the appended vectors' scores into the
    * persisted per-query lists and re-rank — no base-corpus rescan. The
    * distinct makes redelivery safe (crash-replay re-merges the same
    * delta): a candidate already in the persisted list carries the same
    * bitwise cosine — same expression, same data — so the duplicate
    * collapses instead of occupying two ranks. */
  def refreshTruth(old: DataFrame, q: DataFrame, delta: DataFrame): DataFrame =
    top5(old.select(col("query_id"), col("neighbor_id"), col("cosine"))
      .unionByName(scorePairs(q,
        delta.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))))
      .distinct())

  private def ensurePersisted(s: SparkSession, dir: String): String =
    Memo.getOrCacheAny(roots, s, dir, { _ =>
      graft.expr.DotF64.register(s)
      val root = java.nio.file.Files.createTempDirectory("graft_ann_truth").toString
      val e = Tables(s, dir, "embeddings")
      val maxId = e.agg(max(col("vec_id"))).head().getLong(0) // single-row metadata
      val cut = maxId * 4 / 5
      val q = queriesOf(e)
      // v1: brute truth over the base corpus, persisted
      top5(scorePairs(q, e.filter(col("vec_id") <= cut)
          .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))))
        .write.mode("overwrite").parquet(s"$root/truth")
      // append arrives: refresh FROM THE PERSISTED ARTIFACT (fresh parquet
      // lineage — no memoized plan reuse past the build), delta-only scoring
      val old = s.read.parquet(s"$root/truth")
      refreshTruth(old, q, e.filter(col("vec_id") > cut))
        .write.mode("overwrite").parquet(s"$root/truth_v2")
      root
    })

  /** q181: the persisted-then-refreshed exact top-5, read back with fresh
    * lineage — must hash-match the one-shot whole-corpus brute force. */
  def persistedTruth(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"${ensurePersisted(s, dir)}/truth_v2")
      .orderBy(col("query_id"), col("rn"))

  lazy val queries: Seq[Q] = Seq(
    // identical oracle to q51 on purpose: persisted+refreshed == rebuilt
    Q("q181_ann_truth_refresh", persistedTruth, Some(VectorOps.q51Sql)))
}

object AnnPersistOps {
  lazy val queries: Seq[Q] = AnnPersistImpl.queries
}
