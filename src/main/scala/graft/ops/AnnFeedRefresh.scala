package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{Q, Tables}
import graft.cdc.Cdc

/** VERSION-AWARE ANN ground-truth maintenance — [[AnnPersistImpl]] (q181:
  * persisted exact top-k, delta refresh on APPEND) composed with the
  * versioned table's CHANGE FEED, so deletes and updates — not just
  * inserts — invalidate exactly the affected query rows.
  *
  * The corpus itself lives as a VERSIONED lakehouse table keyed on vec_id
  * (the embedding column is just payload — [[LakehouseOpsImpl.mergeLatest]]
  * carries any image schema): v1 INSERTs every vector, v2 applies a CDC
  * batch of UPDATEs (re-embedded documents: the vector changes under the
  * same key) and DELETEs (documents removed from the corpus). The q181
  * append-only refresh is wrong under both: a deleted neighbor must leave
  * the lists it sits in, and a truncated top-k cannot say who replaces it.
  *
  * The feed-driven refresh ([[refreshFromFeed]]):
  *  - AFFECTED queries = those whose persisted top-k contains a
  *    DELETEd/UPDATEd neighbor (semi-join of the persisted lists against
  *    the feed's retractions — k·|queries| rows vs feed, metadata-sized).
  *    Only these re-run the full brute pass, against the NEW version's
  *    state: a retracted member's replacement can come from anywhere in
  *    the corpus, so no cheaper exact repair exists.
  *  - UNAFFECTED queries keep their persisted rows (bitwise — the same
  *    doubles the oracle computes) and merge-re-rank only the feed's
  *    after-images (INSERT + UPDATE): a new/re-embedded vector can ENTER
  *    a list, and nothing else can leave it.
  *
  * The q206 gate runs the lifecycle inside the correctness gate: truth
  * persisted at v1, the v2 batch committed (UPDATE = negated embedding for
  * vec_id % 7 = 5, DELETE for vec_id % 7 = 3, queries vec_id < 8 left
  * untouched), the feed-driven refresh applied — and the result must
  * hash-match DuckDB's one-shot brute force over the MODIFIED corpus
  * (maintained-truth-equals-recompute, the q140/q181/q186 discipline).
  *
  * Scale shape: the feed is |changed keys| rows; unaffected queries cost
  * |queries| × |after-images| (broadcast query side, delta scanned once);
  * affected queries cost |affected| × corpus — the full-rescan set shrinks
  * to the queries that actually lost a neighbor, instead of re-running the
  * nightly brute pass for everyone. All reads go through the versioned
  * manifests, so the refresh pins to an exact corpus version.
  */
object AnnFeedRefreshImpl {

  private val roots = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  def clearCaches(): Unit = roots.clear()

  private def cosineExpr: String = {
    val dot = VectorOpsImpl.sparkDot("qe", "ce")
    val qn = VectorOpsImpl.sparkDot("qe", "qe")
    val cn = VectorOpsImpl.sparkDot("ce", "ce")
    s"($dot) / (sqrt($qn) * sqrt($cn))"
  }

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

  /** Wrap embedding rows (key, vector) as CDC envelopes. `op` decides the
    * image placement: INSERT/UPDATE carry a new image, DELETE only an old
    * one (Cdc.operationType derives the op from exactly that). */
  private def envelopeOf(rows: DataFrame, op: String, seqBase: Long): DataFrame = {
    val imgType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id", LongType),
      org.apache.spark.sql.types.StructField("embedding",
        rows.schema("embedding").dataType)))
    val img = struct(col("vec_id").as("user_id"), col("embedding"))
    val newImg = if (op == "DELETE") lit(null).cast(imgType) else img
    val oldImg = if (op == "INSERT") lit(null).cast(imgType) else img
    val seq = lpad((lit(seqBase) + col("vec_id")).cast("string"), 20, "0")
    rows.select(
      Cdc.metadataStruct("media", "embeddings", lit("USER"), oldImg, newImg,
        lit(0L), seq).as("metadata"),
      newImg.as("image"), oldImg.as("oldImage"))
  }

  /** Build the versioned corpus + persist truth v1 + commit the churn
    * batch + refresh from the feed; memoized per (session, dir). */
  private[graft] def ensureRefreshed(s: SparkSession, dir: String): String =
    Memo.getOrCacheAny(roots, s, dir, { _ =>
      graft.expr.DotF64.register(s)
      val root = java.nio.file.Files.createTempDirectory("graft_ann_feed").toString
      val e = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val maxId = e.agg(max(col("vec_id"))).head().getLong(0) // single-row metadata
      // v1: the whole corpus as INSERTs
      VersionedTableImpl.commitMerge(s, root, envelopeOf(e, "INSERT", 0L), 8)
      // v2: one CDC batch mixing UPDATEs (re-embedded: negated vector —
      // exact under IEEE sign flip, so the oracle mirrors it bitwise) and
      // DELETEs; queries (vec_id < 8) stay untouched
      val upd = e.filter(col("vec_id") >= 8 && pmod(col("vec_id"), lit(7L)) === 5)
        .withColumn("embedding", transform(col("embedding"), x => -x))
      val del = e.filter(col("vec_id") >= 8 && pmod(col("vec_id"), lit(7L)) === 3)
      VersionedTableImpl.commitMerge(s, root,
        envelopeOf(upd, "UPDATE", maxId + 1L)
          .unionByName(envelopeOf(del, "DELETE", maxId + 1L)), 8)

      val state1 = VersionedTableImpl.readVersion(s, root, 1)
      val q = state1.filter(col("user_id") < 8)
        .select(col("user_id").as("query_id"), col("embedding").as("qe"))
      // persisted truth over v1 (fresh parquet lineage for the refresh)
      top5(scorePairs(q, state1.select(col("user_id").as("neighbor_id"),
          col("embedding").as("ce"))))
        .write.mode("overwrite").parquet(s"$root/truth_v1")

      val old = s.read.parquet(s"$root/truth_v1")
      val feed = VersionedTableImpl.changeFeed(s, root, 1, 2)
      val state2 = VersionedTableImpl.readVersion(s, root, 2)
      refreshFromFeed(old, q, feed, state2)
        .write.mode("overwrite").parquet(s"$root/truth_v2")
      root
    })

  /** The feed-driven exact-top-k repair (see object doc). `old` carries
    * (query_id, rn, neighbor_id, cosine); `feed` is a
    * [[VersionedTableImpl.changeFeed]] whose payload includes
    * `embedding_after`; `state` is the destination version. */
  def refreshFromFeed(old: DataFrame, q: DataFrame, feed: DataFrame,
      state: DataFrame): DataFrame = {
    val retracted = feed.filter(col("change_op").isin("DELETE", "UPDATE"))
      .select(col("user_id").as("neighbor_id"))
    val added = feed.filter(col("change_op").isin("INSERT", "UPDATE"))
      .select(col("user_id").as("neighbor_id"), col("embedding_after").as("ce"))
    val affected = old.join(broadcast(retracted), Seq("neighbor_id"), "left_semi")
      .select(col("query_id")).distinct() // <= |queries| rows
    // unaffected: persisted rows survive bitwise; only after-images can enter
    val keptLists = old.join(broadcast(affected), Seq("query_id"), "left_anti")
    val keptQueries = q.join(broadcast(affected), Seq("query_id"), "left_anti")
    val merged = top5(keptLists
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
      .unionByName(scorePairs(keptQueries, added))
      .distinct()) // redelivery-safe: a re-scored survivor collapses
    // affected: full exact re-scan against the new version's state
    val rescored = top5(scorePairs(
      q.join(broadcast(affected), Seq("query_id"), "left_semi"),
      state.select(col("user_id").as("neighbor_id"), col("embedding").as("ce"))))
    merged.unionByName(rescored)
  }

  /** q206: the feed-refreshed exact top-5, read back with fresh lineage —
    * must hash-match the one-shot brute force over the modified corpus. */
  def feedRefreshedTruth(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"${ensureRefreshed(s, dir)}/truth_v2")
      .orderBy(col("query_id"), col("rn"))

  private lazy val q206Sql: String = {
    import VectorOpsImpl.duckDot
    s"""WITH corpus AS (
       |  SELECT vec_id,
       |    CASE WHEN vec_id >= 8 AND vec_id % 7 = 5
       |         THEN list_transform(embedding, x -> -x)
       |         ELSE embedding END AS embedding
       |  FROM embeddings
       |  WHERE NOT (vec_id >= 8 AND vec_id % 7 = 3)),
       |p AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    (${duckDot("a.embedding", "b.embedding")})
       |      / (sqrt(${duckDot("a.embedding", "a.embedding")})
       |         * sqrt(${duckDot("b.embedding", "b.embedding")})) AS cosine
       |  FROM corpus a, corpus b
       |  WHERE a.vec_id < 8 AND b.vec_id <> a.vec_id),
       |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rn FROM p)
       |SELECT query_id, rn, neighbor_id, cosine FROM r WHERE rn <= 5
       |ORDER BY query_id, rn""".stripMargin
  }

  lazy val queries: Seq[Q] = Seq(
    Q("q206_ann_feed_refresh", feedRefreshedTruth, Some(q206Sql)))
}

object AnnFeedRefreshOps {
  lazy val queries: Seq[Q] = AnnFeedRefreshImpl.queries
}
