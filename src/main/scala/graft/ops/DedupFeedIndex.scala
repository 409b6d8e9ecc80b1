package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.{Q, Tables}
import graft.cdc.Cdc

/** FEED-DRIVEN DEDUP-INDEX maintenance — the change feed applied to the
  * dedup hot path: the banded MinHash-LSH index (doc_id, band, band-hash)
  * over a VERSIONED documents corpus is maintained from the v1→v2 feed
  * alone, never a corpus rescan. Together with q186 (secondary index) and
  * q206 (ANN ground truth) this closes the pattern: every derived
  * structure a training pipeline keeps beside the corpus — inverted
  * indexes, dedup signatures, similarity truth — repairs from the same
  * per-key feed, each with its own retract/re-add algebra.
  *
  * The LSH index's algebra is the simplest of the three: band entries are
  * a pure function of one document's text, so a retracted key (DELETE, or
  * UPDATE's before-image) drops ALL its entries by doc_id, and the
  * after-images (INSERT/UPDATE) re-shingle ONLY the changed documents.
  * Cost: O(|feed| × shingles-per-doc) + an anti-join of the index against
  * the (broadcast) retracted-key set — at 1% daily churn on a 100 TB
  * corpus this replaces a full re-shingle with a delta-sized one, and the
  * maintained index feeds the q42/q201 band join unchanged.
  *
  * The q207 gate runs the lifecycle inside the correctness gate: corpus
  * committed as v1, a churn batch (UPDATE = three appended tokens, DELETE)
  * as v2, index persisted at v1 and repaired from the feed — and the
  * result must hash-match DuckDB's one-shot re-shingle of the MODIFIED
  * corpus (maintained-index-equals-recompute, the q140/q181/q186/q206
  * discipline). Lanes/bands mirror q42's md5-window construction exactly,
  * so the maintained index is drop-in for the pair generator.
  */
object DedupFeedIndexImpl {

  private val roots = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  def clearCaches(): Unit = roots.clear()

  /** 4-band × 2-lane entries of each (doc_id, text) row — the q42 pipeline
    * ([[DedupOpsImpl.minhashSignatures]] + its banding) over an arbitrary
    * frame instead of the corpus table. */
  private def bandsOf(docs: DataFrame): DataFrame = {
    val sh = docs
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"),
        explode(expr(
          """array_distinct(filter(transform(sequence(1, size(toks)),
            |  i -> concat(try_element_at(toks, i), ' ', try_element_at(toks, i + 1),
            |              ' ', try_element_at(toks, i + 2))),
            |  x -> x IS NOT NULL))""".stripMargin)).as("sh"))
      .withColumn("d1", md5(col("sh")))
      .withColumn("d2", md5(concat(lit("1:"), col("sh"))))
    val lanes = (0 until 8).map { i =>
      min(substring(col(if (i < 4) "d1" else "d2"), 1 + 8 * (i % 4), 8)).as(s"h$i")
    }
    sh.groupBy(col("doc_id")).agg(lanes.head, lanes.tail: _*)
      .withColumn("bands", array(
        (0 until 4).map(b => struct(lit(b.toLong).as("band"),
          md5(concat(col(s"h${2 * b}"), col(s"h${2 * b + 1}"))).as("bh"))): _*))
      .select(col("doc_id"), explode(col("bands")).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
  }

  /** Wrap (doc_id, text) rows as CDC envelopes keyed on doc_id. */
  private def envelopeOf(rows: DataFrame, op: String, seqBase: Long): DataFrame = {
    val imgType = StructType(Seq(
      StructField("user_id", LongType), StructField("text", StringType)))
    val img = struct(col("doc_id").as("user_id"), col("text"))
    val newImg = if (op == "DELETE") lit(null).cast(imgType) else img
    val oldImg = if (op == "INSERT") lit(null).cast(imgType) else img
    val seq = lpad((lit(seqBase) + col("doc_id")).cast("string"), 20, "0")
    rows.select(
      Cdc.metadataStruct("media", "documents", lit("USER"), oldImg, newImg,
        lit(0L), seq).as("metadata"),
      newImg.as("image"), oldImg.as("oldImage"))
  }

  private[graft] def ensureMaintained(s: SparkSession, dir: String): String =
    Memo.getOrCacheAny(roots, s, dir, { _ =>
      val root = java.nio.file.Files.createTempDirectory("graft_lsh_feed").toString
      val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0) // single-row metadata
      // v1: the whole corpus; v2: UPDATEs (three appended tokens — new
      // shingles under the same key) + DELETEs; both mirrored in the oracle
      VersionedTableImpl.commitMerge(s, root, envelopeOf(docs, "INSERT", 0L), 8)
      val upd = docs.filter(pmod(col("doc_id"), lit(11L)) === 4)
        .withColumn("text", concat(col("text"), lit(" zzupdated zzdoc zztokens")))
      val del = docs.filter(pmod(col("doc_id"), lit(11L)) === 7)
      VersionedTableImpl.commitMerge(s, root,
        envelopeOf(upd, "UPDATE", maxId + 1L)
          .unionByName(envelopeOf(del, "DELETE", maxId + 1L)), 8)

      // index persisted at v1 (fresh parquet lineage for the repair)
      bandsOf(VersionedTableImpl.readVersion(s, root, 1)
          .select(col("user_id").as("doc_id"), col("text")))
        .write.mode("overwrite").parquet(s"$root/idx_v1")

      // feed-driven repair: retract by key, re-shingle only after-images
      val old = s.read.parquet(s"$root/idx_v1")
      val feed = VersionedTableImpl.changeFeed(s, root, 1, 2)
      val retracted = feed.filter(col("change_op").isin("DELETE", "UPDATE"))
        .select(col("user_id").as("doc_id"))
      val added = bandsOf(feed.filter(col("change_op").isin("INSERT", "UPDATE"))
        .select(col("user_id").as("doc_id"), col("text_after").as("text")))
      old.join(broadcast(retracted), Seq("doc_id"), "left_anti")
        .unionByName(added)
        .write.mode("overwrite").parquet(s"$root/idx_v2")
      root
    })

  /** q207: the feed-maintained band index, read back with fresh lineage —
    * must hash-match the one-shot re-shingle of the modified corpus. */
  def maintainedBandIndex(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"${ensureMaintained(s, dir)}/idx_v2")
      .orderBy(col("doc_id"), col("band"))

  private lazy val q207Sql: String = {
    val laneSql = (0 until 8).map { i =>
      val src = if (i < 4) "md5(sh)" else "md5('1:' || sh)"
      s"MIN(substr($src, ${1 + 8 * (i % 4)}, 8)) AS h$i"
    }.mkString(", ")
    val bandsSel = (0 until 4).map(b =>
      s"SELECT doc_id, CAST($b AS BIGINT) AS band, md5(h${2 * b} || h${2 * b + 1}) AS bh FROM sig")
      .mkString(" UNION ALL ")
    s"""WITH corpus AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 11 = 4 THEN text || ' zzupdated zzdoc zztokens'
       |         ELSE text END AS text
       |  FROM documents WHERE doc_id % 11 <> 7),
       |shd AS (
       |  SELECT doc_id, unnest(list_distinct(list_filter(list_transform(
       |    generate_series(1, len(t)),
       |    i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]),
       |    x -> x IS NOT NULL))) AS sh
       |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM corpus)),
       |sig AS (SELECT doc_id, $laneSql FROM shd GROUP BY doc_id),
       |bands AS ($bandsSel)
       |SELECT doc_id, band, bh FROM bands ORDER BY doc_id, band""".stripMargin
  }

  lazy val queries: Seq[Q] = Seq(
    Q("q207_dedup_feed_index", maintainedBandIndex, Some(q207Sql)))
}

object DedupFeedIndexOps {
  lazy val queries: Seq[Q] = DedupFeedIndexImpl.queries
}
