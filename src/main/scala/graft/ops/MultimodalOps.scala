package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}

/** Driver-gate coverage for the multimodal plumbing: binary columns with
  * typed metadata extraction. The oracle-checkable part is the pure-SQL
  * metadata path (byte length, first byte, digest-derived pseudo-dims —
  * exactly what [[graft.multimodal.Multimodal.FakeDecoder]] computes); the
  * mapPartitions decode stage itself is exercised in MultimodalSpec.
  */
object MultimodalOpsImpl {

  /** Binary metadata over a synthesized payload column (text → utf-8 bytes;
    * testdata ships no real media, FIXTURES.md). Width/height derive from
    * md5 nibbles — the same arithmetic as FakeDecoder, expressed relationally
    * so DuckDB can replay it. */
  def binaryMeta(s: SparkSession, dir: String): DataFrame = {
    def nib(pos: Int) = s"(instr('0123456789abcdef', substr(md5(text), $pos, 1)) - 1)"
    Tables(s, dir, "documents")
      .withColumn("content", encode(col("text"), "UTF-8"))
      .select(
        col("doc_id"),
        octet_length(col("content")).cast(LongType).as("n_bytes"),
        ascii(col("text")).cast(LongType).as("first_byte"),
        expr(s"CAST(${nib(1)} * 16 + ${nib(2)} + 1 AS BIGINT)").as("width"),
        expr(s"CAST(${nib(3)} * 16 + ${nib(4)} + 1 AS BIGINT)").as("height"),
        (octet_length(col("content")).cast(LongType) % 7 + 1).as("n_frames"))
      .orderBy(col("doc_id"))
  }

  /** Frame-sampling fan-out: one row per sampled frame index (stride 2). */
  def frameSample(s: SparkSession, dir: String): DataFrame =
    binaryMeta(s, dir)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(2L))).as("frame_idx"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Byte window hashed per sampled frame (a stand-in for a perceptual
    * frame hash — a real deployment hashes decoded pixels behind
    * [[graft.multimodal.Multimodal.MediaDecoder]]; the Spark shape is
    * identical). */
  val FrameWin = 16
  /** Near-dup thresholds: signatures shared by more than [[FrameSigDfCap]]
    * videos are boilerplate (dropped, the q102/q42 cap discipline); a pair
    * needs [[FrameMinShared]] shared signatures to count as near-dup. */
  val FrameSigDfCap = 20
  val FrameMinShared = 2

  /** Video near-duplicate detection via shared frame signatures (q120):
    * two videos are near-dups when ≥ [[FrameMinShared]] of their SAMPLED
    * frames hash identically — the standard frame-fingerprint shape for
    * video dedup (re-encodes, trims and container changes keep most frame
    * hashes; perceptual hashing slots in behind the decoder seam without
    * changing the plan).
    *
    * Scale shape: signatures are a narrow per-frame map; the pair join is
    * the capped-bucket equi-join every dedup family here uses — per-sig
    * fan-out ≤ cap², never corpus × corpus — and the pair aggregate keys
    * on the (a, b) id pair. */
  def videoNearDup(s: SparkSession, dir: String): DataFrame = {
    val sigs = Tables(s, dir, "documents")
      .withColumn("n_frames",
        (octet_length(encode(col("text"), "UTF-8")).cast(LongType) % 7 + 1))
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(2L))).as("frame_idx"))
      .select(col("doc_id"),
        md5(expr(s"substr(text, CAST(frame_idx * $FrameWin + 1 AS INT), $FrameWin)"))
          .as("sig"))
      .distinct()
    val rare = sigs.groupBy(col("sig")).agg(count(lit(1)).as("c"))
      .filter(col("c") <= FrameSigDfCap).select(col("sig"))
    val k = sigs.join(rare, "sig")
    val a = k.select(col("sig"), col("doc_id").as("a_id"))
    val b = k.select(col("sig"), col("doc_id").as("b_id"))
    a.join(b, "sig").filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= FrameMinShared)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Per-image perceptual hash (q136): the native codegen'd
    * [[graft.expr.DHashExpr]] over the binary payload. One narrow scan →
    * one LONG per image; the corpus-sized artifact every downstream image
    * near-dup / contamination probe keys on. */
  def imageDHash(s: SparkSession, dir: String): DataFrame =
    dhashes(s, dir).orderBy(col("doc_id"))

  private def dhashes(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        graft.expr.DHashFunctions.dhash64(encode(col("text"), "UTF-8")).as("dhash"))

  /** dHash banding constants: 4 bands of 16 bits (band 3 carries 15 — bit
    * 63 does not exist, see [[graft.expr.DHash64]]); buckets larger than
    * [[DHashBucketCap]] are boilerplate and dropped (the SimHash/LSH cap
    * discipline); a candidate pair is a near-dup at Hamming distance ≤
    * [[DHashMaxHamming]] of 63 bits. */
  val DHashBands = 4
  val DHashBucketCap = 50
  val DHashMaxHamming = 8

  /** Image near-duplicate pairs (q137): band the 63-bit dHash into 16-bit
    * bucket keys, equi-join within capped buckets, verify candidates by
    * exact Hamming distance — SimHash's banding applied to the image
    * signature, so re-encoded / lightly-edited images collapse like
    * reworded text does.
    *
    * Scale shape: the band table is 4 rows per image (narrow longs); the
    * only join is bucket-equi with fan-out ≤ cap² per bucket — never
    * corpus × corpus; the Hamming verify is a codegen'd xor/popcount on
    * the pair rows only. */
  def imageNearDup(s: SparkSession, dir: String): DataFrame = {
    val bnd = dhashes(s, dir)
      .select(col("doc_id"), col("dhash"),
        explode(sequence(lit(0L), lit(DHashBands - 1L))).as("j"))
      .withColumn("key",
        expr("shiftright(dhash, CAST(16 * j AS INT)) & 65535"))
    val ok = bnd.groupBy(col("j"), col("key")).agg(count(lit(1)).as("c"))
      .filter(col("c") <= DHashBucketCap).select(col("j"), col("key"))
    val k = bnd.join(ok, Seq("j", "key"))
    val a = k.select(col("j"), col("key"), col("doc_id").as("a_id"), col("dhash").as("ha"))
    val b = k.select(col("j"), col("key"), col("doc_id").as("b_id"), col("dhash").as("hb"))
    a.join(b, Seq("j", "key")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        expr("CAST(bit_count(ha ^ hb) AS BIGINT)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= DHashMaxHamming)
      .orderBy(col("a_id"), col("b_id"))
  }
}

object MultimodalOps {

  /** DuckDB mirror of [[graft.expr.DHash64.compute]] over the utf-8 bytes
    * of `text` (the corpus is ASCII, so `ord(substr(text, i+1, 1))` IS byte
    * i — asserted by DHashSpec against the binary-fed expression): stripe
    * sums by `i*72 // n`, one bit per adjacent-stripe comparison, bits 0–62. */
  private val dhashCte: String =
    """d AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n FROM documents),
      |pos AS (SELECT doc_id, CAST(unnest(generate_series(0, n - 1)) AS BIGINT) AS i, text, n FROM d),
      |st AS (SELECT doc_id, (i * 72) // n AS k,
      |         SUM(ord(substr(text, CAST(i + 1 AS INT), 1))) AS s
      |       FROM pos GROUP BY 1, 2),
      |grid AS (SELECT d.doc_id, g.k, CAST(COALESCE(st.s, 0) AS BIGINT) AS s
      |         FROM d CROSS JOIN (SELECT CAST(unnest(generate_series(0, 71)) AS BIGINT) AS k) g
      |         LEFT JOIN st ON st.doc_id = d.doc_id AND st.k = g.k),
      |h AS (SELECT a.doc_id,
      |        CAST(SUM(CASE WHEN b.s > a.s
      |          THEN (CAST(1 AS BIGINT) << CAST((a.k // 9) * 8 + (a.k % 9) AS INT))
      |          ELSE 0 END) AS BIGINT) AS dhash
      |      FROM grid a JOIN grid b ON b.doc_id = a.doc_id AND b.k = a.k + 1
      |      WHERE a.k % 9 < 8 AND (a.k // 9) * 8 + (a.k % 9) < 63
      |      GROUP BY 1)""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("q136_multimodal_dhash", MultimodalOpsImpl.imageDHash, Some(
      s"""WITH $dhashCte
         |SELECT doc_id, dhash FROM h ORDER BY doc_id""".stripMargin)),

    Q("q137_multimodal_dhash_neardup", MultimodalOpsImpl.imageNearDup, Some {
      import MultimodalOpsImpl.{DHashBucketCap, DHashMaxHamming}
      s"""WITH $dhashCte,
         |bnd AS (SELECT doc_id, dhash, j, (dhash >> CAST(16 * j AS INT)) & 65535 AS key
         |        FROM h CROSS JOIN (SELECT CAST(unnest(generate_series(0, 3)) AS BIGINT) AS j) jj),
         |ok AS (SELECT j, key FROM bnd GROUP BY 1, 2 HAVING COUNT(*) <= $DHashBucketCap),
         |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
         |           CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
         |         FROM bnd a JOIN ok USING (j, key)
         |         JOIN bnd b ON b.j = a.j AND b.key = a.key AND a.doc_id < b.doc_id)
         |SELECT a_id, b_id, hamming FROM cand
         |WHERE hamming <= $DHashMaxHamming ORDER BY a_id, b_id""".stripMargin
    }),


    Q("q60_multimodal_meta", MultimodalOpsImpl.binaryMeta, Some {
      def nib(pos: Int) = s"(strpos('0123456789abcdef', substr(md5(text), $pos, 1)) - 1)"
      s"""SELECT doc_id,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  CAST(ascii(text) AS BIGINT) AS first_byte,
         |  CAST(${nib(1)} * 16 + ${nib(2)} + 1 AS BIGINT) AS width,
         |  CAST(${nib(3)} * 16 + ${nib(4)} + 1 AS BIGINT) AS height,
         |  CAST(octet_length(encode(text)) % 7 + 1 AS BIGINT) AS n_frames
         |FROM documents ORDER BY doc_id""".stripMargin
    }),

    Q("q61_multimodal_frames", MultimodalOpsImpl.frameSample, Some {
      def nib(pos: Int) = s"(strpos('0123456789abcdef', substr(md5(text), $pos, 1)) - 1)"
      s"""WITH m AS (
         |  SELECT doc_id, CAST(octet_length(encode(text)) % 7 + 1 AS BIGINT) AS n_frames
         |  FROM documents)
         |SELECT doc_id, n_frames, CAST(unnest(generate_series(0, n_frames - 1, 2)) AS BIGINT) AS frame_idx
         |FROM m ORDER BY doc_id, frame_idx""".stripMargin
    }),

    Q("q120_multimodal_neardup", MultimodalOpsImpl.videoNearDup, Some {
      import MultimodalOpsImpl.{FrameWin, FrameSigDfCap, FrameMinShared}
      s"""WITH m AS (
         |  SELECT doc_id, text,
         |    CAST(octet_length(encode(text)) % 7 + 1 AS BIGINT) AS n_frames
         |  FROM documents),
         |f AS (SELECT doc_id,
         |    CAST(unnest(generate_series(0, n_frames - 1, 2)) AS BIGINT) AS frame_idx,
         |    text FROM m),
         |s AS (SELECT DISTINCT doc_id,
         |    md5(substr(text, CAST(frame_idx * $FrameWin + 1 AS INT), $FrameWin)) AS sig
         |  FROM f),
         |rare AS (SELECT sig FROM s GROUP BY sig HAVING COUNT(*) <= $FrameSigDfCap),
         |k AS (SELECT s.doc_id, s.sig FROM s JOIN rare USING (sig))
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_shared
         |FROM k a JOIN k b ON a.sig = b.sig AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING COUNT(*) >= $FrameMinShared
         |ORDER BY a_id, b_id""".stripMargin
    })
  )
}
