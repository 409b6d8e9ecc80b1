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
}

object MultimodalOps {

  def queries: Seq[Q] = Seq(
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
    })
  )
}
