package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata, and decode / feature-extraction
  * runs as a partition-wise batch transform (`mapPartitions` over a typed
  * Dataset — the Scala analogue of a vectorized Python `mapInPandas` stage:
  * one decoder instance per partition, rows streamed through in batches).
  *
  * The actual media decode is STUBBED — this container has no image/audio
  * codecs — behind [[MediaDecoder]]; `FakeDecoder` is deterministic so the
  * schema/partitioning/batching plumbing is fully testable. A real
  * deployment swaps in a JNI/FFM codec without touching the Spark plan.
  *
  * Scale notes: binary payloads stay columnar (parquet binary) end to end;
  * the decode stage is a narrow transform (no shuffle); per-partition
  * decoder reuse amortizes model/codec init exactly like the reference's
  * per-client lazy singletons (VectorHelper.java:47-54).
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, content: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Long, format: String,
      width: Int, height: Int, n_frames: Int)

  /** Decoder contract: bytes → metadata + (stubbed) features. */
  trait MediaDecoder extends Serializable {
    def decode(id: Long, bytes: Array[Byte]): MediaMeta
  }

  /** Deterministic stand-in for a real codec: dimensions derived from the
    * payload digest, format from a magic-byte sniff. */
  object FakeDecoder extends MediaDecoder {
    def decode(id: Long, bytes: Array[Byte]): MediaMeta = {
      val md = MessageDigest.getInstance("MD5").digest(bytes)
      val fmt = if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte)
        "jpeg" else "raw"
      MediaMeta(id, bytes.length.toLong, fmt,
        width = (md(0) & 0xFF) + 1, height = (md(1) & 0xFF) + 1,
        n_frames = bytes.length % 7 + 1)
    }
  }

  /** The decode stage: typed, partition-wise, decoder constructed once per
    * partition. */
  def decodeStage(ds: Dataset[MediaRecord], decoder: MediaDecoder): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it => it.map(r => decoder.decode(r.doc_id, r.content)) }
  }

  /** Frame sampling: keep every `stride`-th frame index up to n_frames —
    * shape of a video frame-extraction fan-out (one row per sampled frame). */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Int): DataFrame =
    meta.toDF().select(col("doc_id"), col("n_frames"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Wrap a text table into (id, binary payload) — the test harness's stand-in
    * for reading real media files. */
  def binaryFromText(spark: SparkSession, df: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select(col("doc_id"), encode(col("text"), "UTF-8").as("content")).as[MediaRecord]
  }
}
