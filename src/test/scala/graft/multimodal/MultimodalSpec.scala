package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def payloads = Seq(
    MediaRecord(1L, "hello world".getBytes("UTF-8")),
    MediaRecord(2L, Array(0xFF.toByte, 0xD8.toByte, 0x00, 0x01)), // jpeg magic
    MediaRecord(3L, Array.empty[Byte]))

  test("decode stage runs per-partition and preserves ids/schema") {
    val ds = spark.createDataset(payloads).repartition(2)
    val out = decodeStage(ds, FakeDecoder).collect().sortBy(_.doc_id)
    assert(out.map(_.doc_id).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.n_bytes).toSeq == Seq(11L, 4L, 0L))
    assert(out(1).format == "jpeg" && out(0).format == "raw")
    assert(out.forall(m => m.width >= 1 && m.width <= 256 && m.height >= 1 && m.height <= 256))
  }

  test("decode is deterministic across runs") {
    val ds = spark.createDataset(payloads)
    val a = decodeStage(ds, FakeDecoder).collect().sortBy(_.doc_id).toSeq
    val b = decodeStage(ds.repartition(3), FakeDecoder).collect().sortBy(_.doc_id).toSeq
    assert(a == b)
  }

  test("frame sampling fans out stride-spaced frame indices") {
    val meta = spark.createDataset(Seq(MediaMeta(7L, 10L, "raw", 2, 2, 5)))
    val frames = sampleFrames(meta, stride = 2)
      .select($"frame_idx").as[Long].collect().toSeq.sorted
    assert(frames == Seq(0L, 2L, 4L))
  }

  test("binaryFromText round-trips utf-8 payload bytes") {
    val df = Seq((9L, "abc")).toDF("doc_id", "text")
    val rec = binaryFromText(spark, df).head()
    assert(rec.doc_id == 9L && new String(rec.content, "UTF-8") == "abc")
  }
}
