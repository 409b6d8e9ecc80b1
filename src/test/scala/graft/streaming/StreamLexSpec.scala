package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.{SparkSpec, Tables}

/** The incremental lexical-index contract: a postings store built by
  * streaming documents in over several micro-batches (with a mid-stream
  * restart from checkpoint) must be row-for-row the batch index build, and
  * BM25 search over the two must be bitwise-indistinguishable.
  */
class StreamLexSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("stream-built postings equal the batch build; search is bitwise q112") {
    val docs = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val all = docs.as[(Long, String)].collect().sortBy(_._1).toSeq
    val batches = all.grouped((all.size + 2) / 3).toSeq
    assert(batches.size == 3, "test corpus must split into three micro-batches")

    val storeDir = Files.createTempDirectory("graft_slex").toString
    val ckptDir = Files.createTempDirectory("graft_slex_ckpt").toString

    // batch 1, then STOP — a cold restart must resume from the checkpoint
    val input = MemoryStream[(Long, String)](spark)
    input.addData(batches(0): _*)
    StreamLex.postingsSink(
      StreamLex.docPostings(input.toDF().toDF("doc_id", "text")),
      storeDir, ckptDir).awaitTermination()

    // restart: remaining batches drain through the SAME checkpoint
    input.addData(batches(1): _*)
    input.addData(batches(2): _*)
    StreamLex.postingsSink(
      StreamLex.docPostings(input.toDF().toDF("doc_id", "text")),
      storeDir, ckptDir).awaitTermination()

    // an idle re-run appends nothing (exactly-once, not at-least-once)
    StreamLex.postingsSink(
      StreamLex.docPostings(input.toDF().toDF("doc_id", "text")),
      storeDir, ckptDir).awaitTermination()

    val streamed = spark.read.parquet(storeDir)
    val got = streamed.select(col("doc_id"), col("tok"), col("tf"), col("dl"))
      .as[(Long, String, Long, Long)].collect().toSeq.sorted
    val expected = graft.ops.TextOpsImpl.lexPostings(docs)
      .as[(Long, String, Long, Long)].collect().toSeq.sorted
    assert(got == expected, "stream-built postings must equal the batch index build")

    // search over the stream-built store IS the gated batch computation
    val viaStream = StreamLex.search(streamed)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val viaBatch = graft.ops.TextOpsImpl.bm25TopK(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(viaStream.map { case (q, r, d, s) =>
      (q, r, d, java.lang.Double.doubleToRawLongBits(s))
    } == viaBatch.map { case (q, r, d, s) =>
      (q, r, d, java.lang.Double.doubleToRawLongBits(s))
    }, "BM25 over the stream store must be bitwise the batch result")
  }
}
