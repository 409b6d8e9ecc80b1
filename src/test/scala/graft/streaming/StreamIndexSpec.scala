package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.{SparkSpec, Tables}

/** The incremental-index contract: an index built by streaming vectors in
  * over several micro-batches (with a mid-stream restart from checkpoint)
  * must be row-for-row the batch rebuild, and searches over the two must be
  * indistinguishable.
  */
class StreamIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("stream-built index equals the batch build, survives restart, and searches identically") {
    val cents = graft.ops.VectorOpsImpl.learnedCenters(spark, dir)
    val vecs = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val all = vecs.as[(Long, Array[Float])].collect().sortBy(_._1).toSeq
    val batches = all.grouped((all.size + 2) / 3).toSeq
    assert(batches.size == 3, "test corpus must split into three micro-batches")

    val indexDir = Files.createTempDirectory("graft_sidx").toString
    val ckptDir = Files.createTempDirectory("graft_sidx_ckpt").toString

    // batch 1, then STOP — a cold restart must resume from the checkpoint
    val input = MemoryStream[(Long, Array[Float])](spark)
    input.addData(batches(0): _*)
    val q1 = StreamIndex.indexSink(
      StreamIndex.assign(input.toDF().toDF("vec_id", "embedding"), cents),
      indexDir, ckptDir)
    q1.awaitTermination()

    // restart: remaining batches drain through the SAME checkpoint
    input.addData(batches(1): _*)
    input.addData(batches(2): _*)
    val q2 = StreamIndex.indexSink(
      StreamIndex.assign(input.toDF().toDF("vec_id", "embedding"), cents),
      indexDir, ckptDir)
    q2.awaitTermination()

    // an idle re-run appends nothing (exactly-once, not at-least-once)
    val q3 = StreamIndex.indexSink(
      StreamIndex.assign(input.toDF().toDF("vec_id", "embedding"), cents),
      indexDir, ckptDir)
    q3.awaitTermination()

    val streamed = spark.read.parquet(indexDir)
    val got = streamed.select(col("vec_id"), col("assigned"))
      .as[(Long, Long)].collect().toSeq.sorted
    // reference = the BATCH build with the fully-unrolled codegen'd argmin:
    // equality here is what licenses the compact HOF form's bitwise claim
    val batch = graft.ops.VectorOpsImpl.assignCenters(vecs, cents)
    val expected = batch.select(col("vec_id"), col("assigned"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == expected,
      "incrementally-built index must be row-for-row the batch rebuild")

    // the search side cannot tell which index it was handed. Both indexes
    // are probed as MATERIALIZED stores (the probe contract): joining on
    // the live argmin alias instead would re-expand the full k × Dims
    // expression at every key reference (null filter, hash key) and blow
    // the generated stage into megabytes
    val batchDir = Files.createTempDirectory("graft_bidx").toString
    batch.write.mode("overwrite").parquet(batchDir)
    val batchIdx = spark.read.parquet(batchDir)
    val queries = batchIdx.filter(col("vec_id") < 8)
    val overStream = StreamIndex.probeTopK(streamed, queries, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val overBatch = StreamIndex.probeTopK(batchIdx, queries, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(overStream == overBatch,
      "probe over the streamed index must equal the probe over the batch index")
    assert(overStream.nonEmpty, "probe must return results")
  }
}
