package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.{SparkSpec, Tables}

/** The streaming-scoring contract: documents scored as they arrive (over
  * several micro-batches, with a mid-stream restart from checkpoint) must
  * agree row-for-row and bit-for-bit with the batch apply gate (q144) over
  * the same corpus — the no-train/serve-skew property the frozen-weights
  * design claims.
  */
class StreamScoreSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("stream-scored corpus equals the batch apply gate, restart included") {
    val weights = graft.ops.LrOpsImpl.model(spark, dir).weights
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    val batches = docs.grouped((docs.size + 2) / 3).toSeq
    assert(batches.size == 3)

    val outDir = Files.createTempDirectory("graft_score").toString
    val ckptDir = Files.createTempDirectory("graft_score_ckpt").toString

    // batch 1, then STOP — the restart must resume from the checkpoint
    val input = MemoryStream[(Long, String, String)](spark)
    input.addData(batches(0): _*)
    StreamScore.scoreSink(
      StreamScore.score(input.toDF().toDF("doc_id", "text", "lang"), weights),
      outDir, ckptDir).awaitTermination()

    input.addData(batches(1): _*)
    input.addData(batches(2): _*)
    StreamScore.scoreSink(
      StreamScore.score(input.toDF().toDF("doc_id", "text", "lang"), weights),
      outDir, ckptDir).awaitTermination()

    // an idle re-run appends nothing (exactly-once)
    StreamScore.scoreSink(
      StreamScore.score(input.toDF().toDF("doc_id", "text", "lang"), weights),
      outDir, ckptDir).awaitTermination()

    // `keep` comes back as the partition DIRECTORY value, which partition
    // inference types as string — cast restores the boolean
    val streamed = spark.read.parquet(outDir)
      .select(col("doc_id"), col("p"), col("keep").cast("boolean").as("keep"),
        col("is_en"))
      .as[(Long, Double, Boolean, Boolean)].collect().toSeq.sortBy(_._1)
    val batch = graft.ops.LrOpsImpl.lrApply(spark, dir)
      .as[(Long, Double, Boolean, Boolean)].collect().toSeq.sortBy(_._1)
    assert(streamed == batch,
      "live scores must equal the batch backfill bitwise")
    graft.ops.LrOpsImpl.clearCaches()
  }
}
