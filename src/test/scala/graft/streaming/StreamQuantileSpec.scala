package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.ops.QuantileSketchOpsImpl

/** Fixture row (top-level for Spark encoders). */
final case class QVal(col_name: String, k: Long)

/** The streaming-quantile contract: the incrementally-maintained bin
  * table equals the batch sketch over the values seen so far — at a
  * mid-stream boundary, across a kill/restart from checkpoint, and after
  * an idle re-run — and percentile readoff over the streamed table is
  * indistinguishable from readoff over the batch table.
  */
class StreamQuantileSpec extends SparkSpec {
  import spark.implicits._

  private def vals(n: Range): Seq[QVal] = n.flatMap { i =>
    Seq(QVal("price", (i * 37 % 90000).toLong + 1),
      QVal("qty", (i * 13 % 5000).toLong + 1))
  }

  private def batchBins(rows: Seq[QVal]): Seq[(String, Int, Long)] =
    QuantileSketchOpsImpl.binRows(rows.toDF())
      .select(col("col_name"), col("bin"), col("cnt"))
      .as[(String, Int, Long)].collect().toSeq.sorted

  private def streamedBins(outDir: String): Seq[(String, Int, Long)] =
    spark.read.parquet(outDir)
      .select(col("col_name"), col("bin"), col("cnt"))
      .as[(String, Int, Long)].collect().toSeq.sorted

  test("stream-built bins equal the batch sketch mid-stream, across restart; readoff matches") {
    val b1 = vals(0 until 400)
    val b2 = vals(400 until 900)
    val outDir = Files.createTempDirectory("graft_sq_out").toString
    val ckptDir = Files.createTempDirectory("graft_sq_ckpt").toString

    val input = MemoryStream[QVal](spark)
    input.addData(b1: _*)
    StreamQuantile.binsSink(input.toDF(), outDir, ckptDir).awaitTermination()
    assert(streamedBins(outDir) == batchBins(b1),
      "mid-stream sketch must equal the batch sketch over batch-1 values")

    // kill/restart: a NEW query on the SAME checkpoint resumes the fold
    input.addData(b2: _*)
    StreamQuantile.binsSink(input.toDF(), outDir, ckptDir).awaitTermination()
    val end = streamedBins(outDir)
    assert(end == batchBins(b1 ++ b2),
      "restarted stream must converge to the batch sketch over all values")

    // idle re-run: nothing new to fold, snapshot unchanged
    StreamQuantile.binsSink(input.toDF(), outDir, ckptDir).awaitTermination()
    assert(streamedBins(outDir) == end, "idle re-run must be a no-op")

    // percentile readoff cannot tell which bin table it was handed
    val overStream = QuantileSketchOpsImpl
      .estFromBins(spark, spark.read.parquet(outDir))
      .select(col("col_name"), col("pct"), col("bin"), col("est"))
      .as[(String, Long, Int, Double)].collect().toSeq.sorted
    val overBatch = QuantileSketchOpsImpl
      .estFromBins(spark, QuantileSketchOpsImpl.binRows((b1 ++ b2).toDF()))
      .select(col("col_name"), col("pct"), col("bin"), col("est"))
      .as[(String, Long, Int, Double)].collect().toSeq.sorted
    assert(overStream == overBatch && overStream.nonEmpty,
      "readoff over the streamed sketch must equal readoff over the batch sketch")
  }
}
