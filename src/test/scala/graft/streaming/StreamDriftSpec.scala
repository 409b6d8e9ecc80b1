package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.ops.VectorOpsImpl

/** Fixture row (top-level for Spark encoders). */
final case class DriftDoc(source: String, era: String, embedding: Array[Float])

/** The streaming-drift contract: the incrementally-maintained centroid
  * sums equal the batch sums over the rows seen so far — mid-stream and
  * at the end — and the centroid means read off identically from either
  * table.
  */
class StreamDriftSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Range): Seq[DriftDoc] = n.map { i =>
    DriftDoc(s"src${i % 3}", if (i % 2 == 0) "early" else "late",
      Array.tabulate(VectorOpsImpl.Dims)(d =>
        (((i * 31 + d * 7) % 1000) / 1000.0f) - 0.5f))
  }

  private def sums(rows: Seq[DriftDoc]): Seq[Seq[String]] =
    StreamDrift.centroidSums(rows.toDF())
      .collect().map(_.toSeq.map(String.valueOf)).toSeq.sortBy(_.mkString("|"))

  test("stream-built centroid sums equal the batch sums; means read off identically") {
    val b1 = docs(0 until 120)
    val b2 = docs(120 until 300)
    val input = MemoryStream[DriftDoc](spark)
    val q = StreamDrift.centroidSums(input.toDF())
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("drift_sums").start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      val mid = spark.table("drift_sums")
        .collect().map(_.toSeq.map(String.valueOf)).toSeq.sortBy(_.mkString("|"))
      assert(mid == sums(b1),
        "mid-stream sums must equal the batch sums over batch-1 rows")

      input.addData(b2: _*)
      q.processAllAvailable()
      val end = spark.table("drift_sums")
        .collect().map(_.toSeq.map(String.valueOf)).toSeq.sortBy(_.mkString("|"))
      assert(end == sums(b1 ++ b2),
        "final sums must equal the batch sums over all rows")

      // readoff: means from the streamed table == means from the batch table
      val overStream = StreamDrift.meansFromSums(spark.table("drift_sums"))
        .select(col("source"), col("era"), col("n"), col("c1"), col("c2"))
        .as[(String, String, Long, Double, Double)].collect().toSeq.sorted
      val overBatch = StreamDrift.meansFromSums(
          StreamDrift.centroidSums((b1 ++ b2).toDF()))
        .select(col("source"), col("era"), col("n"), col("c1"), col("c2"))
        .as[(String, String, Long, Double, Double)].collect().toSeq.sorted
      assert(overStream == overBatch && overStream.nonEmpty,
        "centroid readoff must be identical over either sum table")
    } finally q.stop()
  }
}
