package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Fixture row (top-level for Spark encoders). */
final case class HllDoc(doc_id: Long, source: String, text: String)

/** The streaming-HLL contract: the incrementally-maintained register
  * table equals the batch sketch over the documents seen so far — at a
  * MID-STREAM boundary, not just at the end — so the cardinality monitor
  * is live without corpus replay. */
class StreamHllSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Range): Seq[HllDoc] = n.map { i =>
    HllDoc(i.toLong, s"src${i % 3}",
      (0 to i % 17).map(j => s"tok${(i * 7 + j * 13) % 500}").mkString(" "))
  }

  private def batchRegisters(rows: Seq[HllDoc]): Seq[(String, Long, Int)] =
    StreamHll.registers(rows.toDF())
      .select(col("source"), col("reg"), col("m_reg"))
      .as[(String, Long, Int)].collect().toSeq.sorted

  test("stream-built registers equal the batch sketch mid-stream and at the end") {
    val b1 = docs(0 until 40)
    val b2 = docs(40 until 90)
    val input = MemoryStream[HllDoc](spark)
    val q = StreamHll.registers(input.toDF())
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("hll_regs").start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      val mid = spark.table("hll_regs")
        .select(col("source"), col("reg"), col("m_reg"))
        .as[(String, Long, Int)].collect().toSeq.sorted
      assert(mid == batchRegisters(b1),
        "mid-stream sketch must equal the batch sketch over batch-1 docs")

      input.addData(b2: _*)
      q.processAllAvailable()
      val end = spark.table("hll_regs")
        .select(col("source"), col("reg"), col("m_reg"))
        .as[(String, Long, Int)].collect().toSeq.sorted
      assert(end == batchRegisters(b1 ++ b2),
        "final sketch must equal the batch sketch over all docs")
      // monotone fold: registers only ever grow
      val midM = mid.map(r => (r._1, r._2) -> r._3).toMap
      end.foreach { case (s, r, m) =>
        assert(midM.get((s, r)).forall(_ <= m), "register values are monotone")
      }
    } finally q.stop()
  }
}
