package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Event row for the stream-stream join fixtures (top-level for Spark
  * encoders). */
final case class SjEv(event_id: Long, ts: Timestamp, value: Double)

/** The stream-stream interval join contract: the continuously-maintained
  * join equals the batch inequality join over the same rows, and state is
  * watermark-bounded — a click arriving after the watermark has passed
  * its matchable horizon is dropped, not joined.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private val WindowMs = 300000L // 5 minutes
  private val t0 = 1700000000000L
  private def ev(id: Long, offMs: Long, v: Double = 1.0): SjEv =
    SjEv(id, new Timestamp(t0 + offMs), v)

  test("streamed interval join equals the batch inequality join; late clicks drop") {
    val purchases = MemoryStream[SjEv](spark)
    val clicks = MemoryStream[SjEv](spark)
    val joined = StreamJoin.purchaseClickJoin(
      purchases.toDF(), clicks.toDF(), WindowMs, watermark = "1 minute")
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssjoin").start()
    try {
      // batch 1: two clicks, then a purchase 4 min after the first click
      clicks.addData(ev(100, 0), ev(101, 120000, 2.0))
      purchases.addData(ev(1, 240000))
      q.processAllAvailable()
      // batch 2: a second purchase; only the click inside ITS window joins
      clicks.addData(ev(102, 400000, 3.0))
      purchases.addData(ev(2, 420000))
      q.processAllAvailable()
      // advance both watermarks far past everything above
      clicks.addData(ev(199, 7200000))
      purchases.addData(ev(99, 7200000))
      q.processAllAvailable()
      // a LATE click that would have matched purchase 1 — beyond the
      // watermark, so the engine is free to drop it (and does: its state
      // window is long gone). It must NOT appear in the result.
      clicks.addData(ev(103, 230000))
      q.processAllAvailable()

      val got = spark.table("ssjoin")
        .select(col("purchase_id"), col("click_id"))
        .as[(Long, Long)].collect().toSeq.sorted

      // batch reference over the NON-LATE rows (the late click is outside
      // the streaming contract by definition)
      val allP = Seq(ev(1, 240000), ev(2, 420000), ev(99, 7200000))
      val allC = Seq(ev(100, 0), ev(101, 120000, 2.0), ev(102, 400000, 3.0),
        ev(199, 7200000))
      val expected = (for {
        p <- allP
        c <- allC
        if c.ts.getTime >= p.ts.getTime - WindowMs && c.ts.getTime < p.ts.getTime
      } yield (p.event_id, c.event_id)).sorted
      assert(got == expected, s"streamed join must equal the batch join: $got vs $expected")
      assert(!got.exists(_._2 == 103L), "late click beyond the watermark must be dropped")
    } finally q.stop()
  }
}
