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

  test("a window that is not a whole number of seconds keeps its full range") {
    // windowMs = 1500: the old INTERVAL ${windowMs/1000} SECONDS predicate
    // truncated to 1 s, silently dropping clicks 1.0–1.5 s before the
    // purchase. A click 1.2 s before must join; 1.6 s before must not.
    val wMs = 1500L
    val purchases = MemoryStream[SjEv](spark)
    val clicks = MemoryStream[SjEv](spark)
    val joined = StreamJoin.purchaseClickJoin(
      purchases.toDF(), clicks.toDF(), wMs, watermark = "1 minute")
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssjoin_subsec").start()
    try {
      clicks.addData(ev(200, 10000 - 1200), ev(201, 10000 - 1600))
      purchases.addData(ev(10, 10000))
      q.processAllAvailable()
      val got = spark.table("ssjoin_subsec")
        .select(col("purchase_id"), col("click_id"))
        .as[(Long, Long)].collect().toSeq.sorted
      assert(got == Seq((10L, 200L)),
        s"click 1.2 s before must join, 1.6 s before must not: $got")
    } finally q.stop()
  }

  test("left-outer emits exactly one null-click row per unmatched purchase") {
    val purchases = MemoryStream[SjEv](spark)
    val clicks = MemoryStream[SjEv](spark)
    val joined = StreamJoin.purchaseClickJoin(
      purchases.toDF(), clicks.toDF(), WindowMs, watermark = "1 minute",
      joinType = "left_outer")
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssjoin_outer").start()
    try {
      // purchase 1 has a click in range; purchase 2 has none
      clicks.addData(ev(100, 0))
      purchases.addData(ev(1, 240000), ev(2, 1200000))
      q.processAllAvailable()
      // advance both watermarks far past purchase 2's horizon so the
      // engine can CLOSE it and emit the outer null row
      clicks.addData(ev(199, 7200000))
      purchases.addData(ev(99, 7200000))
      q.processAllAvailable()
      val got = spark.table("ssjoin_outer")
        .select(col("purchase_id"),
          coalesce(col("click_id"), lit(-1L)).as("click_id"))
        .as[(Long, Long)].collect().toSeq
        .filter(r => r._1 == 1L || r._1 == 2L).sorted
      assert(got == Seq((1L, 100L), (2L, -1L)),
        s"matched purchase joins its click; unmatched emits ONE null row: $got")
    } finally q.stop()
  }
}
