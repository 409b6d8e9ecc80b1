package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Fixture row (top-level for Spark encoders). */
final case class BurstEvent(event_id: Long, ts: Timestamp)

/** The streaming-burst contract: the incrementally-maintained hour-count
  * table equals the batch aggregate over the events seen so far — at a
  * mid-stream boundary and at the end — and the z-score readoff over the
  * streamed table equals the readoff over the batch table, including a
  * burst hour planted in the second batch.
  */
class StreamBurstSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600000L

  /** ~40±4 events/hour (deterministic jitter so the trailing variance is
    * nonzero — a perfectly flat rate would NULL every z), then a 10x
    * burst hour. */
  private def events(hFrom: Int, hUntil: Int, perHour: Int): Seq[BurstEvent] =
    (hFrom until hUntil).flatMap { h =>
      val n = if (perHour > 100) perHour else perHour + (h * 7 % 9) - 4
      (0 until n).map(i =>
        BurstEvent(h.toLong * 1000 + i, new Timestamp(h * H + i * 1000L)))
    }

  private def batchHours(rows: Seq[BurstEvent]): Seq[(Long, Long)] =
    StreamBurst.hours(rows.toDF())
      .as[(Long, Long)].collect().toSeq.sorted

  test("stream-built hour counts equal batch; burst readoff identical over either") {
    val b1 = events(0, 30, 40)
    val b2 = events(30, 35, 40) ++ events(35, 36, 400) // hour 35 bursts
    val input = MemoryStream[BurstEvent](spark)
    val q = StreamBurst.hours(input.toDF())
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("burst_hours").start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      val mid = spark.table("burst_hours").as[(Long, Long)].collect().toSeq.sorted
      assert(mid == batchHours(b1),
        "mid-stream hour counts must equal the batch aggregate")

      input.addData(b2: _*)
      q.processAllAvailable()
      val end = spark.table("burst_hours").as[(Long, Long)].collect().toSeq.sorted
      assert(end == batchHours(b1 ++ b2), "final hour counts must equal batch")

      def read(df: org.apache.spark.sql.DataFrame) =
        StreamBurst.bursts(df)
          .select(col("hour"), col("n_events"), col("z"), col("is_burst"))
          .as[(Long, Long, Option[Double], Option[Boolean])]
          .collect().toSeq.sortBy(_._1)
      val overStream = read(spark.table("burst_hours"))
      val overBatch = read(StreamBurst.hours((b1 ++ b2).toDF()))
      assert(overStream == overBatch,
        "burst readoff must be identical over streamed and batch tables")
      val burst = overStream.find(_._1 == 35L).get
      assert(burst._4.contains(true), s"the planted 10x hour must flag: $burst")
      assert(overStream.count(_._4.contains(true)) == 1,
        "only the planted hour bursts")
    } finally q.stop()
  }
}
