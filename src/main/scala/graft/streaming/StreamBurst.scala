package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.ops.MonitorOpsImpl

/** INCREMENTAL burst-monitor maintenance — the arrival-anomaly sibling of
  * [[StreamHll]]/[[StreamQuantile]]/[[StreamDrift]]: events arriving on a
  * stream fold into the hour-count table through a streaming COUNT
  * aggregate (state = one row per observed hour — calendar-bounded), and
  * the stream-built table is ROW-EQUAL to the batch aggregate at every
  * micro-batch boundary, so the q174 z-score readoff is always live over
  * the snapshot without replaying the event stream. StreamBurstSpec
  * proves the equality mid-stream and that readoff cannot tell the
  * streamed table from the batch one.
  */
object StreamBurst {

  /** The incrementally-maintained (hour, c) table over a (possibly
    * streaming) frame with an events-schema `ts` column. */
  def hours(events: DataFrame): DataFrame =
    MonitorOpsImpl.hourCounts(events)

  /** z-score readoff over a materialized hour table. */
  def bursts(hourTable: DataFrame): DataFrame =
    MonitorOpsImpl.burstsFromHours(hourTable)
}
