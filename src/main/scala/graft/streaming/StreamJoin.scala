package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STREAM-STREAM interval join — the streaming form of the q146 batch
  * range join (purchase ← preceding clicks), with the state problem the
  * batch side doesn't have: both sides are unbounded, so each side must
  * buffer only what the OTHER side's watermark still allows it to match.
  * Spark derives exactly that retention from the two watermarks plus the
  * time-range join condition: a click is dropped from state once the
  * purchase watermark passes `click time + window` — state is bounded by
  * (arrival rate × window + lateness), never by history.
  *
  * Scale shape: the join keys on the equality part of the condition
  * (none here beyond the time range, so Spark hash-partitions on the
  * derived event-time buckets); per-micro-batch work is arrivals × the
  * in-window other-side rows — the same per-window fan-out bound as the
  * batch bucketed join, held continuously. StreamJoinSpec proves the
  * streamed result equals the batch inequality join over the same rows,
  * and that a late click beyond the watermark is dropped.
  */
object StreamJoin {

  /** Clicks within [purchase − windowMs, purchase) joined to each
    * purchase. Both inputs carry (event_id, ts, value); event-time
    * watermarks bound both buffers. Spark REQUIRES an equality predicate
    * on a stream-stream join (it is also what partitions the state
    * store), and the q146 time-bucket cell provides exactly that: clicks
    * key on their own window-sized cell, purchases explode into the two
    * cells their window can overlap, and the exact range predicate
    * filters inside the join — the batch operator's scale trick doubles
    * as the streaming operator's legality requirement. Inner join:
    * purchases with no click in range appear with no rows (the batch
    * gate's left-outer count form needs a downstream grouped aggregate
    * once the window closes). */
  def purchaseClickJoin(purchases: DataFrame, clicks: DataFrame,
      windowMs: Long, watermark: String = "10 minutes"): DataFrame = {
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("ts").as("pts"))
      .withWatermark("pts", watermark)
      .withColumn("bucket", explode(array(
        expr(s"unix_millis(pts) div $windowMs - 1"),
        expr(s"unix_millis(pts) div $windowMs"))))
    val c = clicks
      .select(col("event_id").as("click_id"), col("ts").as("cts"),
        col("value").as("click_value"))
      .withWatermark("cts", watermark)
      .withColumn("bucket", expr(s"unix_millis(cts) div $windowMs"))
    p.as("p").join(c.as("c"),
        col("p.bucket") === col("c.bucket") &&
          col("cts") >= col("pts") - expr(s"INTERVAL ${windowMs / 1000} SECONDS") &&
          col("cts") < col("pts"))
      .select(col("purchase_id"), col("pts"), col("click_id"), col("cts"),
        col("click_value"))
  }
}
