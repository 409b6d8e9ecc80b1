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
    * store), and the q146 time-bucket cell provides exactly that: each
    * purchase keys on ITS OWN window-sized cell, clicks explode into the
    * two cells their match horizon can reach, and the exact range
    * predicate filters inside the join — the batch operator's scale trick
    * doubles as the streaming operator's legality requirement.
    *
    * The CLICK side carries the explosion (not the purchase side) so a
    * purchase row exists exactly once in the join input — which is what
    * makes `left_outer` well-defined: a purchase with no click in range
    * emits ONE null-click row once both watermarks pass its horizon
    * (`joinType = "left_outer"`), instead of one phantom row per bucket
    * copy. A click's two bucket copies have distinct cells, so a matched
    * pair is still produced exactly once under either join type. */
  def purchaseClickJoin(purchases: DataFrame, clicks: DataFrame,
      windowMs: Long, watermark: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("ts").as("pts"))
      .withWatermark("pts", watermark)
      .withColumn("bucket", expr(s"unix_millis(pts) div $windowMs"))
    val c = clicks
      .select(col("event_id").as("click_id"), col("ts").as("cts"),
        col("value").as("click_value"))
      .withWatermark("cts", watermark)
      .withColumn("bucket", explode(array(
        expr(s"unix_millis(cts) div $windowMs"),
        expr(s"unix_millis(cts) div $windowMs + 1"))))
    // MILLISECOND interval, not windowMs/1000 SECONDS: integer division
    // truncates any non-multiple-of-1000 window (and windowMs<1000 would
    // degenerate to an empty predicate), silently narrowing the range vs
    // the bucket math. Kept as a plain timestamp-vs-interval comparison so
    // Spark's watermark analysis still derives state retention from it.
    p.as("p").join(c.as("c"),
        col("p.bucket") === col("c.bucket") &&
          col("cts") >= col("pts") - expr(s"INTERVAL $windowMs MILLISECOND") &&
          col("cts") < col("pts"),
        joinType)
      .select(col("purchase_id"), col("pts"), col("click_id"), col("cts"),
        col("click_value"))
  }
}
