package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Event-rate BURST detection (q174) — the ingest-anomaly monitor a
  * pipeline runs over its arrival stream: per hour, the event count's
  * z-score against the trailing 24 observed hours; |z| ≥ [[BurstZ]] flags
  * a burst (scraper loop, replayed shard, upstream outage's catch-up
  * flood) before it poisons freshness-weighted mixtures. Hours with fewer
  * than [[BurstMinPrev]] trailing observations emit NULL stats (cold
  * start) rather than a spurious flag.
  *
  * Determinism: the windowed inputs are exact integer sums (count,
  * count², both map-side combined); mean/variance/z derive from them with
  * the identical double expression in both engines, and sqrt is
  * IEEE-correctly-rounded everywhere (the q43 discipline) — no libm, no
  * sampling. A variance of zero yields NULL z (guarded division — ANSI
  * Spark would throw where DuckDB yields inf).
  *
  * Scale shape: the corpus collapses to the per-hour aggregate FIRST (one
  * map-side-combined shuffle, ≤ a few thousand rows per year); the
  * trailing-RANGE window runs over that metadata-sized series, never the
  * event stream. The unpartitioned window is deliberate and bounded — the
  * same histogram-window rationale as the q127 layout health panel.
  */
object MonitorOpsImpl {

  val BurstZ = 3.0
  val BurstMinPrev = 12

  /** The per-hour arrival counts — on a STREAMING frame this is the
    * incrementally-maintained form: COUNT folds per arriving event into
    * the hour-keyed state (calendar-bounded — one row per observed hour),
    * and the stream-built table row-equals this batch aggregate at every
    * micro-batch boundary ([[graft.streaming.StreamBurst]]). */
  private[graft] def hourCounts(events: DataFrame): DataFrame =
    events.select(expr("unix_millis(ts) div 3600000").as("hour"))
      .groupBy(col("hour")).agg(count(lit(1)).as("c"))

  /** z-score readoff over an hour-count table (stream-built or batch —
    * StreamBurstSpec asserts the caller can't tell). */
  private[graft] def burstsFromHours(hours: DataFrame): DataFrame = {
    val w = Window.orderBy(col("hour")).rangeBetween(-24L, -1L)
    hours
      .withColumn("n_prev", count(col("c")).over(w))
      .withColumn("sum_prev", sum(col("c")).over(w))
      .withColumn("sumsq_prev", sum(col("c") * col("c")).over(w))
      .withColumn("mean_prev", expr(
        s"CASE WHEN n_prev >= $BurstMinPrev THEN CAST(sum_prev AS DOUBLE) / CAST(n_prev AS DOUBLE) END"))
      .withColumn("var_prev", expr(
        s"CASE WHEN n_prev >= $BurstMinPrev THEN " +
          "CAST(sumsq_prev AS DOUBLE) / CAST(n_prev AS DOUBLE) - mean_prev * mean_prev END"))
      .withColumn("z", expr(
        "CASE WHEN var_prev > 0.0 THEN (CAST(c AS DOUBLE) - mean_prev) / sqrt(var_prev) END"))
      .withColumn("is_burst", expr(s"CASE WHEN z IS NOT NULL THEN abs(z) >= $BurstZ END"))
      .select(col("hour"), col("c").as("n_events"), col("n_prev"),
        col("mean_prev"), col("z"), col("is_burst"))
      .orderBy(col("hour"))
  }

  def eventBursts(s: SparkSession, dir: String): DataFrame =
    burstsFromHours(hourCounts(Tables(s, dir, "events")))

  private lazy val q174Sql: String =
    s"""WITH h AS (
       |  SELECT epoch_ms(CAST(ts AS TIMESTAMP)) // 3600000 AS hour,
       |    CAST(COUNT(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1),
       |wf AS (
       |  SELECT hour, c,
       |    CAST(COUNT(c) OVER tw AS BIGINT) AS n_prev,
       |    CAST(SUM(c) OVER tw AS BIGINT) AS sum_prev,
       |    CAST(SUM(c * c) OVER tw AS BIGINT) AS sumsq_prev
       |  FROM h
       |  WINDOW tw AS (ORDER BY hour RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
       |st AS (
       |  SELECT hour, c, n_prev,
       |    CASE WHEN n_prev >= $BurstMinPrev
       |      THEN CAST(sum_prev AS DOUBLE) / CAST(n_prev AS DOUBLE) END AS mean_prev,
       |    CASE WHEN n_prev >= $BurstMinPrev
       |      THEN CAST(sumsq_prev AS DOUBLE) / CAST(n_prev AS DOUBLE)
       |        - (CAST(sum_prev AS DOUBLE) / CAST(n_prev AS DOUBLE))
       |          * (CAST(sum_prev AS DOUBLE) / CAST(n_prev AS DOUBLE)) END AS var_prev
       |  FROM wf),
       |z AS (
       |  SELECT hour, c, n_prev, mean_prev,
       |    CASE WHEN var_prev > 0.0
       |      THEN (CAST(c AS DOUBLE) - mean_prev) / sqrt(var_prev) END AS z
       |  FROM st)
       |SELECT hour, c AS n_events, n_prev, mean_prev, z,
       |  CASE WHEN z IS NOT NULL THEN abs(z) >= $BurstZ END AS is_burst
       |FROM z ORDER BY hour""".stripMargin

  lazy val queries: Seq[Q] = Seq(
    Q("q174_events_bursts", eventBursts, Some(q174Sql), headline = true))
}

object MonitorOps {
  lazy val queries: Seq[Q] = MonitorOpsImpl.queries
}
