package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming semantics (SURVEY.md §2.10): the reference has no
  * windows/watermarks/state — these are the engine capabilities a Spark user
  * gets on the same envelope, plus the MV-as-state formulation the survey
  * calls out (§2.11: `flatMapGroupsWithState` keeping the latest image).
  */
object Stateful {

  /** Event-time tumbling window aggregation with a watermark: counts + sums
    * per (window, operation type). Late data beyond the watermark is
    * dropped; state is bounded by the watermark horizon — safe at 100 TB/day
    * ingest, unlike an unbounded groupBy. */
  def windowedOpCounts(env: DataFrame, watermarkDelay: String = "10 minutes",
      windowLength: String = "1 hour"): DataFrame =
    env
      .withColumn("ats", timestamp_millis(col("metadata.stream_arrival_timestamp")))
      .withWatermark("ats", watermarkDelay)
      .groupBy(window(col("ats"), windowLength),
        col("metadata.stream_operation_type").as("op"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("op"), col("n"))

  /** Event-time SESSION windows — the variable-length window shape the
    * tumbling q12/windowedOpCounts cannot express: a session closes only
    * when the gap since its last event exceeds `gap` (the batch sibling is
    * q13's gaps-and-islands). Spark's native `session_window` keeps one
    * merging window per (user, open session) in the state store, bounded
    * by the watermark horizon — sessions whose close falls behind the
    * watermark emit exactly once and release their state. */
  def sessionCounts(env: DataFrame, gap: String = "30 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame =
    env
      .withColumn("ats", timestamp_millis(col("metadata.stream_arrival_timestamp")))
      .withWatermark("ats", watermarkDelay)
      .groupBy(session_window(col("ats"), gap), col("image.user_id").as("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("user_id"), col("n_events"))

  /** Streaming deduplication: drop records whose sequence number was already
    * seen, with state bounded by the event-time watermark (SURVEY.md §7.4
    * risk 7: never keep unbounded dedup state at 100 TB — the watermark
    * horizon caps it). Exactly the at-least-once → effectively-once bridge
    * for replayed CDC batches. */
  def dedupBySequence(env: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    env
      .withColumn("__seq", col("metadata.stream_sequence_number"))
      .withColumn("ats", timestamp_millis(col("metadata.stream_arrival_timestamp")))
      .withWatermark("ats", watermarkDelay)
      .dropDuplicatesWithinWatermark("__seq")
      .drop("ats", "__seq")

  /** Incremental per-source corpus report — the STREAMING complement of the
    * batch report card (q86): running docs / tokens / mean quality per
    * ingest source, maintained exactly as documents arrive. The quality sum
    * uses the same floor-quantized DECIMAL(38,0) accumulation as the batch
    * operator, so a streaming report and a batch backfill over the same
    * corpus agree bitwise — the invariant that lets the two audit each
    * other.
    *
    * Scale shape: per-row features are narrow; the aggregation state is
    * |sources| rows (bounded by source cardinality, never stream length),
    * incrementally maintained with map-side partials per micro-batch. Use
    * OutputMode.Update (emit changed sources per batch) or Complete (full
    * report snapshot). */
  def runningCorpusReport(docs: DataFrame): DataFrame = {
    val stop = graft.ops.TextOpsImpl.stopwords.map(s => s"'$s'").mkString("(", ", ", ")")
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("n_stop", expr(s"CAST(size(filter(toks, x -> x IN $stop)) AS BIGINT)"))
      .withColumn("quality",
        least(col("n_tok").cast("double") / 50.0, lit(1.0)) * 0.5
          + (lit(1.0) - col("n_stop").cast("double") / col("n_tok")) * 0.5)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        expr("CAST(SUM(CAST(FLOOR(quality * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12")
          .as("qsum"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (col("qsum") / col("n_docs")).as("avg_quality"))
  }

  /** Streaming maintenance of the q132 count-min sketch: the depth×width
    * cell grid as a streaming aggregation over arriving documents. The
    * sketch is additive (cell-wise sums), so the stream state IS the
    * sketch — depth×width rows total, independent of vocabulary or corpus
    * size — and a stream-built grid equals the batch grid over the same
    * documents bitwise (integer counts; StatefulSpec proves it). Estimates
    * (min over a word's depth cells) read the materialized grid at query
    * time, as in the batch panel. */
  def runningCmsCells(docs: DataFrame): DataFrame = {
    val words = docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
    (0 until graft.ops.TextOpsImpl.CmsDepth).map { i =>
      words.select(lit(i).as("r"),
        expr(graft.ops.TextOpsImpl.cmsHash(i, "instr", "word")).cast("long").as("h"))
    }.reduce(_ union _)
      .groupBy(col("r"), col("h")).agg(count(lit(1)).as("total"))
  }

  /** Per-key latest-image state (the MV sink's semantics as a streaming
    * state machine): emits one change row per key per micro-batch when the
    * key's latest image changed; DELETE/TTL clears state. State holds one
    * (seq, image-json) pair per live key — bounded by live-key cardinality. */
  final case class KeyState(seq: String, imageJson: String)
  final case class Change(key: String, op: String, seq: String, imageJson: String)

  def latestImageChanges(env: DataFrame): Dataset[Change] = {
    val spark = env.sparkSession
    import spark.implicits._
    val deletes = Set("DELETE", "REPLICATED_DELETE", "TTL")
    implicit val stateEnc: Encoder[KeyState] = Encoders.product[KeyState]
    env
      .select(
        coalesce(col("image.user_id"), col("oldImage.user_id")).cast("string").as("key"),
        col("metadata.stream_operation_type").as("op"),
        col("metadata.stream_sequence_number").as("seq"),
        to_json(col("image")).as("imageJson"))
      .as[(String, String, String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(applyGroup)
  }

  // (separate method so the state function is unit-testable without a stream)
  def applyGroup(key: String, rows: Iterator[(String, String, String, String)],
      state: GroupState[KeyState]): Iterator[Change] = {
    val deletes = Set("DELETE", "REPLICATED_DELETE", "TTL")
    val sorted = rows.toSeq.sortBy(_._3)
    if (sorted.isEmpty) Iterator.empty
    else {
      val (_, op, seq, imageJson) = sorted.last
      val newer = !state.exists || state.get.seq < seq
      if (!newer) Iterator.empty
      else if (deletes.contains(op)) {
        state.remove()
        Iterator.single(Change(key, "DELETE", seq, null))
      } else {
        state.update(KeyState(seq, imageJson))
        Iterator.single(Change(key, "UPSERT", seq, imageJson))
      }
    }
  }
}
