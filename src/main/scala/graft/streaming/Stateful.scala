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
