package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.LrOpsImpl

/** STREAMING quality scoring — the trained classifier (q143) applied at
  * ingest time: documents arriving on a stream are featurized and scored
  * by the SAME column definitions and baked-literal logit the batch apply
  * gate (q144) uses, so there is no train/serve skew by construction and a
  * live score agrees bitwise with a later batch backfill (StreamScoreSpec
  * proves row-for-row equality, mid-stream restart included).
  *
  * This is the deployment shape of every cheap model in a curation stack:
  * train offline (q143), freeze the weights, score the firehose with a
  * STATELESS narrow projection — no state store, no watermark, no shuffle;
  * cost scales with arrival rate only, and kill/restart is exactly-once
  * through the parquet sink's checkpoint. Re-training is a model swap, not
  * a streaming-state migration — same contract as the frozen-codebook
  * incremental index ([[StreamIndex]]).
  */
object StreamScore {

  /** Score an arriving (doc_id, text, lang) frame with frozen weights.
    * Works on batch and streaming frames alike; emits
    * (doc_id, p, keep, is_en) — the q144 schema. */
  def score(docs: DataFrame, weights: Array[Double]): DataFrame = {
    val z = LrOpsImpl.logit(weights)
    LrOpsImpl.featurize(docs)
      .select(col("doc_id"), LrOpsImpl.sig(z).as("p"), (z >= lit(0.0)).as("keep"),
        (col("y") === lit(1.0)).as("is_en"))
  }

  /** Append scored documents to a parquet store, partitioned by the keep
    * decision so downstream training reads only the kept partition.
    * `Trigger.AvailableNow` drains and stops; the checkpoint makes
    * kill/restart resume exactly-once. */
  def scoreSink(scored: DataFrame, outDir: String,
      checkpointDir: String): StreamingQuery =
    scored.writeStream.format("parquet")
      .partitionBy("keep")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
}
