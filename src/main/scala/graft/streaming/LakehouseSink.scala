package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.LakehouseOpsImpl

/** Streaming copy-on-write MERGE sink — the lakehouse sibling of the MV
  * sink ([[Sinks.mvSink]]): instead of upserting rows one at a time into a
  * keyed store (reference: KeyspacesViewTargetMapper.java applies
  * latest-wins upsert/delete per CDC record against Keyspaces), each
  * micro-batch of CDC envelopes folds into a `bucket=`-partitioned parquet
  * table via [[LakehouseOpsImpl.cowMerge]] — reading and rewriting ONLY
  * the buckets the batch touches.
  *
  * Exactly-once table state from at-least-once delivery: `foreachBatch`
  * replays the in-flight micro-batch after a crash that lands between the
  * merge and the checkpoint commit, and `cowMerge` is IDEMPOTENT — an
  * update wins only when its `stream_sequence_number` beats the table's
  * `last_seq`, so re-merging already-applied envelopes is a no-op
  * (LakehouseSpec pins this). The first micro-batch bootstraps the table
  * (MERGE into an absent base is CREATE). StreamLakehouseSpec proves N
  * streamed micro-batches — with a kill/restart from checkpoint in the
  * middle — produce a table row-equal to the one-shot q179 replay of the
  * same envelope log.
  *
  * At scale each micro-batch costs O(touched buckets), not a table
  * rewrite; the merge join hash-partitions on the key within those
  * buckets. Untouched buckets are never opened.
  */
object LakehouseSink {

  /** Start an AvailableNow drain of `envStream` (CDC envelope schema) into
    * the bucketed table at `basePath`. Restartable from `checkpointDir`. */
  def cowSink(envStream: DataFrame, basePath: String, checkpointDir: String,
      nBuckets: Int): StreamingQuery =
    envStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        LakehouseOpsImpl.cowMerge(batch.sparkSession, basePath, batch, nBuckets)
        ()
      }
      .start()
}
