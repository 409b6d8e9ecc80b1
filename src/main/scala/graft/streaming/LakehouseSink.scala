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

  /** VERSIONED form: each micro-batch commits as a new table version
    * ([[graft.ops.VersionedTableImpl.commitMerge]]), so the stream leaves
    * a time-travelable history and a per-batch change feed behind instead
    * of only the final state. Version history is made exactly-once with a
    * per-batch marker: the seq-gated merge already makes REPLAYED rows a
    * state no-op, but without the marker a replay would still append a
    * redundant (state-identical) version; the marker is written after the
    * commit, so a crash between the two re-commits once — state stays
    * correct, and at most one no-op version can ever exist per crash.
    *
    * MAINTENANCE rides the same hook: every merge appends one file per
    * touched bucket to the LIVE file set (history keeps the old ones), so
    * a hot bucket's read cost grows one parquet footer per epoch — the
    * streaming small-files curve. With `compactOver = Some(t)`, each
    * commit is followed by [[graft.ops.VersionedTableImpl.compactVersion]]
    * which, when any bucket's live file count exceeds t, rewrites just
    * those buckets as a NEW state-identical version (stage-then-swap, the
    * claim protocol, old versions untouched). The check is pure metadata;
    * a replayed batch re-runs it harmlessly (counts already below the
    * threshold ⇒ no-op), so compaction is exactly-once-in-effect across
    * restarts without its own marker. */
  /** With `emitFeed = true` (default) each merge commit also materializes
    * its CHANGE DATA FILES under `root/_feed/v{N}.parquet`
    * ([[graft.ops.VersionedTableImpl.emitFeed]]): downstream consumers
    * stream the table's own history with a plain parquet `readStream` on
    * that dir — the lakehouse doubles as a CDC source. The feed diff reads
    * only the touched buckets, so emission costs O(touched) like the merge
    * itself; the per-version overwrite is idempotent under crash-replay;
    * compaction versions are state-identical and emit nothing. */
  def versionedSink(envStream: DataFrame, root: String, checkpointDir: String,
      nBuckets: Int, compactOver: Option[Int] = None,
      emitFeed: Boolean = true): StreamingQuery =
    envStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        import org.apache.spark.sql.functions._
        val s = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        val marker = new org.apache.hadoop.fs.Path(root, s"_commits/batch-$id")
        if (!fs.exists(marker)) {
          val before = graft.ops.VersionedTableImpl.currentVersion(s, root)
          val v = graft.ops.VersionedTableImpl.commitMerge(s, root, batch, nBuckets)
          if (emitFeed && v > before) {
            val touched = batch
              .select(pmod(coalesce(col("image.user_id"), col("oldImage.user_id")),
                lit(nBuckets.toLong)).as("bucket"))
              .distinct().collect().map(_.getLong(0)).toSeq // <= nBuckets rows
            graft.ops.VersionedTableImpl.emitFeed(s, root, v, touched)
          }
          fs.mkdirs(marker.getParent)
          fs.create(marker).close()
        }
        compactOver.foreach(t =>
          graft.ops.VersionedTableImpl.compactVersion(s, root, t, nBuckets))
        ()
      }
      .start()

  /** MERGE-ON-READ form: each micro-batch commits as DELTA files
    * ([[graft.ops.MorTableImpl.commitAppend]]) — no base read, no bucket
    * rewrite, commit cost O(batch). This is the shape a high-throughput
    * CDC stream wants: the COW sinks above pay a touched-bucket rewrite
    * per epoch (hot buckets are rewritten every epoch), the MOR sink
    * defers that cost to readers and to the maintenance hook, which folds
    * any bucket whose file count crossed `compactOver` into one base file
    * (a state-identical new version through the claim protocol).
    *
    * Exactly-once: state is append-idempotent (a replayed batch's rows
    * carry the same seqs, so the read-side latest-per-key fold is
    * unchanged), and the same per-batch marker as [[versionedSink]] keeps
    * the HISTORY exactly-once — a replay appends neither rows nor a
    * version. The compaction check is pure metadata and no-ops when
    * nothing is over threshold, so it needs no marker of its own. */
  def morSink(envStream: DataFrame, root: String, checkpointDir: String,
      nBuckets: Int, compactOver: Option[Int] = None): StreamingQuery =
    envStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        val marker = new org.apache.hadoop.fs.Path(root, s"_commits/batch-$id")
        if (!fs.exists(marker)) {
          graft.ops.MorTableImpl.commitAppend(s, root, batch, nBuckets)
          fs.mkdirs(marker.getParent)
          fs.create(marker).close()
        }
        compactOver.foreach(t =>
          graft.ops.MorTableImpl.compactMor(s, root, t, nBuckets))
        ()
      }
      .start()
}
