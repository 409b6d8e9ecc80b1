package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.MorTableImpl
import graft.ops.VersionedTableImpl.currentVersion

/** STREAM-TABLE ENRICHMENT: join each micro-batch against the lakehouse
  * table's current state through the POINT-LOOKUP path, not a table scan —
  * the read side of the reference's keyed-view pattern
  * (KeyspacesViewTargetMapper serves per-key state to consumers; here the
  * consumer is the stream itself). Per batch: collect the batch's key set
  * is NOT needed — the key frame drives [[MorTableImpl.lookupMor]]-style
  * pruning by deriving the touched buckets (metadata-sized collect), zone
  * maps skip the delta files whose bounds miss, and the surviving files
  * join the batch on the key. At 100 TB a 10k-event micro-batch opens
  * O(10k-keys' files), never the table; the state side stays
  * broadcastable because it is lookup-sized.
  *
  * The enrichment is AS OF the batch's processing time (current version
  * when the batch runs) — the same read-committed semantics a service
  * hitting the view table would get. For reproducible AS-OF-event-time
  * enrichment, run the batch q193 PIT join against the versioned history
  * instead; this is the low-latency serving form. */
object Enrich {

  /** Left-join `batch` (CDC envelopes) with the MOR table's current live
    * state on the key; state payload columns arrive prefixed `state_`. */
  def withMorState(batch: DataFrame, root: String, nBuckets: Int): DataFrame = {
    val s = batch.sparkSession
    val keyed = batch.withColumn("__key",
      coalesce(col("image.user_id"), col("oldImage.user_id")))
    val v = currentVersion(s, root)
    if (v == 0) // no table yet: null state columns, same shape
      return keyed.withColumn("state_value", lit(null).cast("double"))
        .withColumn("state_last_seq", lit(null).cast("string"))
        .drop("__key")
    // metadata-sized: the batch's touched buckets (<= nBuckets rows)
    val buckets = keyed.select(
        pmod(col("__key"), lit(nBuckets.toLong)).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq.sorted
    // restrict the state side to the BATCH'S OWN KEYS before broadcasting:
    // bucket pruning alone still reads whole buckets, and a batch whose
    // keys span every bucket would otherwise broadcast the full table —
    // the semi-join keeps the broadcast lookup-sized by construction
    val batchKeys = keyed.select(col("__key")).distinct()
    val state = MorTableImpl.readMorBuckets(s, root, v, buckets)
      .join(broadcast(batchKeys.withColumnRenamed("__key", "user_id")),
        Seq("user_id"), "left_semi")
      .select(col("user_id").as("__key"),
        col("value").as("state_value"), col("last_seq").as("state_last_seq"))
    keyed.join(broadcast(state), Seq("__key"), "left").drop("__key")
  }
}
