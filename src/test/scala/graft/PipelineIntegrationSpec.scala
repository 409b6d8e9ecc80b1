package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.cdc.CdcSynth
import graft.ops.{LakehouseOpsImpl, VersionedTableImpl}
import graft.streaming.{LakehouseSink, Quarantine}

/** THE NIGHTLY PIPELINE, end to end — the composition a reference user
  * would actually run, in one test: CDC envelopes stream through
  * quarantine into a versioned lakehouse table (exactly-once across a
  * restart), maintenance (compaction + TTL + vacuum) runs against it,
  * derived structures (secondary index, aggregate view) stay equal to
  * recompute through the change feed alone, expectations gate a bad
  * commit, and the final state exports as a standalone snapshot. Every
  * piece is gated elsewhere; THIS pins that they compose. */
class PipelineIntegrationSpec extends SparkSpec {
  import spark.implicits._

  private val NB = 8

  private def events(ids: Seq[Int]) = ids.map { i =>
    graft.streaming.LkEvent(i.toLong, (i % 23).toLong, s"t${i % 3}", i / 4.0,
      new Timestamp(1700000000000L + i * 60000L), s"""{"k":${(i % 23) * 7}}""")
  }

  private def state(df: DataFrame): Map[Long, (String, Double)] =
    df.select(col("user_id"), col("last_seq"), col("value"))
      .as[(Long, String, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("ingest -> quarantine -> versioned commits -> feed-maintained views -> maintenance -> export") {
    val tmp = Files.createTempDirectory("graft_night").toString
    val (root, dlq, ckpt) = (s"$tmp/table", s"$tmp/dlq", s"$tmp/ckpt")
    val all = events(0 until 230)

    // ---- ingest: quarantine wraps the versioned sink; UNKNOWN-op
    // envelopes (id % 8 == 7, no classified operation) go to dead letters
    val rules = Seq("known_op" ->
      (col("metadata.stream_operation_type") =!= "UNKNOWN"))
    def drain(input: MemoryStream[graft.streaming.LkEvent]): Unit =
      CdcSynth.envelope(input.toDF()).writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch(Quarantine.sink(dlq, rules) { (batch, id) =>
          val fs = new org.apache.hadoop.fs.Path(root)
            .getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
          val marker = new org.apache.hadoop.fs.Path(root, s"_commits/batch-$id")
          if (!fs.exists(marker)) {
            VersionedTableImpl.commitMerge(batch.sparkSession, root, batch, NB)
            fs.mkdirs(marker.getParent); fs.create(marker).close()
          }
        })
        .start().awaitTermination()

    val input = MemoryStream[graft.streaming.LkEvent](spark)
    input.addData(all.slice(0, 120): _*)
    drain(input) // kill here: next drain restarts from the checkpoint
    val v1 = VersionedTableImpl.currentVersion(spark, root)
    input.addData(all.slice(120, 230): _*)
    drain(input)
    val v2 = VersionedTableImpl.currentVersion(spark, root)
    assert(v1 >= 1 && v2 > v1)

    // ground truth: replay of the non-quarantined log
    val cleanIds = (0 until 230).filterNot(_ % 8 == 7)
    val truth = state(LakehouseOpsImpl.mergeLatest(
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        LakehouseOpsImpl.tableSchema),
      LakehouseOpsImpl.latestUpdates(CdcSynth.envelope(events(cleanIds).toDF()),
        coalesce(col("image.user_id"), col("oldImage.user_id")),
        col("metadata.stream_sequence_number"))))
    assert(state(VersionedTableImpl.readVersion(spark, root, v2)) == truth,
      "streamed+quarantined table must equal the clean-log replay")
    assert(spark.read.parquet(dlq).count() == (0 until 230).count(_ % 8 == 7),
      "every UNKNOWN envelope must be dead-lettered, nothing else")

    // ---- feed-maintained views: index + aggregate, v1 -> v2 deltas only
    val feed = VersionedTableImpl.changeFeed(spark, root, v1, v2)
    val idx1 = VersionedTableImpl.readVersion(spark, root, v1)
      .select(col("event_type"), col("user_id"))
    val maintained = idx1
      .join(feed.filter(col("change_op").isin("DELETE", "UPDATE"))
          .select(col("event_type_before").as("event_type"), col("user_id")),
        Seq("event_type", "user_id"), "left_anti")
      .unionByName(feed.filter(col("change_op").isin("INSERT", "UPDATE"))
        .select(col("event_type_after").as("event_type"), col("user_id")))
    val recomputed = VersionedTableImpl.readVersion(spark, root, v2)
      .select(col("event_type"), col("user_id"))
    assert(maintained.as[(String, Long)].collect().sorted.toSeq ==
      recomputed.as[(String, Long)].collect().sorted.toSeq,
      "feed-maintained index must equal the recompute")

    // ---- expectations gate: a poisoned batch (negative values) rejects
    // and leaves no version behind
    val poison = CdcSynth.envelope(events(Seq(1000, 1008)).toDF())
      .withColumn("image", col("image").withField("value", lit(-1.0)))
    val verdict = VersionedTableImpl.commitMergeExpecting(spark, root, poison,
      NB, Seq(VersionedTableImpl.Expectation("value_non_negative",
        col("value") >= 0.0)))
    assert(verdict.isLeft, s"poisoned commit must reject: $verdict")
    assert(VersionedTableImpl.currentVersion(spark, root) == v2)

    // ---- maintenance: TTL sweep + compaction + vacuum, state still right
    val mx = all.map(_.event_id).max
    val cutoff = "%020d".format(mx - 40)
    val v3 = VersionedTableImpl.ttlExpire(spark, root, cutoff, NB)
    assert(v3 == v2 + 1)
    val fresh = truth.filter { case (_, (seq, _)) => seq >= cutoff }
    assert(state(VersionedTableImpl.readVersion(spark, root, v3)) == fresh,
      "TTL sweep must keep exactly the fresh keys")
    VersionedTableImpl.compactVersion(spark, root, maxFiles = 1, NB)
    val vEnd = VersionedTableImpl.currentVersion(spark, root)
    VersionedTableImpl.vacuum(spark, root, keepFrom = vEnd)
    assert(state(VersionedTableImpl.readVersion(spark, root, vEnd)) == fresh,
      "compaction + vacuum must preserve the state")

    // ---- export: the snapshot a training run reads
    VersionedTableImpl.exportVersion(spark, root, vEnd, s"$tmp/snap", NB)
    assert(state(LakehouseOpsImpl.readTable(spark, s"$tmp/snap")
        .drop("bucket")) == fresh,
      "the exported snapshot must equal the live state")

    // ---- tag the published snapshot version: the training run's name
    // for it — readable forever (vacuum-pinned), independent of HEAD
    VersionedTableImpl.tag(spark, root, "train_run_1", vEnd)
    assert(state(VersionedTableImpl.readTag(spark, root, "train_run_1")) == fresh)

    // ---- next night's drain STAGES on a branch, is audited as a whole,
    // and publishes atomically; the tag still resolves the old snapshot
    VersionedTableImpl.createBranch(spark, root, "night2")
    VersionedTableImpl.commitMergeToBranch(spark, root, "night2",
      CdcSynth.envelope(events(240 until 280).toDF()), NB)
    assert(VersionedTableImpl.currentVersion(spark, root) == vEnd,
      "staged night-2 commits are invisible to main")
    val preview = VersionedTableImpl.branchDiff(spark, root, "night2")
    assert(preview.count() > 0, "the review surface classifies the staged batch")
    val pub = VersionedTableImpl.publishBranch(spark, root, "night2",
      Seq(VersionedTableImpl.Expectation("value_non_negative", col("value") >= 0.0)))
    assert(pub == Right(vEnd + 1), s"audited publish lands one version: $pub")
    assert(state(VersionedTableImpl.readTag(spark, root, "train_run_1")) == fresh,
      "the tagged snapshot is immutable under later publishes")

    // ---- the OPTIMIZE cadence closes the night: feeds repaired,
    // compaction + analyze + retention vacuum, state invariant
    val after = state(VersionedTableImpl.readVersion(spark, root, vEnd + 1))
    VersionedTableImpl.optimizeTable(spark, root, NB,
      maxFiles = 1, keepVersions = 2)
    val cur = VersionedTableImpl.currentVersion(spark, root)
    assert(state(VersionedTableImpl.readVersion(spark, root, cur)) == after,
      "optimize is invisible to readers")
    assert(state(VersionedTableImpl.readTag(spark, root, "train_run_1")) == fresh,
      "retention vacuum must not reclaim the tagged snapshot")
  }
}
