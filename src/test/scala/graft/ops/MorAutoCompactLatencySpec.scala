package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.CdcSynth

/** MOR auto-compaction must bound the descriptor WITHOUT putting an
  * O(table) rewrite on the unlucky triggering commit (round-13 "Next
  * round" #2 + advisory #4): the round-13 trigger ran
  * `compactMor(maxFiles = 0)` — a full-table fold — synchronously inside
  * `commitAppend`, so one caller in every ~autoCompactBound absorbed a
  * latency spike that grew with table size. The scoped fold
  * ([[MorTableImpl.compactOverFairShare]]) rewrites only the
  * over-represented buckets (the descriptor collapses to 2 rows on ANY
  * committed fold, via the carried-row consolidation), so the trigger's
  * cost is O(churn since the last fold).
  *
  * Measured contract over 220 single-writer trickle deltas:
  *  - p99 per-commit wall time within 3× of p50 (the TAIL, not the
  *    median — ~14 of the 220 commits are triggers, so p99 IS a
  *    triggering commit and a full-table fold would fail this);
  *  - the descriptor never exceeds autoCompactBound at any commit return
  *    (the bound the trigger exists to enforce);
  *  - final state still equals a one-shot replay (scoping the fold must
  *    not lose rows — tombstones and untouched buckets carry forward).
  */
class MorAutoCompactLatencySpec extends SparkSpec {
  import spark.implicits._

  private val NB = 4 // bound = max(16, 4*4) = 16

  private def batch(i: Long): DataFrame =
    CdcSynth.envelope(Seq((8L * (i + 1), i % 37))
      .toDF("event_id", "user_id")
      .withColumn("event_type", concat(lit("t"), pmod(col("user_id"), lit(3L))))
      .withColumn("value", col("event_id").cast("double") / 4.0)
      .withColumn("ts", timestamp_millis(lit(1700000000000L) + col("event_id")))
      .withColumn("props", concat(lit("{\"k\":"), col("user_id") * 7L, lit("}"))))

  test("220 trickle deltas: p99 within 3x of p50, descriptor bounded at every return, replay-equal") {
    val root = java.nio.file.Files.createTempDirectory("mor_autoc_p99").toString
    val bound = MorTableImpl.autoCompactBound(NB)
    // WARM-UP outside the measured window (the Bench.scala discipline):
    // the first commits pay session/codegen JIT and the first fold pays
    // classloading for the whole compaction path — startup constants, not
    // the table-age behavior under test. The warm-up spans one full
    // trigger cycle so the measured window starts in steady state.
    val W = 30
    val N = 220
    val batches = scala.collection.mutable.ArrayBuffer[DataFrame]()
    (0 until W).foreach { i =>
      val b = batch(1000L + i) // ids disjoint from the measured window
      batches += b
      MorTableImpl.commitAppend(spark, root, b, NB)
    }
    val nanos = new Array[Long](N)
    var triggers = 0
    (0 until N).foreach { i =>
      val b = batch(i.toLong)
      batches += b
      val t0 = System.nanoTime()
      val v = MorTableImpl.commitAppend(spark, root, b, NB)
      nanos(i) = System.nanoTime() - t0
      val cur = VersionedTableImpl.currentVersion(spark, root)
      if (cur > v) triggers += 1 // the fold committed its own version
      val rows = VersionedTableImpl.descriptorDf(spark, root, cur).count()
      assert(rows <= bound,
        s"descriptor $rows rows > bound $bound after commit ${i + 1}")
    }
    assert(triggers >= (N - 20) / (bound + 1),
      s"auto-compaction should have triggered ~N/bound times, saw $triggers")

    val sorted = nanos.sorted
    val p50 = sorted(N / 2) / 1e6
    val p99 = sorted((N * 99) / 100) / 1e6
    info(f"per-commit wall: p50 $p50%.0f ms, p99 $p99%.0f ms over $N commits ($triggers auto-folds)")
    info("slowest: " + nanos.zipWithIndex.sortBy(-_._1).take(8)
      .map { case (n, i) => f"#$i ${n / 1e6}%.0f ms" }.mkString(", "))
    assert(p99 <= 3.0 * p50,
      f"auto-compaction still spikes the triggering commit: p50 $p50%.0f ms, p99 $p99%.0f ms")

    // scoping the fold must not change state: == one-shot replay
    def stateSet(df: DataFrame) =
      df.select(col("user_id"), col("last_seq"), col("value"))
        .as[(Long, String, Double)].collect().toSet
    val replayRoot = java.nio.file.Files.createTempDirectory("mor_autoc_rp").toString
    MorTableImpl.commitAppend(spark, replayRoot,
      batches.reduce(_ unionByName _), NB)
    val cur = VersionedTableImpl.currentVersion(spark, root)
    assert(stateSet(MorTableImpl.readMor(spark, root, cur)) ==
      stateSet(MorTableImpl.readMor(spark, replayRoot, 1)),
      "scoped auto-folds diverged from the one-shot replay")
  }
}
