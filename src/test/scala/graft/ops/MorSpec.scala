package graft.ops

import java.io.File

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.CdcSynth

/** Merge-on-read mechanics the q216/q217 gates (oracle equality of the
  * delta-commit and compacted states) cannot see: a delta commit never
  * opens or rewrites existing files, concurrent delta commits commute,
  * compaction bounds file counts while preserving state AND history, and
  * vacuum (shared with the COW table) reclaims pre-compaction deltas. */
class MorSpec extends SparkSpec {
  import spark.implicits._

  private val NB = 8

  private def env(rows: Seq[(Long, Long)]): DataFrame =
    CdcSynth.envelope(rows.toDF("event_id", "user_id")
      .withColumn("event_type", concat(lit("t"), pmod(col("user_id"), lit(3L))))
      .withColumn("value", col("event_id").cast("double") / 4.0)
      .withColumn("ts", timestamp_millis(lit(1700000000000L) + col("event_id") * 1000L))
      .withColumn("props", concat(lit("{\"k\":"), col("user_id") * 7L, lit("}"))))

  private def users(df: DataFrame): Map[Long, (String, Double)] =
    df.select(col("user_id"), col("last_seq"), col("value"))
      .as[(Long, String, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  private def dataFiles(root: String): Set[String] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val d = new File(s"$root/data")
    if (!d.exists()) Set.empty
    else walk(d).filter(_.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).toSet
  }

  test("delta commits append; read merges; compaction is invisible; vacuum reclaims") {
    val root = java.nio.file.Files.createTempDirectory("mor").toString
    // v1: INSERT users 0..15; v2: update user 1, DELETE user 2
    val v1 = MorTableImpl.commitAppend(spark, root,
      env((0L until 16L).map(u => (8L * u, u))), NB)
    val afterV1 = dataFiles(root)
    val v2 = MorTableImpl.commitAppend(spark, root,
      env(Seq((8L * 100, 1L), (8L * 101 + 2, 2L))), NB)
    assert((v1, v2) == (1, 2))
    assert(afterV1.subsetOf(dataFiles(root)),
      "a MOR delta commit must never delete or rewrite existing files")

    val s2 = users(MorTableImpl.readMor(spark, root, 2))
    assert(!s2.contains(2L), "deleted key visible after read-side merge")
    assert(s2(1L)._1 == "%020d".format(8L * 100), "update must win on read")
    assert(s2.size == 15)
    // time travel: v1 unaffected by v2's deltas
    val s1 = users(MorTableImpl.readMor(spark, root, 1))
    assert(s1.size == 16 && s1.contains(2L) && s1(1L)._1 == "%020d".format(8L))

    // compaction folds to <= 1 file per bucket, preserves state + history
    val v3 = MorTableImpl.compactMor(spark, root, maxFiles = 1, NB)
    assert(v3.contains(3))
    val counts = MorTableImpl.bucketFileCounts(spark, root, 3)
    assert(counts.values.forall(_ <= 1), s"compaction left multi-file buckets: $counts")
    assert(users(MorTableImpl.readMor(spark, root, 3)) == s2,
      "compaction changed the state")
    assert(users(MorTableImpl.readMor(spark, root, 1)) == s1,
      "compaction rewrote history")
    // the tombstone must survive compaction (delete-confluence rows)
    val raw = spark.read.option("mergeSchema", "true")
      .parquet(s"$root/data/bucket=2")
    assert(raw.filter(col("user_id") === 2L &&
        col("last_op").isin(LakehouseOpsImpl.DeleteOps: _*)).count() >= 1,
      "compaction dropped the tombstone row")

    // vacuum keeping only v3 reclaims the superseded delta files
    val removed = VersionedTableImpl.vacuum(spark, root, keepFrom = 3)
    assert(removed.nonEmpty, "vacuum found nothing to reclaim")
    assert(users(MorTableImpl.readMor(spark, root, 3)) == s2,
      "vacuum broke the current version")
  }

  test("a delete-only batch costs O(batch): no base file read or rewritten") {
    val root = java.nio.file.Files.createTempDirectory("mor_del").toString
    MorTableImpl.commitAppend(spark, root,
      env((0L until 64L).map(u => (8L * u, u))), NB)
    val before = dataFiles(root)
    // DELETE one key (m=2 → DELETE op)
    val v2 = MorTableImpl.commitAppend(spark, root,
      env(Seq((8L * 200 + 2, 7L))), NB)
    assert(v2 == 2)
    val added = dataFiles(root) -- before
    assert(before.subsetOf(dataFiles(root)) && added.size == 1,
      s"delete-only commit should add exactly one delta file, added: $added")
    assert(!users(MorTableImpl.readMor(spark, root, 2)).contains(7L))
  }

  test("zone maps skip delta files whose key bounds miss the lookup") {
    val root = java.nio.file.Files.createTempDirectory("mor_zone").toString
    // v1: users 0..15 → bucket b holds keys {b, b+8}; v2: update user 17
    MorTableImpl.commitAppend(spark, root,
      env((0L until 16L).map(u => (8L * u, u))), NB)
    MorTableImpl.commitAppend(spark, root, env(Seq((8L * 50, 17L))), NB)
    // key 1 routes to bucket 1, which now has TWO files; the v2 delta's
    // bounds are [17,17], so the zone map must prune it
    val forKey1 = MorTableImpl.lookupFiles(spark, root, 2, Seq(1L), NB)
    assert(forKey1.size == 1, s"zone map failed to skip the delta: $forKey1")
    // key 17: the v1 file's bounds are [1,9] — zone map prunes IT instead
    val forKey17 = MorTableImpl.lookupFiles(spark, root, 2, Seq(17L), NB)
    assert(forKey17.size == 1 && forKey17 != forKey1,
      s"zone map kept the wrong file: $forKey17")
    // and the pruned reads are still correct
    val r1 = users(MorTableImpl.lookupMor(spark, root, 2, Seq(1L), NB))
    val r17 = users(MorTableImpl.lookupMor(spark, root, 2, Seq(17L), NB))
    assert(r1.keySet == Set(1L) && r1(1L)._1 == "%020d".format(8L))
    assert(r17.keySet == Set(17L) && r17(17L)._1 == "%020d".format(8L * 50))
  }

  test("read-optimized view serves base files only: stale until compaction, then equal") {
    val root = java.nio.file.Files.createTempDirectory("mor_ro").toString
    MorTableImpl.commitAppend(spark, root,
      env((0L until 16L).map(u => (8L * u, u))), NB)
    // compact so v2 has BASE files, then trickle an update as a delta
    MorTableImpl.compactMor(spark, root, maxFiles = 0, NB)
    MorTableImpl.commitAppend(spark, root, env(Seq((8L * 100, 1L))), NB)
    val v = VersionedTableImpl.currentVersion(spark, root)
    val rt = users(MorTableImpl.readMor(spark, root, v))
    val ro = users(MorTableImpl.readMorOptimized(spark, root, v))
    assert(rt(1L)._1 == "%020d".format(8L * 100), "real-time view sees the delta")
    assert(ro(1L)._1 == "%020d".format(8L), "RO view is stale by exactly the deltas")
    assert((rt - 1L) == (ro - 1L), "RO and RT agree off the churned key")
    // after compaction the views converge
    MorTableImpl.compactMor(spark, root, maxFiles = 0, NB)
    val v2 = VersionedTableImpl.currentVersion(spark, root)
    assert(users(MorTableImpl.readMorOptimized(spark, root, v2)) ==
      users(MorTableImpl.readMor(spark, root, v2)))
  }

  test("readers are manifest-scoped: a crash-orphaned data file changes nothing until vacuum") {
    val root = java.nio.file.Files.createTempDirectory("mor_orphan").toString
    MorTableImpl.commitAppend(spark, root,
      env((0L until 16L).map(u => (8L * u, u))), NB)
    val s2 = users(MorTableImpl.readMor(spark, root, 1))
    // simulate a committer that died after moving a delta file but before
    // publishing its manifest: a stray parquet lands in a bucket dir
    val bucketDir = new File(s"$root/data/bucket=1")
    val donor = bucketDir.listFiles().filter(_.getName.endsWith(".parquet")).head
    val orphan = new File(bucketDir, "dDEADBEEF-orphan.parquet")
    java.nio.file.Files.copy(donor.toPath, orphan.toPath)
    assert(users(MorTableImpl.readMor(spark, root, 1)) == s2,
      "an unreferenced file must be invisible to manifest-scoped reads")
    val removed = VersionedTableImpl.vacuum(spark, root, keepFrom = 1)
    assert(removed.exists(_.endsWith("dDEADBEEF-orphan.parquet")),
      s"vacuum must reclaim the orphan: $removed")
    assert(users(MorTableImpl.readMor(spark, root, 1)) == s2)
  }

  test("full-version MOR reads keep the manifest in a scan — no driver-side file list") {
    val root = java.nio.file.Files.createTempDirectory("mor_scan").toString
    MorTableImpl.commitAppend(spark, root,
      env((0L until 16L).map(u => (8L * u, u))), NB)
    MorTableImpl.commitAppend(spark, root, env(Seq((8L * 40, 1L))), NB)
    // between compactions a 100 TB MOR table holds base+delta files in the
    // millions: the full-version read must semi-join the data dir against
    // the manifest (the COW readManifest discipline), never collect the
    // file list to the driver (VersionedSpec pins the COW twin)
    val qe = MorTableImpl.readMor(spark, root, 2).queryExecution
    assert(qe.optimizedPlan.toString.contains("LeftSemi"),
      s"readMor must filter files via a semi-join, not a collected list:\n${qe.optimizedPlan}")
    assert(qe.executedPlan.toString.contains("_versions"),
      s"the manifest must appear as a SCAN in the read plan:\n${qe.executedPlan}")
    // the read-optimized (base-only) view takes the same path
    MorTableImpl.compactMor(spark, root, maxFiles = 1, NB)
    val qeRo = MorTableImpl.readMorOptimized(spark, root, 3).queryExecution
    assert(qeRo.optimizedPlan.toString.contains("LeftSemi") &&
      qeRo.executedPlan.toString.contains("_versions"),
      s"readMorOptimized must keep the manifest a scan:\n${qeRo.executedPlan}")
  }

  test("a delta commit racing a compaction serializes; state and bounds both hold") {
    val root = java.nio.file.Files.createTempDirectory("mor_cmpr").toString
    MorTableImpl.commitAppend(spark, root,
      env((0L until 16L).map(u => (8L * u, u))), NB)
    MorTableImpl.commitAppend(spark, root, env(Seq((8L * 100, 1L))), NB)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val append = pool.submit(new java.util.concurrent.Callable[Int] {
        def call(): Int = MorTableImpl.commitAppend(spark, root,
          env(Seq((8L * 200, 30L))), NB)
      })
      val compact = pool.submit(new java.util.concurrent.Callable[Option[Int]] {
        def call(): Option[Int] =
          MorTableImpl.compactMor(spark, root, maxFiles = 1, NB)
      })
      val (av, cv) = (append.get(), compact.get())
      // the append ALWAYS lands (bounded retries re-base its manifest);
      // compaction either claimed its version or ceded to the racer and
      // will run at the next cadence — never an error, never lost data
      assert(av >= 3, s"the delta commit must land: $av (compact: $cv)")
    } finally pool.shutdown()
    val cur = VersionedTableImpl.currentVersion(spark, root)
    val s = users(MorTableImpl.readMor(spark, root, cur))
    assert(s.contains(30L) && s(1L)._1 == "%020d".format(8L * 100),
      s"all writes must survive the race: $s")
  }

  test("concurrent delta commits commute: both batches land, no retry rewrite") {
    val root = java.nio.file.Files.createTempDirectory("mor_race").toString
    MorTableImpl.commitAppend(spark, root,
      env((0L until 8L).map(u => (8L * u, u))), NB)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val futures = Seq(
        Seq((8L * 300, 1L), (8L * 301, 20L)),
        Seq((8L * 400, 2L), (8L * 401, 21L))).map { batch =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = MorTableImpl.commitAppend(spark, root, env(batch), NB)
        })
      }
      val versions = futures.map(_.get()).sorted
      assert(versions == Seq(2, 3), s"both racers must land: $versions")
    } finally pool.shutdown()
    val s = users(MorTableImpl.readMor(spark, root, 3))
    assert(s.contains(20L) && s.contains(21L) &&
      s(1L)._1 == "%020d".format(8L * 300) && s(2L)._1 == "%020d".format(8L * 400),
      s"state must hold both racers' writes: $s")
    // commuting deltas: no orphaned data files (losers re-base the
    // manifest only; every moved file is referenced by v3)
    val referenced = VersionedTableImpl.manifest(spark, root, 3)
      .select("file").as[String].collect()
      .map(f => new org.apache.hadoop.fs.Path(f).toUri.getPath).toSet
    assert(dataFiles(root) == referenced,
      "a commuting delta race must strand no files")
  }
}
