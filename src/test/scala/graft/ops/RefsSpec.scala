package graft.ops

import java.io.File

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.CdcSynth

/** Named refs (tags, branches, fast-forward) and the tombstone GC horizon —
  * the mechanics the q230/q231 oracle gates (state equality) cannot see:
  * ref isolation, vacuum protection, conflict rejection, and the physical
  * tombstone purge with its horizon contract.
  */
class RefsSpec extends SparkSpec {
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

  private def rawRows(root: String): DataFrame =
    VersionedTableImpl.readBuckets(spark, root,
      VersionedTableImpl.currentVersion(spark, root),
      0L until NB.toLong, LakehouseOpsImpl.tableSchema)

  test("tags pin versions: vacuum keeps a tagged version readable; dropTag releases it") {
    val root = java.nio.file.Files.createTempDirectory("refs_tag").toString
    // v1: 12 inserts; v2: updates that rewrite every touched bucket
    VersionedTableImpl.commitMerge(spark, root,
      env((0L until 12L).map(u => (8L * u, u))), NB)
    val v1State = users(VersionedTableImpl.readVersion(spark, root, 1))
    VersionedTableImpl.commitMerge(spark, root,
      env((0L until 12L).map(u => (8L * (u + 100) + 1, u))), NB)

    VersionedTableImpl.tag(spark, root, "train_run_7", 1)
    assert(VersionedTableImpl.listTags(spark, root) == Seq("train_run_7" -> 1))
    intercept[IllegalStateException] {
      VersionedTableImpl.tag(spark, root, "train_run_7", 2) // immutable name
    }

    // vacuum to keepFrom = 2 would normally reclaim v1's files — the tag
    // pins them, and the tagged read still equals the old state
    val swept = VersionedTableImpl.vacuum(spark, root, keepFrom = 2)
    assert(swept.isEmpty, s"tagged v1 files must survive vacuum: $swept")
    assert(users(VersionedTableImpl.readTag(spark, root, "train_run_7")) == v1State,
      "the tag resolves the pinned state bit-for-bit")

    // dropping the ref is the release: vacuum now reclaims v1-only files
    VersionedTableImpl.dropTag(spark, root, "train_run_7")
    val swept2 = VersionedTableImpl.vacuum(spark, root, keepFrom = 2)
    assert(swept2.nonEmpty && swept2.forall(_.contains("/v1-")),
      s"untagged v1 files are reclaimable: $swept2")
  }

  test("branch commits are invisible to main until fast-forward; conflict rejects") {
    val root = java.nio.file.Files.createTempDirectory("refs_br").toString
    VersionedTableImpl.commitMerge(spark, root,
      env((0L until 10L).map(u => (8L * u, u))), NB)
    val mainV1 = users(VersionedTableImpl.readVersion(spark, root, 1))

    assert(VersionedTableImpl.createBranch(spark, root, "stage") == 1)
    intercept[IllegalStateException] {
      VersionedTableImpl.createBranch(spark, root, "stage") // name taken
    }

    // two staged commits: update users 0..4, then delete user 1
    VersionedTableImpl.commitMergeToBranch(spark, root, "stage",
      env((0L until 5L).map(u => (8L * (u + 50) + 1, u))), NB)
    VersionedTableImpl.commitMergeToBranch(spark, root, "stage",
      env(Seq((8L * 80 + 2, 1L))), NB)
    assert(VersionedTableImpl.branchHead(spark, root, "stage") == 2)

    // isolation both ways: main unmoved, branch carries the staged state
    assert(VersionedTableImpl.currentVersion(spark, root) == 1)
    assert(users(VersionedTableImpl.readVersion(spark, root, 1)) == mainV1)
    val staged = users(VersionedTableImpl.readBranch(spark, root, "stage"))
    assert(!staged.contains(1L) && staged(0L)._1 == "%020d".format(8L * 50 + 1),
      s"branch head shows the staged updates and the delete: $staged")
    assert(staged.keySet == mainV1.keySet - 1L,
      s"carried-forward buckets survive branch commits (fork manifest is " +
        s"real, not empty): ${staged.keySet} vs ${mainV1.keySet}")

    // fast-forward publishes the branch head as main v2, atomically
    assert(VersionedTableImpl.fastForward(spark, root, "stage") == Right(2))
    assert(users(VersionedTableImpl.readVersion(spark, root, 2)) == staged,
      "main head after fast-forward IS the audited branch state")
    assert(users(VersionedTableImpl.readVersion(spark, root, 1)) == mainV1,
      "history below the fast-forward is untouched")

    // a branch whose fork main has moved past cannot fast-forward
    assert(VersionedTableImpl.createBranch(spark, root, "late") == 2)
    VersionedTableImpl.commitMergeToBranch(spark, root, "late",
      env(Seq((8L * 90, 7L))), NB)
    VersionedTableImpl.commitMerge(spark, root, // main advances first
      env(Seq((8L * 91, 8L))), NB)
    val ff = VersionedTableImpl.fastForward(spark, root, "late")
    assert(ff.isLeft && ff.swap.exists(_.contains("re-merge")),
      s"a non-fast-forwardable branch must reject, not clobber: $ff")
  }

  test("vacuum protects live branch files; dropBranch releases them") {
    val root = java.nio.file.Files.createTempDirectory("refs_vac").toString
    VersionedTableImpl.commitMerge(spark, root,
      env((0L until 6L).map(u => (8L * u, u))), NB)
    VersionedTableImpl.createBranch(spark, root, "wip")
    VersionedTableImpl.commitMergeToBranch(spark, root, "wip",
      env((0L until 6L).map(u => (8L * (u + 40) + 1, u))), NB)
    val staged = users(VersionedTableImpl.readBranch(spark, root, "wip"))

    val swept = VersionedTableImpl.vacuum(spark, root, keepFrom = 1)
    assert(swept.isEmpty, s"live branch files must survive vacuum: $swept")
    assert(users(VersionedTableImpl.readBranch(spark, root, "wip")) == staged)

    VersionedTableImpl.dropBranch(spark, root, "wip")
    val swept2 = VersionedTableImpl.vacuum(spark, root, keepFrom = 1)
    assert(swept2.nonEmpty && swept2.forall(_.contains("/b-wip-v")),
      s"a dropped branch's files are reclaimed, nothing else: $swept2")
    // the main lineage is intact
    assert(users(VersionedTableImpl.readVersion(spark, root, 1)).size == 6)
  }

  test("branchDiff previews exactly what the publish will change; describeHistory lists the timeline") {
    val root = java.nio.file.Files.createTempDirectory("refs_diff").toString
    VersionedTableImpl.commitMerge(spark, root,
      env((0L until 8L).map(u => (8L * u, u))), NB)
    VersionedTableImpl.createBranch(spark, root, "prev")
    // staged: update user 0, insert user 20, delete user 1
    VersionedTableImpl.commitMergeToBranch(spark, root, "prev",
      env(Seq((8L * 30 + 1, 0L), (8L * 31, 20L), (8L * 32 + 2, 1L))), NB)

    def ops(df: DataFrame): Map[Long, String] =
      df.select(col("user_id"), col("change_op"))
        .as[(Long, String)].collect().toMap
    val preview = ops(VersionedTableImpl.branchDiff(spark, root, "prev"))
    assert(preview == Map(0L -> "UPDATE", 20L -> "INSERT", 1L -> "DELETE"),
      s"the preview classifies exactly the staged changes: $preview")

    // the preview IS the feed the publish then produces
    assert(VersionedTableImpl.fastForward(spark, root, "prev") == Right(2))
    assert(ops(VersionedTableImpl.changeFeed(spark, root, 1, 2)) == preview,
      "post-publish feed must equal the pre-publish preview")

    val hist = VersionedTableImpl.describeHistory(spark, root)
      .as[(Long, java.sql.Timestamp, Long, Long)].collect().toSeq
    assert(hist.map(_._1) == Seq(1L, 2L))
    assert(hist.forall(h => h._3 > 0L && h._4 > 0L),
      s"every version reports its live file footprint: $hist")
    assert(hist(0)._2.getTime <= hist(1)._2.getTime,
      "commit times are nondecreasing (publish re-stamps the rename)")
  }

  test("maintenance cadence racing live committers: every batch lands, maintenance invisible") {
    // the exact interaction the round-9 HIGH advisory described: a
    // compaction running concurrently with writers must never cost a
    // committed batch — stage-then-claim makes a lost claim a clean yield
    val root = java.nio.file.Files.createTempDirectory("refs_race").toString
    VersionedTableImpl.commitMerge(spark, root,
      env((0L until 20L).map(u => (8L * u, u))), NB)

    // two writers, three batches each; all updates (m=1), disjoint id
    // ranges so per-key latest is deterministic regardless of interleaving
    val batches: Seq[Seq[(Long, Long)]] =
      (0 until 6).map(b => (0L until 10L).map(u =>
        (8L * (100 + b * 20 + u) + 1, (u + b) % 20)))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val writers = Seq(batches.take(3), batches.drop(3)).map(mine =>
      scala.concurrent.Future {
        mine.foreach(b => VersionedTableImpl.commitMerge(spark, root, env(b), NB))
      })
    val cadence = scala.concurrent.Future {
      (1 to 4).foreach { _ =>
        VersionedTableImpl.optimizeTable(spark, root, NB,
          maxFiles = 1, keepVersions = 100)
        Thread.sleep(30L)
      }
    }
    import scala.concurrent.duration._
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(writers :+ cadence), 300.seconds)
    pool.shutdown()

    // expected: per key, the highest event_id across bootstrap + batches
    val wins = scala.collection.mutable.Map[Long, Long]()
    (0L until 20L).foreach(u => wins(u) = 8L * u)
    batches.flatten.foreach { case (id, u) =>
      if (id > wins(u)) wins(u) = id }
    val got = users(VersionedTableImpl.readVersion(spark, root,
      VersionedTableImpl.currentVersion(spark, root)))
    assert(got == wins.map { case (u, id) =>
      u -> ("%020d".format(id), id / 4.0) }.toMap,
      "every concurrently committed batch must land; maintenance is layout-only")
  }

  test("optimizeTable racing publishBranch: the fast-forwarded head's old files survive vacuum") {
    val root = java.nio.file.Files.createTempDirectory("refs_pubrace").toString
    VersionedTableImpl.commitMerge(spark, root,
      env((0L until 12L).map(u => (8L * u, u))), NB)
    var expected: Set[Long] = (0L until 12L).toSet
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      (1 to 4).foreach { cycle =>
        // stage a branch whose files AGE past the vacuum grace before the
        // publish: a fast-forward makes OLD files newly referenced by a
        // NEW main version — exactly what grace cannot protect, so the
        // pin must come from vacuum's branch-scan/live-range ordering
        val branch = s"pub$cycle"
        val keys = (0L until 4L).map(_ + 100L * cycle)
        VersionedTableImpl.createBranch(spark, root, branch)
        VersionedTableImpl.commitMergeToBranch(spark, root, branch,
          env(keys.map(u => (8L * (u + 1000L * cycle), u))), NB)
        Thread.sleep(700L) // age the branch files past graceMs = 500
        val publish = pool.submit(new java.util.concurrent.Callable[Either[String, Int]] {
          def call(): Either[String, Int] =
            VersionedTableImpl.publishBranch(spark, root, branch, Seq.empty)
        })
        val maintain = pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            VersionedTableImpl.optimizeTable(spark, root, NB,
              maxFiles = 1000, keepVersions = 1, graceMs = 500L)
            ()
          }
        })
        val pub = publish.get(); maintain.get()
        assert(pub.isRight, s"cycle $cycle publish must land: $pub")
        expected ++= keys
        val cur = VersionedTableImpl.currentVersion(spark, root)
        val keysNow = VersionedTableImpl.readVersion(spark, root, cur)
          .select("user_id").as[Long].collect().toSet
        assert(keysNow == expected,
          s"cycle $cycle: vacuum swept files of the freshly published head " +
            s"(missing ${expected -- keysNow})")
      }
    } finally pool.shutdown()
  }

  test("optimizeTable: one pass repairs feeds, compacts+GCs, analyzes, vacuums — state invariant") {
    val root = java.nio.file.Files.createTempDirectory("refs_opt").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // three commits (the middle one deletes user 2 -> a tombstone), under
    // a record cap so buckets fragment; no feeds were ever emitted
    val prevCap = spark.conf.get("spark.sql.files.maxRecordsPerFile", "0")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "1")
    try {
      VersionedTableImpl.commitMerge(spark, root,
        env((0L until 10L).map(u => (8L * u, u))), NB)
      VersionedTableImpl.commitMerge(spark, root, env(Seq((8L * 20 + 2, 2L))), NB)
      VersionedTableImpl.commitMerge(spark, root,
        env((0L until 10L).map(u => (8L * (u + 40) + 1, u))), NB)
    } finally spark.conf.set("spark.sql.files.maxRecordsPerFile", prevCap)
    val before = users(VersionedTableImpl.readVersion(spark, root, 3))

    // maxFiles = 0: a FULL pass, so the GC horizon visits every bucket
    // (opportunistic GC rides whatever the compaction rewrites)
    val report = VersionedTableImpl.optimizeTable(spark, root, NB,
      maxFiles = 0, keepVersions = 1, purgeTombstonesBelow = Some("~"),
      graceMs = 0L) // single-writer test: deterministic reclaim
      .collect().head
    assert(report.getLong(0) == 3, s"all three missing feeds repaired: $report")
    assert(!report.isNullAt(1) && report.getLong(1) == 4L,
      s"fragmented buckets compacted as v4: $report")
    assert(report.getLong(5) > 0, s"expired versions' files reclaimed: $report")
    assert(report.isNullAt(2), s"no growth rebucket was requested: $report")

    // state invariant, tombstones purged, stats artifact present
    val cur = VersionedTableImpl.currentVersion(spark, root)
    assert(users(VersionedTableImpl.readVersion(spark, root, cur)) == before)
    assert(rawRows(root).filter(
      col("last_op").isin(LakehouseOpsImpl.DeleteOps: _*)).count() == 0)
    assert(fs.exists(new org.apache.hadoop.fs.Path(root, s"_stats/v$cur.parquet")))
    // live buckets at <= maxFiles
    val counts = VersionedTableImpl.manifest(spark, root, cur)
      .groupBy(col("bucket")).count().select(col("count")).as[Long].collect()
    assert(counts.forall(_ <= 1L), s"compaction bounds live files: ${counts.toSeq}")

    // idempotent: a second pass compacts nothing and repairs nothing
    val again = VersionedTableImpl.optimizeTable(spark, root, NB,
      maxFiles = 1, keepVersions = 1).collect().head
    assert(again.getLong(0) == 0 && again.isNullAt(1),
      s"a second optimize is a no-op: $again")
    assert(VersionedTableImpl.currentVersion(spark, root) == cur)
  }

  test("autoRebucket: fires only when outgrown, steps are capped, stale writers stay correct") {
    def liveBytes(root: String): Long = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$root/data"))
        .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }
    val root = java.nio.file.Files.createTempDirectory("refs_arb").toString
    VersionedTableImpl.commitMerge(spark, root,
      env((0L until 40L).map(u => (8L * u, u))), nBuckets = 2)
    val before = users(VersionedTableImpl.readVersion(spark, root, 1))
    val total = liveBytes(root)
    // healthy layout: a target at/above the mean never fires
    assert(VersionedTableImpl.autoRebucket(spark, root, total).isEmpty)
    assert(VersionedTableImpl.currentVersion(spark, root) == 1)
    // outgrown: total/6 means each of the 2 buckets is 3x over target —
    // fires and grows to the next power of two covering the payload
    val v = VersionedTableImpl.autoRebucket(spark, root, math.max(1L, total / 6))
    assert(v.contains(2), s"growth pass must commit: $v")
    assert(VersionedTableImpl.tableBuckets(spark, root, 0) == 8)
    assert(users(VersionedTableImpl.readVersion(spark, root, 2)) == before,
      "a growth rebucket must be invisible to readers")
    // a writer still passing the creation-time count stays correct
    VersionedTableImpl.commitMerge(spark, root,
      env(Seq((8L * 900, 80L))), nBuckets = 2)
    val s3 = users(VersionedTableImpl.readVersion(spark, root, 3))
    assert(s3.contains(80L) && (s3 - 80L) == before)
    // misconfigured (1-byte) target: the step cap bounds one pass at 8x
    val root2 = java.nio.file.Files.createTempDirectory("refs_arb2").toString
    VersionedTableImpl.commitMerge(spark, root2,
      env((0L until 8L).map(u => (8L * u, u))), nBuckets = 2)
    assert(VersionedTableImpl.autoRebucket(spark, root2, 1L).contains(2))
    assert(VersionedTableImpl.tableBuckets(spark, root2, 0) == 16,
      "one growth pass is capped at 8x the current count")
  }

  test("rebucket: layout-only commit, stale-parameter writers stay correct, history intact") {
    val root = java.nio.file.Files.createTempDirectory("refs_rb").toString
    VersionedTableImpl.commitMerge(spark, root,
      env((0L until 20L).map(u => (8L * u, u))), NB) // 8 buckets
    val v1State = users(VersionedTableImpl.readVersion(spark, root, 1))

    val v2 = VersionedTableImpl.rebucket(spark, root, 16)
    assert(v2.contains(2))
    assert(VersionedTableImpl.tableBuckets(spark, root, 0) == 16,
      "the manifest records the new bucket count")
    assert(users(VersionedTableImpl.readVersion(spark, root, 2)) == v1State,
      "rebucket is pure layout: state unchanged")
    // the physical layout really changed: 16 bucket dirs now hold files
    val m2 = VersionedTableImpl.manifest(spark, root, 2)
      .select(col("bucket")).distinct().as[Long].collect().toSet
    assert(m2.exists(_ >= 8L), s"keys now land in the new bucket range: $m2")

    // a writer still passing the creation-time count of 8 merges correctly
    // (user 9: bucket 1 under 8 buckets, bucket 9 under 16 — the exact key
    // a stale parameter would misroute)
    VersionedTableImpl.commitMerge(spark, root, env(Seq((8L * 200 + 1, 9L))), NB)
    val s3 = users(VersionedTableImpl.readVersion(spark, root, 3))
    assert(s3(9L)._1 == "%020d".format(8L * 200 + 1),
      "the stale-parameter merge must route through the stored bucketing")
    assert(s3 - 9L == v1State - 9L, "every other key is untouched")

    // time travel across the rebucket boundary still reads the old layout
    assert(users(VersionedTableImpl.readVersion(spark, root, 1)) == v1State)

    // point reads prune under the NEW bucketing
    val hit = VersionedTableImpl.readBuckets(spark, root, 3,
      Seq(9L % 16L), LakehouseOpsImpl.tableSchema)
      .filter(col("user_id") === 9L)
    assert(hit.count() == 1, "bucket-scoped reads resolve the new layout")

    // vacuum below the rebucket reclaims the old layout's files
    val swept = VersionedTableImpl.vacuum(spark, root, keepFrom = 2)
    assert(swept.nonEmpty && swept.forall(_.contains("/v1-")),
      s"pre-rebucket files reclaim once their versions expire: $swept")
  }

  test("tombstone GC purges below the horizon, keeps newer tombstones, and preserves confluence") {
    val root = java.nio.file.Files.createTempDirectory("refs_gc").toString
    // v1: inserts for users 0..7 (m=0); v2: DELETE user 2 at seq 16*8+2
    // and DELETE user 5 at seq 90*8+2 — two tombstones, far-apart seqs
    VersionedTableImpl.commitMerge(spark, root,
      env((0L until 8L).map(u => (8L * u, u))), NB)
    VersionedTableImpl.commitMerge(spark, root,
      env(Seq((8L * 16 + 2, 2L), (8L * 90 + 2, 5L))), NB)
    def tombstones(): Map[Long, String] =
      rawRows(root).filter(col("last_op").isin(LakehouseOpsImpl.DeleteOps: _*))
        .select(col("user_id"), col("last_seq")).as[(Long, String)]
        .collect().toMap
    assert(tombstones().keySet == Set(2L, 5L), s"fixture: ${tombstones()}")
    val liveBefore = users(VersionedTableImpl.readVersion(spark, root, 2))

    // horizon between the two tombstones: only the older one is purged
    val horizon = "%020d".format(8L * 50)
    val v3 = VersionedTableImpl.compactVersion(spark, root, maxFiles = 0,
      nBuckets = NB, purgeTombstonesBelow = Some(horizon))
    assert(v3.contains(3))
    assert(tombstones().keySet == Set(5L),
      s"only the below-horizon tombstone is purged: ${tombstones()}")
    assert(users(VersionedTableImpl.readVersion(spark, root, 3)) == liveBefore,
      "GC is invisible to the live state")

    // confluence within the horizon: a late lower-seq upsert for user 5
    // still loses to the RETAINED tombstone...
    VersionedTableImpl.commitMerge(spark, root, env(Seq((8L * 60, 5L))), NB)
    assert(!users(VersionedTableImpl.readVersion(spark, root,
      VersionedTableImpl.currentVersion(spark, root))).contains(5L),
      "a retained tombstone must still win against a lower-seq upsert")

    // ...then the full-horizon pass reclaims it too
    val v5 = VersionedTableImpl.compactVersion(spark, root, maxFiles = 0,
      nBuckets = NB, purgeTombstonesBelow = Some("~"))
    assert(v5.isDefined && tombstones().isEmpty,
      s"full-horizon GC leaves zero tombstone rows: ${tombstones()}")
  }
}
