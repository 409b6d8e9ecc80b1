package graft.ops

import java.io.File

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.CdcSynth

/** Versioned-table mechanics the q182/q183 gates (oracle equality of
  * time travel and change feed) cannot see: commits never touch earlier
  * versions' files, an interrupted commit's leftovers are invisible to
  * readers and reclaimed by vacuum, and vacuum removes exactly the files
  * no kept manifest references.
  */
class VersionedSpec extends SparkSpec {
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

  test("AS OF timestamp resolves to the version published at or before the instant") {
    val root = java.nio.file.Files.createTempDirectory("vtab_asof").toString
    val t0 = System.currentTimeMillis()
    VersionedTableImpl.commitMerge(spark, root,
      env((0L until 8L).map(u => (8L * u, u))), NB)
    Thread.sleep(20L)
    val between = System.currentTimeMillis()
    Thread.sleep(20L)
    VersionedTableImpl.commitMerge(spark, root, env(Seq((8L * 100, 1L))), NB)
    assert(VersionedTableImpl.versionAsOf(spark, root, t0 - 1) == 0,
      "before the first commit the table is empty")
    assert(VersionedTableImpl.versionAsOf(spark, root, between) == 1)
    assert(VersionedTableImpl.versionAsOf(spark, root,
      System.currentTimeMillis()) == 2)
    // the resolved version reads like any other
    val s1 = users(VersionedTableImpl.readVersion(spark, root,
      VersionedTableImpl.versionAsOf(spark, root, between)))
    assert(s1(1L)._1 == "%020d".format(8L), "AS OF must read the old state")
  }

  test("exported snapshots carry a parquet bloom filter on the key column") {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Files.createTempDirectory("vtab_export").toString
    VersionedTableImpl.commitMerge(spark, root,
      env((0L until 16L).map(u => (8L * u, u))), NB)
    val dest = java.nio.file.Files.createTempDirectory("vtab_snap").toString + "/snap"
    VersionedTableImpl.exportVersion(spark, root, 1, dest, NB)
    // the exported state equals the version
    assert(users(spark.read.parquet(dest).drop("bucket")) ==
      users(VersionedTableImpl.readVersion(spark, root, 1)))
    // and a data file's footer carries the user_id bloom filter
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val file = walk(new File(dest)).filter(_.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).headOption
      .getOrElse(fail("no exported parquet file"))
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file),
      spark.sparkContext.hadoopConfiguration))
    try {
      val block = reader.getRowGroups.get(0)
      val chunk = block.getColumns.asScala
        .find(_.getPath.toDotString == "user_id")
        .getOrElse(fail("no user_id column chunk"))
      val bloom = reader.getBloomFilterDataReader(block).readBloomFilter(chunk)
      assert(bloom != null,
        "serving snapshot must write a bloom filter for the key column")
    } finally reader.close()
  }

  test("two takeover racers on one stale claim: exactly one wins (rename-based break)") {
    val root = java.nio.file.Files.createTempDirectory("vtab_takeover").toString
    VersionedTableImpl.commitMerge(spark, root,
      env((0L until 4L).map(u => (8L * u, u))), NB)
    // a claimant "died" pre-publish: stale claim on v2, nothing behind it
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val claim = new org.apache.hadoop.fs.Path(root, "_versions/v2.claim")
    fs.create(claim, false).close()
    fs.setTimes(claim, System.currentTimeMillis() - 3600000L, -1)
    // two committers race the takeover; delete-then-create would let BOTH
    // win (A deletes, A creates, B deletes A's live claim, B creates) —
    // the rename-based break admits exactly one, the loser retries onto v3
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val racers = Seq(100L, 200L).map { base =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = VersionedTableImpl.commitMerge(spark, root,
            env(Seq((8L * base, base % 17))), NB, staleClaimMs = 1000L)
        })
      }
      val versions = racers.map(_.get()).sorted
      assert(versions == Seq(2, 3),
        s"both racers must land on distinct versions through the broken claim: $versions")
    } finally pool.shutdown()
    val state = users(VersionedTableImpl.readVersion(spark, root, 3))
    assert(state.contains(100L % 17) && state.contains(200L % 17),
      s"both batches must survive: ${state.keySet}")
  }

  test("expectation suites gate commits: failing rules reject, passing publish") {
    import VersionedTableImpl.{Expectation, commitMergeExpecting, currentVersion}
    val root = java.nio.file.Files.createTempDirectory("vtab_expect").toString
    val rules = Seq(
      Expectation("value_non_negative", col("value") >= 0.0),
      Expectation("few_t2", col("event_type") =!= "t2", allow = 2L))
    // batch of users 0..7: event_type = t(u%3) → users 2,5 are t2 (2 ≤ allow)
    val ok = commitMergeExpecting(spark, root,
      env((0L until 8L).map(u => (8L * u, u))), NB, rules)
    assert(ok == Right(1), s"suite within allowances must publish: $ok")
    // users 8..16 add t2 keys 8,11,14 → 5 live t2 rows > allow; REJECTED,
    // and the failed attempt leaves no visible version behind
    val bad = commitMergeExpecting(spark, root,
      env((8L until 17L).map(u => (8L * u, u))), NB, rules)
    assert(bad.isLeft && bad.left.exists(_.contains("few_t2")), s"got $bad")
    assert(currentVersion(spark, root) == 1,
      "a rejected suite must leave the table at the audited-good version")
    // the released version number is reusable by the next commit
    val retry = commitMergeExpecting(spark, root,
      env(Seq((8L * 100, 3L))), NB, rules)
    assert(retry == Right(2), s"the rejected claim must be released: $retry")
  }

  test("commits are additive; time travel, change feed, vacuum, and orphan cleanup") {
    val root = java.nio.file.Files.createTempDirectory("vtab").toString
    // v1: INSERT users 0..15; v2: update 1, delete 2; v3: update 1 again
    val v1 = VersionedTableImpl.commitMerge(spark, root,
      env((0L until 16L).map(u => (8L * u, u))), NB)
    val afterV1 = dataFiles(root)
    val v2 = VersionedTableImpl.commitMerge(spark, root,
      env(Seq((8L * 100, 1L), (8L * 101 + 2, 2L))), NB)
    val v3 = VersionedTableImpl.commitMerge(spark, root,
      env(Seq((8L * 102, 1L))), NB)
    assert((v1, v2, v3) == (1, 2, 3))
    assert(afterV1.subsetOf(dataFiles(root)),
      "a commit must never delete or rewrite an earlier version's files")

    // time travel: v1 still shows user 2 and user 1's original seq
    val s1 = users(VersionedTableImpl.readVersion(spark, root, 1))
    assert(s1.size == 16 && s1.contains(2L) && s1(1L)._1 == "%020d".format(8L))
    val s3 = users(VersionedTableImpl.readVersion(spark, root, 3))
    assert(s3.size == 15 && !s3.contains(2L) && s3(1L)._1 == "%020d".format(816L))

    // change feed v1 -> v3: user 1 UPDATE, user 2 DELETE, nothing else
    val feed = VersionedTableImpl.changeFeed(spark, root, 1, 3)
      .select(col("user_id"), col("change_op"))
      .as[(Long, String)].collect().toSeq.sorted
    assert(feed == Seq((1L, "UPDATE"), (2L, "DELETE")), s"feed: $feed")

    // an interrupted commit leaves a staging dir + an orphan data file;
    // readers resolve through manifests only, so both are invisible
    val orphan = new File(s"$root/data/bucket=0/v9-orphan.parquet")
    Seq((99L, "x", "s", "t", 1.0, 1L))
      .toDF("user_id", "last_op", "last_seq", "event_type", "value", "k")
      .write.parquet(s"$root/.v_staging_dead/bucket=0")
    java.nio.file.Files.copy(
      new File(s"$root/.v_staging_dead/bucket=0").listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath, orphan.toPath)
    assert(users(VersionedTableImpl.readVersion(spark, root, 3)) == s3,
      "orphans must be invisible to readers")

    // vacuum keeping all versions: only the orphan dies
    val dead1 = VersionedTableImpl.vacuum(spark, root, keepFrom = 1)
    assert(dead1.map(_.stripPrefix("file:")).toSet == Set(orphan.getAbsolutePath),
      s"dead: $dead1")

    // vacuum to v3 only: v1/v2-era files unreferenced by v3 die, v3 reads on
    VersionedTableImpl.vacuum(spark, root, keepFrom = 3)
    assert(users(VersionedTableImpl.readVersion(spark, root, 3)) == s3,
      "the kept version must survive vacuum intact")
    val remaining = dataFiles(root)
    val v3Files = VersionedTableImpl.manifest(spark, root, 3)
      .select(col("file")).as[String].collect().toSet
    assert(remaining == v3Files.map(_.stripPrefix("file:")),
      "exactly the kept manifest's files remain")
  }

  test("write-audit-publish: a failing audit leaves no visible version; a passing one publishes") {
    val root = java.nio.file.Files.createTempDirectory("vtab_wap").toString
    val v1 = VersionedTableImpl.commitMerge(spark, root,
      env((0L until 8L).map(u => (8L * u, u))), NB)
    assert(v1 == 1)
    val before = users(VersionedTableImpl.readVersion(spark, root, 1))

    // audit rejects: the batch would write value 250.0 (>= 100 cap)
    val bad = VersionedTableImpl.commitMergeAudited(spark, root,
      env(Seq((8L * 125, 1L))), NB) { state =>
      val mx = state.agg(max(col("value"))).head().getDouble(0)
      if (mx >= 100.0) Some(s"value cap exceeded: $mx") else None
    }
    assert(bad.isLeft, s"audit must reject: $bad")
    assert(VersionedTableImpl.currentVersion(spark, root) == 1,
      "rejected commit must leave the version unchanged")
    assert(users(VersionedTableImpl.readVersion(spark, root, 1)) == before,
      "rejected commit must leave the state unchanged")
    // the rejected files are unreferenced; vacuum sweeps them
    assert(VersionedTableImpl.vacuum(spark, root, keepFrom = 1).nonEmpty,
      "rejected commit's data files must be vacuumable orphans")

    // audit passes: a small-value update publishes as v2
    val good = VersionedTableImpl.commitMergeAudited(spark, root,
      env(Seq((8L * 30, 1L))), NB) { state =>
      val mx = state.agg(max(col("value"))).head().getDouble(0)
      if (mx >= 100.0) Some(s"value cap exceeded: $mx") else None
    }
    assert(good == Right(2), s"audit must publish: $good")
    val after = users(VersionedTableImpl.readVersion(spark, root, 2))
    assert(after(1L)._2 == 60.0, s"published state carries the update: $after")

    // an unaudited manifest is NEVER visible pre-publish: while staged, the
    // only artifacts under _versions are dot-prefixed pending/tmp + claims
    // (pinned structurally: a throwing audit leaves no visible v3)
    val boom = intercept[RuntimeException] {
      VersionedTableImpl.commitMergeAudited(spark, root,
        env(Seq((8L * 31, 2L))), NB)(_ => throw new RuntimeException("audit died"))
    }
    assert(boom.getMessage == "audit died")
    assert(VersionedTableImpl.currentVersion(spark, root) == 2,
      "a crashed audit must leave no visible version (manifest staged at " +
        "the pending path, never the visible one)")
  }

  test("concurrent committers serialize through the claim protocol; every batch lands") {
    val root = java.nio.file.Files.createTempDirectory("vtab_cc").toString
    VersionedTableImpl.commitMerge(spark, root,
      env((0L until 16L).map(u => (8L * u, u))), NB)
    // four writers race from version 1; disjoint keys so the final state
    // must carry ALL updates regardless of commit order
    val results = graft.ops.Par.map(Seq(0L, 1L, 2L, 3L)) { w =>
      VersionedTableImpl.commitMerge(spark, root,
        env(Seq((8L * (50 + w), 4L * w), (8L * (60 + w), 4L * w + 1))), NB)
    }
    assert(results.toSet == Set(2, 3, 4, 5),
      s"each racing writer must land its own serialized version: $results")
    assert(VersionedTableImpl.currentVersion(spark, root) == 5)
    val s5 = users(VersionedTableImpl.readVersion(spark, root, 5))
    (0L until 4L).foreach { w =>
      assert(s5(4L * w)._1 == "%020d".format(8L * (50 + w)),
        s"writer $w's first update must survive the race")
      assert(s5(4L * w + 1)._1 == "%020d".format(8L * (60 + w)),
        s"writer $w's second update must survive the race")
    }
    // losers' first-attempt files (if any conflicts happened) are orphans;
    // vacuum leaves every kept version readable
    VersionedTableImpl.vacuum(spark, root, keepFrom = 1)
    assert(users(VersionedTableImpl.readVersion(spark, root, 5)) == s5)
    assert(users(VersionedTableImpl.readVersion(spark, root, 1)).size == 16,
      "history must survive the race and the vacuum")
  }

  test("property: racing writers with overlapping keys serialize to the one-shot replay") {
    // latest-wins merges are confluent under the claim protocol: whatever
    // order the writers serialize into, the final state must equal
    // replaying the UNION of all batches in one shot. DELETES included:
    // the versioned table retains winning tombstones as versioned rows,
    // so a later-committing lower-seq upsert of the same key LOSES
    // against the tombstone instead of resurrecting it (the flat-path
    // MergePropertySpec non-claim, closed here). Seeded for repro.
    val rng = new scala.util.Random(20260814L)
    val root = java.nio.file.Files.createTempDirectory("vtab_prop").toString
    VersionedTableImpl.commitMerge(spark, root,
      env((0L until 20L).map(u => (8L * u, u))), NB)
    val batches = (0 until 6).map { w =>
      (0 until 5).map { i =>
        val m = Seq(0L, 1L, 2L)(rng.nextInt(3)) // INSERT/UPDATE/DELETE, shared keys
        (8L * (30 + 10 * w + i) + m, rng.nextInt(20).toLong)
      }
    }
    // maxAttempts must cover the worst writer losing every race: ≥ writers
    val results = graft.ops.Par.map(batches)(b =>
      VersionedTableImpl.commitMerge(spark, root, env(b), NB, maxAttempts = 12))
    assert(results.sorted == (2 to 7).toList, s"serialized versions: $results")
    val oneShot = env((0L until 20L).map(u => (8L * u, u)) ++ batches.flatten)
    val expectedRoot = java.nio.file.Files.createTempDirectory("vtab_prop_e").toString
    VersionedTableImpl.commitMerge(spark, expectedRoot, oneShot, NB)
    assert(users(VersionedTableImpl.readVersion(spark, root, 7)) ==
      users(VersionedTableImpl.readVersion(spark, expectedRoot, 1)),
      "racing writers must converge to the one-shot replay of all batches")
  }

  test("a stale claim from a dead committer is broken (takeover)") {
    val root = java.nio.file.Files.createTempDirectory("vtab_stale").toString
    VersionedTableImpl.commitMerge(spark, root,
      env((0L until 4L).map(u => (8L * u, u))), NB)
    // simulate a committer that died between claim and manifest rename
    val claim = new File(s"$root/_versions/v2.claim")
    claim.createNewFile()
    Thread.sleep(10)
    val v2 = VersionedTableImpl.commitMerge(spark, root,
      env(Seq((8L * 90, 1L))), NB, staleClaimMs = 1L)
    assert(v2 == 2, "a stale claim with no manifest behind it must be broken")
    assert(users(VersionedTableImpl.readVersion(spark, root, 2))(1L)._1 ==
      "%020d".format(720L))
  }

  test("schema evolution flows through commit, read, and feed; old eras null-fill") {
    val root = java.nio.file.Files.createTempDirectory("vtab_evo").toString
    VersionedTableImpl.commitMerge(spark, root,
      env((0L until 8L).map(u => (8L * u, u))), NB)
    // v2's images GROW a column; only users 1 and 2 are touched
    val evolved = env(Seq((8L * 70, 1L), (8L * 71, 2L)))
      .withColumn("image", col("image").withField("src", lit("batch2")))
    VersionedTableImpl.commitMerge(spark, root, evolved, NB)

    val s2 = VersionedTableImpl.readVersion(spark, root, 2)
      .select(col("user_id"), col("src")).as[(Long, Option[String])]
      .collect().toMap
    assert(s2(1L).contains("batch2") && s2(2L).contains("batch2"),
      s"evolved rows carry the new column: $s2")
    assert((s2.keySet -- Set(1L, 2L)).forall(s2(_).isEmpty),
      s"pre-evolution rows null-fill the new column: $s2")

    // the feed carries the union schema: src_before is null (the column
    // postdates v1), src_after is set for the touched keys
    val feed = VersionedTableImpl.changeFeed(spark, root, 1, 2)
      .select(col("user_id"), col("change_op"),
        col("src_before"), col("src_after"))
      .as[(Long, String, Option[String], Option[String])].collect().toSeq.sorted
    assert(feed == Seq(
      (1L, "UPDATE", None, Some("batch2")),
      (2L, "UPDATE", None, Some("batch2"))), s"feed: $feed")
  }

  test("snapshot isolation: a plan built before later commits and a vacuum still reads its version") {
    val root = java.nio.file.Files.createTempDirectory("vtab_snap").toString
    VersionedTableImpl.commitMerge(spark, root,
      env((0L until 12L).map(u => (8L * u, u))), NB)
    val planned = VersionedTableImpl.readVersion(spark, root, 1) // plan now...
    val before = users(planned)
    // ...then the table moves on: two commits and a history-keeping vacuum
    VersionedTableImpl.commitMerge(spark, root, env(Seq((8L * 80, 3L))), NB)
    VersionedTableImpl.commitMerge(spark, root,
      env(Seq((8L * 81 + 2, 4L))), NB) // delete user 4
    VersionedTableImpl.vacuum(spark, root, keepFrom = 1)
    assert(users(planned) == before,
      "a reader's plan must execute unchanged across commits + vacuum " +
        "(version files are immutable while their manifest is retained)")
    assert(before.contains(4L) && before.size == 12)
  }

  test("full-version reads keep the manifest in a scan — no driver-side file list") {
    val root = java.nio.file.Files.createTempDirectory("vtab_scan").toString
    VersionedTableImpl.commitMerge(spark, root,
      env((0L until 16L).map(u => (8L * u, u))), NB)
    VersionedTableImpl.commitMerge(spark, root, env(Seq((8L * 40, 1L))), NB)
    val qe = VersionedTableImpl.readVersion(spark, root, 2).queryExecution
    assert(qe.optimizedPlan.toString.contains("LeftSemi"),
      s"readVersion must filter files via a semi-join, not a collected list:\n${qe.optimizedPlan}")
    // the manifest is one of the plan's FILE SCANS (executedPlan prints
    // scan locations), i.e. manifest rows never pass through the driver
    assert(qe.executedPlan.toString.contains("_versions"),
      s"the manifest must appear as a SCAN in the read plan:\n${qe.executedPlan}")
  }
}
