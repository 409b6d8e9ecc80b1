package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.CdcSynth

/** The commit protocol under OBJECT-STORE semantics (the
  * [[graft.fs.ObjectStoreFileSystem]] shim: non-atomic overwrite-always
  * rename, atomic single-object PUT, atomic create-exclusive): the
  * conditional-create commit mode must keep every guarantee the rename
  * mode has on POSIX — exactly-one-publisher, confluent racing writers,
  * stale-claim takeover, WAP, cross-table txn roll-forward, vacuum — while
  * never relying on rename atomicity. 100 TB tables live on object stores;
  * this is the deployment leg of the whole lakehouse story.
  */
class ObjectStoreCommitSpec extends SparkSpec {
  import spark.implicits._

  private val NB = 4

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sparkContext.hadoopConfiguration.set(
      "fs.objstore.impl", classOf[graft.fs.ObjectStoreFileSystem].getName)
  }

  private def objRoot(tag: String): String =
    "objstore:" + java.nio.file.Files.createTempDirectory(s"obj_$tag").toString

  private def fsOf(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

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

  test("pointer commits: no manifest dir, history + time travel + feed intact") {
    val root = objRoot("basic")
    val fs = fsOf(root)
    assert(VersionedTableImpl.conditionalCommit(fs),
      "the objstore scheme must select conditional-create commit mode")
    val v1 = VersionedTableImpl.commitMerge(spark, root,
      env((0L until 12L).map(u => (8L * u, u))), NB)
    val v2 = VersionedTableImpl.commitMerge(spark, root,
      env(Seq((8L * 100, 1L), (8L * 101 + 2, 2L))), NB) // update 1, delete 2
    assert((v1, v2) == (1, 2))
    // the commit point was a pointer PUT: no visible manifest DIR exists
    assert(!fs.exists(VersionedTableImpl.visiblePath(root, 2)))
    assert(fs.exists(new Path(root, "_versions/v2.parquet.ptr")))

    val s2 = users(VersionedTableImpl.readVersion(spark, root, 2))
    assert(s2.size == 11 && !s2.contains(2L) &&
      s2(1L)._1 == "%020d".format(8L * 100))
    // time travel: v1 unaffected
    val s1 = users(VersionedTableImpl.readVersion(spark, root, 1))
    assert(s1.size == 12 && s1.contains(2L))
    // the change feed and history read through the pointers
    val feed = VersionedTableImpl.changeFeed(spark, root, 1, 2)
      .select("user_id", "change_op").as[(Long, String)].collect().toSet
    assert(feed == Set((1L, "UPDATE"), (2L, "DELETE")), s"feed: $feed")
    val hist = VersionedTableImpl.describeHistory(spark, root)
      .select("version").as[Long].collect().toSeq
    assert(hist == Seq(1L, 2L))
  }

  test("racing writers + a stale claim: takeover never double-publishes, all batches land") {
    val root = objRoot("race")
    VersionedTableImpl.commitMerge(spark, root,
      env((0L until 8L).map(u => (8L * u, u))), NB)
    // a dead claimant's stale claim on v2 (crashed 100s ago)
    val fs = fsOf(root)
    val claim = new Path(root, "_versions/v2.claim")
    fs.mkdirs(claim.getParent)
    fs.create(claim, false).close()
    fs.setTimes(claim, System.currentTimeMillis() - 100000L, -1)

    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    try {
      val futures = Seq(
        (0 until 3).map(j => Seq((8L * (300 + j), 100L + j))),
        (0 until 3).map(j => Seq((8L * (400 + j), 200L + j))),
        (0 until 3).map(j => Seq((8L * (500 + j), 300L + j)))).map { batches =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = batches.foreach(b =>
            VersionedTableImpl.commitMerge(spark, root, env(b), NB,
              maxAttempts = 20, staleClaimMs = 3000L))
        })
      }
      futures.foreach(_.get())
    } finally pool.shutdown()

    val cur = VersionedTableImpl.currentVersion(spark, root)
    assert(cur == 10, s"9 racing commits after v1 must land as v2..v10: $cur")
    val s = users(VersionedTableImpl.readVersion(spark, root, cur))
    val expect = (0L until 8L).toSet ++
      (0 until 3).flatMap(j => Seq(100L + j, 200L + j, 300L + j)).toSet
    assert(s.keySet == expect, s"lost a racing batch: ${expect -- s.keySet}")
    // every version's manifest resolves (no torn pointer ever published)
    (1 to cur).foreach { v =>
      assert(VersionedTableImpl.manifest(spark, root, v).count() > 0, s"v$v torn")
    }
  }

  test("WAP on an object store: reject leaves nothing, publish promotes the pending pointer") {
    val root = objRoot("wap")
    VersionedTableImpl.commitMerge(spark, root,
      env((0L until 6L).map(u => (8L * u, u))), NB)
    val rej = VersionedTableImpl.commitMergeAudited(spark, root,
      env(Seq((8L * 60, 50L))), NB)(_ => Some("rejected by audit"))
    assert(rej.isLeft && VersionedTableImpl.currentVersion(spark, root) == 1)
    val fs = fsOf(root)
    assert(!fs.exists(new Path(root, "_versions/.pending-v2.parquet.ptr")),
      "a rejected pending pointer must be deleted")
    val ok = VersionedTableImpl.commitMergeAudited(spark, root,
      env(Seq((8L * 61, 51L))), NB)(_ => None)
    assert(ok == Right(2))
    assert(users(VersionedTableImpl.readVersion(spark, root, 2)).contains(51L))
    assert(!fs.exists(new Path(root, "_versions/.pending-v2.parquet.ptr")),
      "the pending pointer must be consumed by the promote")
  }

  test("cross-table txn crash matrix on an object store rolls forward / aborts cleanly") {
    val (a, b) = (objRoot("txn_a"), objRoot("txn_b"))
    val txd = objRoot("txn_d")
    // normal path
    val done = VersionedTableImpl.commitTxn(spark, txd, Seq(
      (a, env((0L until 6L).map(u => (8L * u, u))), NB),
      (b, env((0L until 3L).map(u => (8L * (u + 20), u))), NB)))
    assert(done.map(_._2) == Seq(1, 1))
    assert(users(VersionedTableImpl.readVersion(spark, a, 1)).size == 6)
    assert(users(VersionedTableImpl.readVersion(spark, b, 1)).size == 3)

    // crash AFTER the record: stage pendings, write the record, recover
    val va = VersionedTableImpl.commitMerge(spark, a,
      env(Seq((8L * 90, 70L))), NB, pendingStage = true)
    val vb = VersionedTableImpl.commitMerge(spark, b,
      env(Seq((8L * 91, 71L))), NB, pendingStage = true)
    val fs = fsOf(txd)
    val rec = new Path(txd, "txn-crashed")
    val out = fs.create(rec, false)
    out.write(s"$a\t$va\n$b\t$vb".getBytes("UTF-8")); out.close()
    assert(VersionedTableImpl.currentVersion(spark, a) == 1,
      "pending pointers must stay invisible")
    assert(VersionedTableImpl.recoverTxns(spark, txd) == 1)
    assert(VersionedTableImpl.currentVersion(spark, a) == 2 &&
      VersionedTableImpl.currentVersion(spark, b) == 2)
    assert(users(VersionedTableImpl.readVersion(spark, a, 2)).contains(70L))
    assert(VersionedTableImpl.recoverTxns(spark, txd) == 0) // idempotent

    // crash BEFORE the record: abort releases the version number
    val vc = VersionedTableImpl.commitMerge(spark, a,
      env(Seq((8L * 95, 80L))), NB, pendingStage = true)
    VersionedTableImpl.abortTxn(spark, Seq(a -> vc))
    assert(VersionedTableImpl.commitMerge(spark, a,
      env(Seq((8L * 96, 81L))), NB) == 3)
    val s = users(VersionedTableImpl.readVersion(spark, a, 3))
    assert(s.contains(81L) && !s.contains(80L))
  }

  test("vacuum in pointer mode reclaims expired files, keeps live + in-flight ones") {
    val root = objRoot("vac")
    // v1 arrives through WAP (its data dir keeps the `.pending-` name
    // after the promote — the round-11 audit's retention-leak path);
    // v2: update ALL keys (every bucket rewritten, v1's files unique)
    val v1 = VersionedTableImpl.commitMergeAudited(spark, root,
      env((0L until 16L).map(u => (8L * u, u))), NB)(_ => None)
    assert(v1 == Right(1))
    VersionedTableImpl.commitMerge(spark, root,
      env((0L until 16L).map(u => (8L * (u + 100), u))), NB)
    val s2 = users(VersionedTableImpl.readVersion(spark, root, 2))
    val swept = VersionedTableImpl.vacuum(spark, root, keepFrom = 2)
    assert(swept.nonEmpty, "the expired WAP-published version's files must " +
      "be reclaimable (a promoted .pending data dir must not pin forever)")
    assert(users(VersionedTableImpl.readVersion(spark, root, 2)) == s2,
      "vacuum must not touch the live version")
  }

  test("branches on an object store: staged commits, fast-forward, drop cleans pointer artifacts") {
    val root = objRoot("branch")
    VersionedTableImpl.commitMerge(spark, root,
      env((0L until 6L).map(u => (8L * u, u))), NB)
    assert(VersionedTableImpl.createBranch(spark, root, "nightly") == 1)
    VersionedTableImpl.commitMergeToBranch(spark, root, "nightly",
      env(Seq((8L * 70, 40L))), NB)
    VersionedTableImpl.commitMergeToBranch(spark, root, "nightly",
      env(Seq((8L * 71, 41L))), NB)
    assert(VersionedTableImpl.currentVersion(spark, root) == 1,
      "main must see nothing while staged")
    val pub = VersionedTableImpl.publishBranch(spark, root, "nightly", Seq.empty)
    assert(pub == Right(2), s"fast-forward must land main v2: $pub")
    val s = users(VersionedTableImpl.readVersion(spark, root, 2))
    assert(s.contains(40L) && s.contains(41L) && s.size == 8)
    // publishBranch dropped the branch: no pointer/data artifacts remain
    val fs = fsOf(root)
    val leftovers = fs.listStatus(new Path(root, "_versions"))
      .map(_.getPath.getName)
      .filter(n => n.contains("b-nightly-v") && !n.endsWith(".claim"))
    assert(leftovers.isEmpty,
      s"dropBranch must clean branch pointers and data dirs: ${leftovers.toSeq}")
    // and the published files survive a vacuum (main's manifest pins them)
    VersionedTableImpl.vacuum(spark, root, keepFrom = 2)
    assert(users(VersionedTableImpl.readVersion(spark, root, 2)) == s)
  }

  test("MOR delta commits, compaction and reads work on an object store") {
    val root = objRoot("mor")
    MorTableImpl.commitAppend(spark, root,
      env((0L until 12L).map(u => (8L * u, u))), NB)
    MorTableImpl.commitAppend(spark, root,
      env(Seq((8L * 100, 1L), (8L * 101 + 2, 2L))), NB)
    val s2 = users(MorTableImpl.readMor(spark, root, 2))
    assert(s2.size == 11 && !s2.contains(2L) &&
      s2(1L)._1 == "%020d".format(8L * 100))
    val v3 = MorTableImpl.compactMor(spark, root, maxFiles = 1, NB)
    assert(v3.contains(3))
    assert(users(MorTableImpl.readMor(spark, root, 3)) == s2,
      "compaction must be invisible under pointer commits")
    assert(users(MorTableImpl.lookupMor(spark, root, 3, Seq(1L), NB))
      .keySet == Set(1L))
  }
}
