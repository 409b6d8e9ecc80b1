package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.CdcSynth

/** The layered-manifest SCALE contract, measured rather than eyeballed
  * (the round-11 "Next round" #1/#2 done-criteria):
  *
  *  - per-commit manifest METADATA bytes stay O(batch): a trickle commit
  *    against a table carrying many live files must not re-serialize the
  *    carried file rows (the pre-layering behavior rewrote the FULL
  *    manifest — O(all live files) — through one task per commit);
  *  - table sizing (autoRebucket) reads the manifest's own `bytes`
  *    column: ZERO per-data-file getFileStatus calls.
  */
class ManifestScaleSpec extends SparkSpec {
  import spark.implicits._

  private val NB = 8

  private def env(rows: Seq[(Long, Long)]): DataFrame =
    CdcSynth.envelope(rows.toDF("event_id", "user_id")
      .withColumn("event_type", concat(lit("t"), pmod(col("user_id"), lit(3L))))
      .withColumn("value", col("event_id").cast("double") / 4.0)
      .withColumn("ts", timestamp_millis(lit(1700000000000L) + col("event_id") * 1000L))
      .withColumn("props", concat(lit("{\"k\":"), col("user_id") * 7L, lit("}"))))

  private def du(p: String): Long = {
    val path = new org.apache.hadoop.fs.Path(p)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) 0L else fs.getContentSummary(path).getLength
  }

  private def segsOf(root: String, v: Int): Set[String] =
    if (v < 1) Set.empty
    else VersionedTableImpl.descriptorDf(spark, root, v)
      .select(col("segment")).as[String].collect().toSet

  /** Metadata bytes COMMIT v wrote: its descriptor plus the segments it
    * newly references (carried segments are shared, not rewritten). */
  private def metaBytes(root: String, v: Int): Long = {
    val fresh = segsOf(root, v) -- segsOf(root, v - 1)
    du(s"$root/_versions/v$v.parquet") +
      fresh.toSeq.map(n => du(s"$root/_versions/_segments/$n")).sum
  }

  /** Total metadata footprint of version v (descriptor + every referenced
    * segment) — what a full rewrite per commit would cost. */
  private def totalMeta(root: String, v: Int): Long =
    du(s"$root/_versions/v$v.parquet") +
      segsOf(root, v).toSeq.map(n => du(s"$root/_versions/_segments/$n")).sum

  test("COW trickle commits write O(batch) manifest metadata, not O(live files)") {
    val root = java.nio.file.Files.createTempDirectory("mscale_cow").toString
    // SEED: one fat commit under a 1-record file cap — hundreds of live
    // files across every bucket, the carried set a trickle must NOT copy
    val prevCap = spark.conf.get("spark.sql.files.maxRecordsPerFile", "0")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "1")
    try VersionedTableImpl.commitMerge(spark, root,
      env((0L until 800L).map(u => (8L * u, u))), NB)
    finally spark.conf.set("spark.sql.files.maxRecordsPerFile", prevCap)
    val liveFiles = VersionedTableImpl.manifest(spark, root, 1).count()
    assert(liveFiles >= 800L, s"seed must fragment: $liveFiles files")

    // TRICKLE: K single-key commits, all to bucket 0
    val K = 8
    (1 to K).foreach { i =>
      val v = VersionedTableImpl.commitMerge(spark, root,
        env(Seq((8L * (1000L + i), 0L))), NB)
      assert(v == 1 + i)
    }
    val perCommit = (2 to K + 1).map(v => metaBytes(root, v))
    val full = totalMeta(root, K + 1)
    // every trickle commit's metadata is a small fraction of the full
    // manifest footprint (the old code wrote `full` bytes EVERY commit)
    perCommit.zipWithIndex.foreach { case (b, i) =>
      assert(b < full / 3,
        s"trickle commit ${i + 2} wrote $b metadata bytes vs full=$full — " +
          "carried rows are being rewritten")
    }
    // and the cost is flat in the number of accumulated live files
    assert(perCommit.max <= 3 * perCommit.min,
      s"per-commit metadata must not grow with table age: $perCommit")
    // correctness rides along: the 800 seed keys survive, and key 0
    // carries the LAST trickle's upsert
    val state = VersionedTableImpl.readVersion(spark, root, K + 1)
    assert(state.count() == 800)
    val v0 = state.filter(col("user_id") === 0L)
      .select(col("value")).as[Double].head()
    assert(v0 == (8L * (1000L + K)) / 4.0, s"last trickle upsert must win: $v0")
  }

  test("MOR trickle deltas write O(batch) manifest metadata; compaction consolidates") {
    val root = java.nio.file.Files.createTempDirectory("mscale_mor").toString
    val prevCap = spark.conf.get("spark.sql.files.maxRecordsPerFile", "0")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "1")
    try MorTableImpl.commitAppend(spark, root,
      env((0L until 400L).map(u => (8L * u, u))), NB)
    finally spark.conf.set("spark.sql.files.maxRecordsPerFile", prevCap)

    val K = 8
    (1 to K).foreach { i =>
      val v = MorTableImpl.commitAppend(spark, root,
        env(Seq((8L * (1000L + i), (400L + i)))), NB)
      assert(v == 1 + i)
    }
    val perCommit = (2 to K + 1).map(v => metaBytes(root, v))
    val full = totalMeta(root, K + 1)
    perCommit.zipWithIndex.foreach { case (b, i) =>
      assert(b < full / 3,
        s"MOR delta ${i + 2} wrote $b metadata bytes vs full=$full — " +
          "the manifest is being rewritten per trickle commit")
    }
    assert(perCommit.max <= 3 * perCommit.min,
      s"per-delta metadata must not grow with table age: $perCommit")
    // compaction is the amortization point: afterwards ONE consolidated
    // segment + one base segment serve the whole table
    val vC = MorTableImpl.compactMor(spark, root, maxFiles = 1, NB)
    assert(vC.contains(K + 2))
    assert(segsOf(root, K + 2).size == 2,
      s"compaction must consolidate metadata: ${segsOf(root, K + 2)}")
    assert(MorTableImpl.readMor(spark, root, K + 2).count() == 400 + K)
  }

  test("MOR auto-bounds its descriptor: 100 deltas, NO compaction config") {
    // A forgotten compaction cadence must not degrade reads linearly:
    // commitAppend itself triggers a full fold when the descriptor it
    // just published crossed autoCompactBound (round-12 minor #2). 100
    // deltas with NO operator-configured compaction — the bound holds at
    // EVERY version, and read planning metadata stays flat, not O(commits).
    val root = java.nio.file.Files.createTempDirectory("mscale_auto").toString
    val nb = 4
    val bound = MorTableImpl.autoCompactBound(nb) // 16 at nb=4
    var maxDesc = 0
    var compactions = 0
    (1 to 100).foreach { i =>
      MorTableImpl.commitAppend(spark, root,
        env(Seq((8L * i, i.toLong % 10L))), nb)
      // observe the CURRENT version's descriptor (after any auto-fold)
      val v = VersionedTableImpl.currentVersion(spark, root)
      val rows = VersionedTableImpl.descriptorDf(spark, root, v).count().toInt
      maxDesc = math.max(maxDesc, rows)
      if (rows == 2 && i > 2) compactions += 1
      assert(rows <= bound + 1,
        s"after delta $i the descriptor carries $rows rows (> bound=$bound" +
          s" + 1) — the auto-compaction trigger is not firing")
    }
    assert(compactions >= 3,
      s"100 deltas past bound=$bound must auto-fold several times: $compactions")
    assert(maxDesc >= bound - 2,
      s"trigger fired far below the bound ($maxDesc) — cadence too hot")
    // reads stay correct through the folds: keys 0..9, each carrying the
    // LAST delta's payload for that key (delta i writes value = 2i; key 0
    // is touched at i = 10, 20, …, 100)
    val state = MorTableImpl.readMor(spark, root,
      VersionedTableImpl.currentVersion(spark, root))
    assert(state.count() == 10)
    import spark.implicits._
    val v0 = state.filter(col("user_id") === 0L)
      .select(col("value")).as[Double].head()
    assert(v0 == 200.0, s"key 0 must carry delta 100's payload: $v0")
  }

  test("descriptor rows stay bounded by live segments <= nBuckets, whatever the commit count") {
    // a segment survives only while SOME bucket's current files live in it
    // (the commit loop masks touched buckets out of carried arrays and
    // drops emptied segments), so the descriptor can never grow past one
    // row per bucket + the fresh commit's row — table AGE never inflates
    // per-version metadata, only table WIDTH (bucket count) does
    val root = java.nio.file.Files.createTempDirectory("mscale_desc").toString
    val K = 3 * NB + 5 // commits >> buckets: age must not show in the bound
    (1 to K).foreach { i =>
      VersionedTableImpl.commitMerge(spark, root,
        env(Seq((8L * i, i.toLong % 16L))), NB) // cycles through buckets
    }
    val rows = (1 to K).map(v =>
      VersionedTableImpl.descriptorDf(spark, root, v).count())
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r <= NB + 1,
        s"v${i + 1} descriptor has $r rows — must stay <= nBuckets+1 = ${NB + 1}")
    }
    // and the final state is intact through the masked carries
    assert(VersionedTableImpl.readVersion(spark, root, K).count() == 16)
  }

  test("vacuum's dead set is a LEFT ANTI plan: file lists never collect to the driver") {
    val root = java.nio.file.Files.createTempDirectory("mscale_vac").toString
    VersionedTableImpl.commitMerge(spark, root,
      env((0L until 64L).map(u => (8L * u, u))), NB)
    VersionedTableImpl.commitMerge(spark, root,
      env((0L until 64L).map(u => (8L * (u + 500L), u))), NB)
    val plan = VersionedTableImpl.vacuumDeadPlan(spark, root,
      keepFrom = 2, graceMs = 0L).get
    val optimized = plan.queryExecution.optimizedPlan.toString
    // the live set joins against the listing; neither side is a collected
    // literal list (pre-round-12 vacuum collected every manifest's files)
    assert(optimized.contains("LeftAnti"),
      s"dead = listing ANTI JOIN live, in the plan:\n$optimized")
    assert(!optimized.contains("IN ("),
      s"no literal file list may appear in the vacuum plan:\n$optimized")
    // the live side reads the manifest SEGMENTS as scans
    assert(plan.queryExecution.executedPlan.toString.contains("_segments"),
      "the live set must be a union-of-segments SCAN")
    // and the plan is the same dead set vacuum would sweep: v1's
    // superseded files (every bucket rewritten by commit 2)
    import spark.implicits._
    val dead = plan.as[String].collect()
    assert(dead.nonEmpty && dead.forall(_.contains("/data/bucket=")),
      s"dead set = superseded data files: ${dead.take(3).toSeq}")
    val swept = VersionedTableImpl.vacuum(spark, root, keepFrom = 2)
    assert(swept.toSet == dead.toSet,
      "executing the plan sweeps exactly the planned dead set")
  }

  test("segment sweep: descriptor-orphaned metadata is reclaimed, live segments kept") {
    val root = java.nio.file.Files.createTempDirectory("mscale_seg").toString
    VersionedTableImpl.commitMerge(spark, root,
      env((0L until 32L).map(u => (8L * u, u))), NB)
    VersionedTableImpl.commitMerge(spark, root,
      env((0L until 32L).map(u => (8L * (u + 500L), u + 100L))), NB)
    val segDir = new org.apache.hadoop.fs.Path(root, "_versions/_segments")
    val fs = segDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def segs(): Set[String] =
      fs.listStatus(segDir).map(_.getPath.getName).toSet
    val live = segs()
    // an ORPHAN segment — a lost commit that crashed before its eager
    // cleanup could run (the window GC exists for)
    val orphan = VersionedTableImpl.writeSegment(spark, root,
      Seq((0L, "file:/nowhere/x.parquet", 1L)).toDF("bucket", "file", "bytes"))
    assert(segs().contains(orphan))
    VersionedTableImpl.vacuum(spark, root, keepFrom = 1, graceMs = 0L)
    assert(!segs().contains(orphan), "orphan segment must be swept")
    assert(live.subsetOf(segs()), "live versions' segments must survive")
    // both versions still read intact through their (kept) segments
    assert(VersionedTableImpl.readVersion(spark, root, 1).count() == 32)
    assert(VersionedTableImpl.readVersion(spark, root, 2).count() == 64)
    // expiring v1 reclaims exactly its unique segments
    VersionedTableImpl.vacuum(spark, root, keepFrom = 2, graceMs = 0L)
    assert(VersionedTableImpl.readVersion(spark, root, 2).count() == 64,
      "the kept version survives the expiry sweep")
  }

  test("vacuum's data listing is paginated: iterator pages, never one full array per dir") {
    spark.sparkContext.hadoopConfiguration.set("fs.pagedfs.impl",
      classOf[graft.fs.PagedListingFileSystem].getName)
    val local = java.nio.file.Files.createTempDirectory("mscale_paged").toString
    val root = s"pagedfs://$local"
    val nb = 2
    // fragment: 64 one-row files over 2 buckets — far past the shim's
    // 7-status page, so an unpaginated listing is observable
    val prevCap = spark.conf.get("spark.sql.files.maxRecordsPerFile", "0")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "1")
    try {
      VersionedTableImpl.commitMerge(spark, root,
        env((0L until 64L).map(u => (8L * u, u))), nb)
      VersionedTableImpl.commitMerge(spark, root,
        env((0L until 64L).map(u => (8L * (100L + u), u))), nb)
    } finally spark.conf.set("spark.sql.files.maxRecordsPerFile", prevCap)
    val deadSet = VersionedTableImpl.manifest(spark, root, 1).count()
    assert(deadSet >= 64, s"v1 must carry a fat dead set: $deadSet")
    graft.fs.PagedListingFileSystem.reset()
    VersionedTableImpl.vacuum(spark, root, keepFrom = 2, graceMs = 0L)
    assert(graft.fs.PagedListingFileSystem.fullListings.get() == 0L,
      "vacuum materialized a full listStatus array over a data bucket dir")
    assert(graft.fs.PagedListingFileSystem.iteratorListings.get() >= nb,
      "vacuum's distributed listing must go through listStatusIterator")
    assert(graft.fs.PagedListingFileSystem.maxBatch.get()
        <= graft.fs.PagedListingFileSystem.PageSize,
      "a listing batch exceeded the page bound")
    // the sweep executed through the paged listing: v2 rewrote every
    // bucket, so ONLY its live files remain on disk afterwards
    assert(VersionedTableImpl.readVersion(spark, root, 2).count() == 64)
    val onDisk = (0 until nb).map { b =>
      new java.io.File(s"$local/data/bucket=$b")
        .listFiles().count(_.getName.endsWith(".parquet"))
    }.sum
    val live = VersionedTableImpl.manifest(spark, root, 2).count()
    assert(onDisk == live,
      s"dead files must be swept through the paged listing: " +
        s"$onDisk on disk vs $live live")
  }

  test("autoRebucket sizes from the manifest: zero per-data-file getFileStatus") {
    spark.sparkContext.hadoopConfiguration.set("fs.countfs.impl",
      classOf[graft.fs.CountingFileSystem].getName)
    val local = java.nio.file.Files.createTempDirectory("mscale_count").toString
    val root = s"countfs://$local"
    VersionedTableImpl.commitMerge(spark, root,
      env((0L until 64L).map(u => (8L * u, u))), 2)
    graft.fs.CountingFileSystem.dataFileStats.set(0L)
    // sizing path with a huge target: measures, decides "healthy", exits —
    // the decision must come from the manifest's bytes column alone
    val none = VersionedTableImpl.autoRebucket(spark, root, Long.MaxValue / 4)
    assert(none.isEmpty)
    assert(graft.fs.CountingFileSystem.dataFileStats.get() == 0L,
      s"sizing must not stat data files: ${graft.fs.CountingFileSystem.dataFileStats.get()} calls")
    // and when it DOES fire, the grown table still never stats data files
    // during sizing (the rewrite itself legitimately reads data)
    val total = VersionedTableImpl.manifest(spark, root, 1)
      .agg(coalesce(sum(col("bytes")), lit(0L))).head.getLong(0)
    assert(total > 0L, "manifest bytes column must be populated")
    graft.fs.CountingFileSystem.dataFileStats.set(0L)
    val grown = VersionedTableImpl.autoRebucket(spark, root,
      math.max(1L, total / 6))
    assert(grown.nonEmpty, "growth must fire against an undersized layout")
    assert(VersionedTableImpl.tableBuckets(spark, root, 0) > 2)
    assert(VersionedTableImpl.readVersion(spark, root,
      VersionedTableImpl.currentVersion(spark, root)).count() == 64)
  }
}
