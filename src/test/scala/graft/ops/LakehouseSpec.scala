package graft.ops

import java.io.File

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.CdcSynth

/** Copy-on-write MERGE mechanics that the q179 gate (pure algebra) cannot
  * see: only touched buckets are read (partition pruning) and rewritten
  * (untouched files stay byte-identical on disk), an all-tombstone bucket
  * is deleted rather than left stale, and re-merging the same batch is a
  * no-op (idempotent redelivery).
  */
class LakehouseSpec extends SparkSpec {
  import spark.implicits._

  private val NB = 8

  /** Synthesized envelope for one (event_id, user_id) — op derives from
    * event_id % 8 exactly like CdcSynth (m=0 INSERT, m=2 DELETE, ...). */
  private def env(rows: Seq[(Long, Long)]): DataFrame =
    CdcSynth.envelope(rows.toDF("event_id", "user_id")
      .withColumn("event_type", concat(lit("t"), pmod(col("user_id"), lit(3L))))
      .withColumn("value", col("event_id").cast("double") / 4.0)
      .withColumn("ts", timestamp_millis(lit(1700000000000L) + col("event_id") * 1000L))
      .withColumn("props", concat(lit("{\"k\":"), col("user_id") * 7L, lit("}"))))

  private def table(path: String): DataFrame =
    spark.read.parquet(path).select("user_id", "last_op", "last_seq",
      "event_type", "value", "k").orderBy("user_id")

  private def rows(df: DataFrame): Seq[(Long, String, String, String, Double, Long)] =
    df.as[(Long, String, String, String, Double, Long)].collect().toSeq

  private def fileState(path: String): Map[String, Long] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new File(path)).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> f.lastModified()).toMap
  }

  // INSERTs (m=0) for users 0..15, one per user: event_id = 8*u keeps m=0
  private def baseEnv = env((0L until 16L).map(u => (8L * u, u)))

  test("cowMerge rewrites only touched buckets; untouched files stay on disk") {
    val tmp = java.nio.file.Files.createTempDirectory("cow1").toString
    LakehouseOpsImpl.writeBucketed(
      LakehouseOpsImpl.mergeLatest(
        LakehouseOpsImpl.latestUpdates(baseEnv,
          coalesce(col("image.user_id"), col("oldImage.user_id")),
          col("metadata.stream_sequence_number"))
          .select(col("user_id"), col("ulast.op").as("last_op"),
            col("u_seq").as("last_seq"),
            col("ulast.image.event_type").as("event_type"),
            col("ulast.image.value").as("value"), col("ulast.image.k").as("k"))
          .limit(0), // empty base: build purely from...
        LakehouseOpsImpl.latestUpdates(baseEnv,
          coalesce(col("image.user_id"), col("oldImage.user_id")),
          col("metadata.stream_sequence_number"))).drop("from_base"),
      tmp, NB)
    val before = fileState(tmp)
    // updates touch users 1 and 9 only -> bucket 1 alone
    val up = env(Seq((8L * 100, 1L), (8L * 101, 9L))) // m=0 INSERTs, higher seq
    val touched = LakehouseOpsImpl.cowMerge(spark, tmp, up, NB)
    assert(touched == Seq(1L), s"exactly bucket 1 touched: $touched")
    val after = fileState(tmp)
    val untouchedBefore = before.filterNot(_._1.contains("bucket=1"))
    val untouchedAfter = after.filterNot(_._1.contains("bucket=1"))
    assert(untouchedBefore == untouchedAfter,
      "untouched bucket files must remain the same paths and mtimes")
    // merged state: users 1 and 9 carry the new seq/value, others original
    val got = rows(table(tmp))
    assert(got.size == 16)
    val u1 = got.find(_._1 == 1L).get
    assert(u1._3 == "%020d".format(800L) && u1._5 == 200.0, s"user 1 updated: $u1")
    val u0 = got.find(_._1 == 0L).get
    assert(u0._3 == "%020d".format(0L), s"user 0 untouched: $u0")
  }

  test("cowMerge applies tombstones, deletes an all-dead bucket, and is idempotent") {
    val tmp = java.nio.file.Files.createTempDirectory("cow2").toString
    LakehouseOpsImpl.writeBucketed(
      LakehouseOpsImpl.mergeLatest(
        spark.emptyDataFrame.select(lit(0L).as("user_id"), lit("").as("last_op"),
          lit("").as("last_seq"), lit("").as("event_type"),
          lit(0.0).as("value"), lit(0L).as("k")).limit(0),
        LakehouseOpsImpl.latestUpdates(baseEnv,
          coalesce(col("image.user_id"), col("oldImage.user_id")),
          col("metadata.stream_sequence_number"))).drop("from_base"),
      tmp, NB)
    // DELETE (m=2) both residents of bucket 2 (users 2 and 10), update user 3
    val up = env(Seq((8L * 200 + 2, 2L), (8L * 201 + 2, 10L), (8L * 202, 3L)))
    val touched = LakehouseOpsImpl.cowMerge(spark, tmp, up, NB)
    assert(touched == Seq(2L, 3L))
    assert(!new File(s"$tmp/bucket=2").exists(),
      "bucket with every key tombstoned must be deleted, not left stale")
    val got1 = rows(table(tmp))
    assert(got1.size == 14 && !got1.exists(r => r._1 == 2L || r._1 == 10L))
    // idempotence: same batch again -> byte-identical table state
    LakehouseOpsImpl.cowMerge(spark, tmp, up, NB)
    assert(rows(table(tmp)) == got1, "re-merging the same batch must be a no-op")
  }

  test("compactBuckets collapses multi-file buckets, preserves rows, skips compact buckets") {
    val tmp = java.nio.file.Files.createTempDirectory("cow4").toString
    // one record per file during the bootstrap merge: each bucket holds two
    // users -> two files (the layout parallel write tasks produce at scale)
    val prevConf = spark.conf.get("spark.sql.files.maxRecordsPerFile", "0")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "1")
    try LakehouseOpsImpl.cowMerge(spark, tmp, baseEnv, NB)
    finally spark.conf.set("spark.sql.files.maxRecordsPerFile", prevConf)
    // bucket 1 re-merged at normal file size -> back to a single file
    LakehouseOpsImpl.cowMerge(spark, tmp, env(Seq((8L * 100, 1L), (8L * 101, 9L))), NB)
    val pre = LakehouseOpsImpl.bucketFileCounts(spark, tmp)
    assert(pre(0L) == 2 && pre(1L) == 1, s"bucket 0 split, bucket 1 compact: $pre")
    val before = rows(table(tmp))
    val untouchedBefore = fileState(tmp).filter(_._1.contains("bucket=1"))

    val compacted = LakehouseOpsImpl.compactBuckets(spark, tmp, maxFiles = 1)
    assert(compacted == (0L until NB.toLong).filter(_ != 1L),
      s"every multi-file bucket compacts, the single-file one is skipped: $compacted")
    val post = LakehouseOpsImpl.bucketFileCounts(spark, tmp)
    assert(post.values.forall(_ == 1) && post.keySet == pre.keySet,
      s"one file per bucket after compaction, no bucket lost: $pre -> $post")
    assert(rows(table(tmp)) == before, "compaction must not change row content")
    assert(fileState(tmp).filter(_._1.contains("bucket=1")) == untouchedBefore,
      "buckets under the threshold must keep their files byte-identical")
    // already-compact table: a second pass is a no-op
    assert(LakehouseOpsImpl.compactBuckets(spark, tmp, maxFiles = 1).isEmpty)
  }

  test("clustered compaction yields files with disjoint sort-column ranges") {
    val tmp = java.nio.file.Files.createTempDirectory("cow6").toString
    // two buckets, eight users each; 4-record file cap -> 2 files/bucket
    LakehouseOpsImpl.cowMerge(spark, tmp, baseEnv, 2)
    val prevConf = spark.conf.get("spark.sql.files.maxRecordsPerFile", "0")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "4")
    try LakehouseOpsImpl.compactBuckets(spark, tmp, maxFiles = 0,
      sortCols = Seq("event_type", "user_id"))
    finally spark.conf.set("spark.sql.files.maxRecordsPerFile", prevConf)
    val counts = LakehouseOpsImpl.bucketFileCounts(spark, tmp)
    assert(counts.values.forall(_ == 2), s"two files per bucket: $counts")
    (0L until 2L).foreach { b =>
      val files = new File(s"$tmp/bucket=$b").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      val ranges = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min(col("event_type")), max(col("event_type")),
            min(col("user_id")), max(col("user_id"))).head()
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
      }.sortBy(r => (r._1, r._3))
      // within-bucket sort => consecutive files cover ordered event_type
      // ranges (overlap at most at the boundary value): a predicate on a
      // type below file 2's min or above file 1's max skips a whole file
      ranges.sliding(2).foreach {
        case Array(lo, hi) =>
          assert(lo._2 <= hi._1,
            s"bucket $b file ranges must be ordered on the sort prefix: ${ranges.toSeq}")
        case _ =>
      }
      assert(ranges.head._1 < ranges.last._2,
        s"bucket $b files must not all span the full range: ${ranges.toSeq}")
    }
    // clustering is a pure layout change
    assert(rows(table(tmp)).map(_._1).sorted == (0L until 16L))
  }

  test("cowMerge evolves the table schema when a batch's image grows a column") {
    val tmp = java.nio.file.Files.createTempDirectory("cow5").toString
    LakehouseOpsImpl.cowMerge(spark, tmp, baseEnv, NB) // bootstrap, 6-col schema
    // the next batch's CDC image carries a NEW field: an image URL column
    // (the multimodal case — old rows must null-fill it)
    val grown = env(Seq((8L * 100, 1L), (8L * 104, 17L)))
      .withColumn("image", when(col("image").isNotNull,
        col("image").withField("img_url",
          concat(lit("s3://img/"), col("image.user_id")))))
    LakehouseOpsImpl.cowMerge(spark, tmp, grown, NB)
    val t = LakehouseOpsImpl.readTable(spark, tmp)
    assert(t.columns.contains("img_url"), s"union schema: ${t.columns.toSeq}")
    val byUser = t.select(col("user_id"), col("img_url"), col("value"))
      .as[(Long, Option[String], Double)].collect().map(r => r._1 -> r).toMap
    assert(byUser.size == 17, "16 original users + inserted user 17")
    assert(byUser(1L)._2.contains("s3://img/1") && byUser(1L)._3 == 200.0,
      s"updated row carries the new column: ${byUser(1L)}")
    assert(byUser(17L)._2.contains("s3://img/17"), "new-schema insert")
    assert(byUser(0L)._2.isEmpty, "pre-evolution row null-fills the new column")
    // a third OLD-schema batch merges cleanly into the evolved table and
    // null-fills the column it does not carry (full-image semantics)
    LakehouseOpsImpl.cowMerge(spark, tmp, env(Seq((8L * 105, 1L))), NB)
    val afterOld = LakehouseOpsImpl.readTable(spark, tmp)
      .filter(col("user_id") === 1L).select(col("img_url"), col("value"))
      .as[(Option[String], Double)].head()
    assert(afterOld._1.isEmpty && afterOld._2 == 210.0,
      s"old-schema full image overwrites -> img_url null: $afterOld")
  }

  test("point lookup prunes to the keys' buckets and pushes the key predicate") {
    val tmp = java.nio.file.Files.createTempDirectory("cow7").toString
    LakehouseOpsImpl.cowMerge(spark, tmp, baseEnv, NB)
    // keys 3 and 11 both live in bucket 3 -> exactly one bucket scanned
    val got = LakehouseOpsImpl.lookup(spark, tmp, Seq(3L, 11L), NB)
    got.collect()
    val scan = got.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("expected a FileSourceScanExec leaf"))
    val bucket3Files = fileState(tmp).keys.count(_.contains("bucket=3"))
    assert(scan.metrics("numFiles").value == bucket3Files,
      s"lookup must open only bucket 3's files: ${scan.metrics("numFiles").value}")
    val pushed = scan.toString
    assert(pushed.contains("In(user_id"),
      s"key predicate must push to the parquet footers:\n$pushed")
    assert(got.count() == 2)
  }

  test("cowMerge read is partition-pruned to the touched buckets") {
    val tmp = java.nio.file.Files.createTempDirectory("cow3").toString
    LakehouseOpsImpl.writeBucketed(
      LakehouseOpsImpl.mergeLatest(
        spark.emptyDataFrame.select(lit(0L).as("user_id"), lit("").as("last_op"),
          lit("").as("last_seq"), lit("").as("event_type"),
          lit(0.0).as("value"), lit(0L).as("k")).limit(0),
        LakehouseOpsImpl.latestUpdates(baseEnv,
          coalesce(col("image.user_id"), col("oldImage.user_id")),
          col("metadata.stream_sequence_number"))).drop("from_base"),
      tmp, NB)
    val pruned = spark.read.parquet(tmp).filter(col("bucket").isin(1L))
    val s = pruned.queryExecution.executedPlan.toString
    assert(s.contains("PartitionFilters: [isnotnull(bucket") ||
      s.contains("PartitionFilters: [bucket"),
      s"bucket filter must prune partitions, not scan+filter:\n$s")
    // inputFiles reports the relation pre-pruning; the executed scan's
    // numFiles metric shows what was actually opened
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("expected a FileSourceScanExec leaf"))
    val bucket1Files = fileState(tmp).keys.count(_.contains("bucket=1"))
    assert(scan.metrics("numFiles").value == bucket1Files,
      s"scan must open only bucket=1's $bucket1Files file(s), " +
        s"opened ${scan.metrics("numFiles").value}")
  }
}
