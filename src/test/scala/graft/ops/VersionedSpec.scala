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
    val v3Files = spark.read.parquet(s"$root/_versions/v3.parquet")
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
  }
}
