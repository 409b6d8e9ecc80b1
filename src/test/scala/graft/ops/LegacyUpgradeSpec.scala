package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.CdcSynth

/** The legacy→layered manifest UPGRADE, end to end on BOTH lineages
  * (round-12 "Next round" #3): a table aged into the flat-manifest era —
  * per-file rows committed directly as the version artifact, no
  * `_segments` dir — must keep working when today's commit paths trickle
  * on top of it. The one-time consolidation inside
  * `commitLoop`/`commitAppend` (descriptorPairs → Left(legacy)) converts
  * the carried flat rows into one explicit segment; everything BEFORE the
  * boundary must remain readable, and everything ACROSS it must behave as
  * if the table had been layered all along:
  *
  *  - time travel to pre-upgrade versions (their manifests stay flat);
  *  - change feed spanning the boundary;
  *  - vacuum over the mixed-era history (flat manifests pin their files
  *    inline; layered ones pin through segments);
  *  - final state hash-equal to a one-shot replay of every batch.
  */
class LegacyUpgradeSpec extends SparkSpec {
  import spark.implicits._

  private val NB = 4

  private def env(rows: Seq[(Long, Long)]): DataFrame =
    CdcSynth.envelope(rows.toDF("event_id", "user_id")
      .withColumn("event_type", concat(lit("t"), pmod(col("user_id"), lit(3L))))
      .withColumn("value", col("event_id").cast("double") / 4.0)
      .withColumn("ts", timestamp_millis(lit(1700000000000L) + col("event_id") * 1000L))
      .withColumn("props", concat(lit("{\"k\":"), col("user_id") * 7L, lit("}"))))

  /** Age version v's committed manifest back to the FLAT pre-layering
    * form: resolve the descriptor to per-file rows, drop the layering-era
    * `bytes` column, and commit those rows directly as the version
    * artifact (what rounds ≤ the flat era actually wrote). */
  private def ageToFlat(root: String, v: Int): Unit = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vis = new Path(root, s"_versions/v$v.parquet")
    val flat = VersionedTableImpl.manifest(spark, root, v).drop("bytes")
    assert(flat.columns.contains("file"))
    val tmp = new Path(root, s"_versions/.age-v$v.parquet")
    flat.coalesce(1).write.parquet(tmp.toString)
    fs.delete(vis, true)
    assert(fs.rename(tmp, vis))
  }

  /** Delete the `_segments` dir — a genuinely legacy table never had one,
    * so the upgrade must not depend on any layered leftovers. Only valid
    * once EVERY version is flat. */
  private def dropSegments(root: String): Unit = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(root, "_versions/_segments"), true)
  }

  private def stateSet(df: DataFrame): Set[(Long, Double)] =
    df.select(col("user_id"), col("value")).as[(Long, Double)].collect().toSet

  test("COW: flat-era table trickles through commitLoop; travel/feed/vacuum/replay hold") {
    val root = java.nio.file.Files.createTempDirectory("legacy_cow").toString
    // two REAL commits, then age the whole history to the flat era
    val b1 = env((0L until 32L).map(u => (8L * u, u)))
    val b2 = env((0L until 8L).map(u => (8L * (100L + u), u))) // upsert 0..7
    VersionedTableImpl.commitMerge(spark, root, b1, NB)
    VersionedTableImpl.commitMerge(spark, root, b2, NB)
    ageToFlat(root, 1); ageToFlat(root, 2); dropSegments(root)
    val preV1 = stateSet(VersionedTableImpl.readVersion(spark, root, 1))
    val preV2 = stateSet(VersionedTableImpl.readVersion(spark, root, 2))

    // TRICKLE across the boundary: v3 consolidates the legacy manifest
    // into one explicit segment, v4 is a plain layered commit
    val b3 = env((0L until 8L).map(u => (8L * (200L + u), 8L + u))) // upsert 8..15
    val b4 = env(Seq((8L * 300L, 31L))) // single-key upsert
    assert(VersionedTableImpl.commitMerge(spark, root, b3, NB) == 3)
    assert(VersionedTableImpl.commitMerge(spark, root, b4, NB) == 4)
    assert(VersionedTableImpl.descriptorDf(spark, root, 4)
      .columns.contains("segment"), "post-boundary commits must be layered")

    // TIME TRAVEL: pre-upgrade versions read bit-identical to before
    assert(stateSet(VersionedTableImpl.readVersion(spark, root, 1)) == preV1)
    assert(stateSet(VersionedTableImpl.readVersion(spark, root, 2)) == preV2)

    // CHANGE FEED across the boundary: v2→v4 sees exactly the keys b3/b4
    // touched, with their final payloads
    val feed = VersionedTableImpl.changeFeed(spark, root, 2, 4)
    val fed = feed.select(col("user_id"), col("value_after"))
      .as[(Long, Double)].collect().toMap
    assert(fed.keySet == ((8L until 16L).toSet + 31L), s"feed keys: ${fed.keySet}")
    assert(fed(31L) == (8L * 300L) / 4.0)

    // VACUUM over the mixed-era history: keep everything → all four
    // versions still read; then expire the flat era → layered reads hold
    VersionedTableImpl.vacuum(spark, root, keepFrom = 1, graceMs = 0L)
    assert(stateSet(VersionedTableImpl.readVersion(spark, root, 1)) == preV1)
    VersionedTableImpl.vacuum(spark, root, keepFrom = 3, graceMs = 0L)
    val v4 = stateSet(VersionedTableImpl.readVersion(spark, root, 4))

    // REPLAY: one-shot merge of all four batches equals the trickled state
    val replay = java.nio.file.Files.createTempDirectory("legacy_cow_rp").toString
    VersionedTableImpl.commitMerge(spark, replay,
      b1.unionByName(b2).unionByName(b3).unionByName(b4), NB)
    assert(v4 == stateSet(VersionedTableImpl.readVersion(spark, replay, 1)),
      "trickled-through-upgrade state must equal one-shot replay")
  }

  test("MOR: flat-era table trickles through commitAppend; travel/feed/vacuum/replay hold") {
    val root = java.nio.file.Files.createTempDirectory("legacy_mor").toString
    val b1 = env((0L until 32L).map(u => (8L * u, u)))
    val b2 = env((0L until 8L).map(u => (8L * (100L + u), u)))
    MorTableImpl.commitAppend(spark, root, b1, NB)
    MorTableImpl.commitAppend(spark, root, b2, NB)
    ageToFlat(root, 1); ageToFlat(root, 2); dropSegments(root)
    val preV1 = stateSet(MorTableImpl.readMor(spark, root, 1))
    val preV2 = stateSet(MorTableImpl.readMor(spark, root, 2))

    val b3 = env((0L until 8L).map(u => (8L * (200L + u), 8L + u)))
    val b4 = env(Seq((8L * 300L, 31L)))
    assert(MorTableImpl.commitAppend(spark, root, b3, NB) == 3)
    assert(MorTableImpl.commitAppend(spark, root, b4, NB) == 4)
    assert(VersionedTableImpl.descriptorDf(spark, root, 4)
      .columns.contains("segment"), "post-boundary commits must be layered")

    assert(stateSet(MorTableImpl.readMor(spark, root, 1)) == preV1)
    assert(stateSet(MorTableImpl.readMor(spark, root, 2)) == preV2)

    val fed = MorTableImpl.morChangeFeed(spark, root, 2, 4)
      .select(col("user_id"), col("value_after"))
      .as[(Long, Double)].collect().toMap
    assert(fed.keySet == ((8L until 16L).toSet + 31L), s"feed keys: ${fed.keySet}")

    // compaction AFTER the upgrade folds mixed-era files into one base
    val vC = MorTableImpl.compactMor(spark, root, maxFiles = 0, NB)
    assert(vC.contains(5))
    VersionedTableImpl.vacuum(spark, root, keepFrom = 5, graceMs = 0L)
    val end = stateSet(MorTableImpl.readMor(spark, root, 5))

    val replay = java.nio.file.Files.createTempDirectory("legacy_mor_rp").toString
    MorTableImpl.commitAppend(spark, replay,
      b1.unionByName(b2).unionByName(b3).unionByName(b4), NB)
    assert(end == stateSet(MorTableImpl.readMor(spark, replay, 1)),
      "trickled-through-upgrade state must equal one-shot replay")
  }
}
