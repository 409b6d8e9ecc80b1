package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.CdcSynth

/** Round-13 advisory (medium): `readManifest`'s lenient scan
  * (`ignoreMissingFiles`) trades the loud FileNotFound abort for silent
  * row loss when a LIVE file vanishes — fine under a legal vacuum (which
  * never deletes retained versions' files), dangerous under a
  * misconfigured retention or an external deletion. The strict gate
  * (`spark.graft.read.strictMissingFiles=true`) gives auditors and
  * backfills fail-loud semantics back: the manifest's live file list is
  * existence-checked (distributed) before the scan, and the scan itself
  * keeps FNF aborts.
  *
  * Also pins [[VersionedTableImpl.sweepStranded]]: crashed-writer staging
  * dirs and mid-commit tmp descriptors are exactly the garbage a store
  * failure strands (the `finally` delete itself can fail), vacuum's
  * grace-0 single-writer cadence must NOT sweep them (it would kill a
  * racing writer mid-commit), so the sweep is a separate age-gated call.
  */
class ReadSafetySpec extends SparkSpec {
  import spark.implicits._

  private val NB = 4

  private def env(rows: Seq[(Long, Long)]): DataFrame =
    CdcSynth.envelope(rows.toDF("event_id", "user_id")
      .withColumn("event_type", concat(lit("t"), pmod(col("user_id"), lit(3L))))
      .withColumn("value", col("event_id").cast("double") / 4.0)
      .withColumn("ts", timestamp_millis(lit(1700000000000L) + col("event_id")))
      .withColumn("props", concat(lit("{\"k\":"), col("user_id") * 7L, lit("}"))))

  test("strict read fails loud on an erroneously deleted live file; lenient read silently drops its rows") {
    val root = java.nio.file.Files.createTempDirectory("strict_read").toString
    VersionedTableImpl.commitMerge(spark, root,
      env((1L to 40L).map(i => (8L * i, i))), NB)
    val v = VersionedTableImpl.currentVersion(spark, root)
    val full = VersionedTableImpl.readVersion(spark, root, v).count()
    assert(full == 40L)

    // erroneous deletion of one LIVE file (not a vacuum — a bug or a human)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val victim = VersionedTableImpl.manifest(spark, root, v)
      .select(col("file")).as[String].collect().sorted.head
    assert(fs.delete(new Path(victim), false))

    // lenient default: the read SUCCEEDS with silently fewer rows —
    // documented behavior, and exactly why the strict gate exists
    val lenient = VersionedTableImpl.readVersion(spark, root, v).count()
    assert(lenient < full && lenient > 0)

    spark.conf.set("spark.graft.read.strictMissingFiles", "true")
    try {
      val e = intercept[IllegalStateException] {
        VersionedTableImpl.readVersion(spark, root, v).count()
      }
      assert(e.getMessage.contains("missing from the store") &&
        e.getMessage.contains(new Path(victim).getName),
        s"strict error must name the missing file: ${e.getMessage}")
    } finally spark.conf.unset("spark.graft.read.strictMissingFiles")

    // strict mode on an INTACT table reads normally
    spark.conf.set("spark.graft.read.strictMissingFiles", "true")
    try {
      val root2 = java.nio.file.Files.createTempDirectory("strict_ok").toString
      VersionedTableImpl.commitMerge(spark, root2,
        env((1L to 10L).map(i => (8L * i, i))), NB)
      assert(VersionedTableImpl.readVersion(spark, root2, 1).count() == 10L)
    } finally spark.conf.unset("spark.graft.read.strictMissingFiles")
  }

  test("sweepStranded removes aged crashed-writer garbage only") {
    val root = java.nio.file.Files.createTempDirectory("sweep_stranded").toString
    VersionedTableImpl.commitMerge(spark, root,
      env(Seq((8L, 1L), (16L, 2L))), NB)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

    // a crashed writer's staging dir (with a child), an orphaned tmp
    // descriptor, and a takeover aside — all OLD
    val oldStaging = new Path(root, ".v_staging_deadbeef")
    fs.mkdirs(new Path(oldStaging, "bucket=0"))
    fs.create(new Path(oldStaging, "bucket=0/part-0.parquet"), true).close()
    val oldTmp = new Path(root, "_versions/.tmp-deadbeef.parquet")
    fs.create(oldTmp, true).close()
    val oldAside = new Path(root, "_versions/.dead-claim-v9-deadbeef")
    fs.create(oldAside, true).close()
    val past = System.currentTimeMillis() - 60000L
    Seq(new Path(oldStaging, "bucket=0/part-0.parquet"),
      new Path(oldStaging, "bucket=0"), oldStaging, oldTmp, oldAside)
      .foreach(p => fs.setTimes(p, past, past))

    // a FRESH staging dir — a live writer mid-commit — must survive
    val fresh = new Path(root, ".mor_staging_live")
    fs.mkdirs(fresh)
    fs.create(new Path(fresh, "part-0.parquet"), true).close()

    val swept = VersionedTableImpl.sweepStranded(spark, root,
      olderThanMs = 30000L)
    assert(swept.size == 3, s"expected 3 sweeps, got: $swept")
    assert(!fs.exists(oldStaging) && !fs.exists(oldTmp) && !fs.exists(oldAside))
    assert(fs.exists(fresh), "a fresh (possibly live) staging dir was swept")
    // the table is untouched
    assert(VersionedTableImpl.readVersion(spark, root, 1).count() == 2L)

    // age everything out: the fresh dir goes too at threshold 0
    val swept2 = VersionedTableImpl.sweepStranded(spark, root, olderThanMs = 0L)
    assert(swept2.size == 1 && !fs.exists(fresh))
  }
}
