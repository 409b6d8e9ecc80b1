package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cdc.CdcSynth
import graft.ops.{LakehouseOpsImpl, MorTableImpl, VersionedTableImpl}

/** Measured evidence for the COW/MOR trade (SCALE.md "COW vs MOR"): build
  * both table flavors from the same bootstrap log, then apply the same
  * TRICKLE of small CDC batches to each and record per-commit and
  * read-back wall times. The claim under test: MOR trickle commits are
  * O(batch) while COW trickle commits rewrite every touched bucket — so
  * the gap widens with table size but shows already at sf0.1 — and the
  * read-back gap (MOR's latest-per-key fold) is what compaction buys
  * back. Emits one JSON line + bench/mor_vs_cow.json. */
object MorCowBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${Cpus(default = 32)}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val NB = 32
    val Trickles = 12
    val env = CdcSynth.fromEvents(spark, sfDir)
    val mx = Tables(spark, sfDir, "events")
      .agg(max(col("event_id"))).head.getLong(0)
    val bootstrapCut = mx - Trickles * 64L
    val cowRoot = java.nio.file.Files.createTempDirectory("bench_cow").toString
    val morRoot = java.nio.file.Files.createTempDirectory("bench_mor").toString

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // identical bootstrap state for both flavors
    val boot = env.filter(col("event_id") < bootstrapCut)
    val bootCow = time(VersionedTableImpl.commitMerge(spark, cowRoot, boot, NB))
    val bootMor = time(MorTableImpl.commitAppend(spark, morRoot, boot, NB))

    // the same trickle: small consecutive slices of the log tail; the
    // LAST slice is open-ended so event_id == mx is replayed too (a
    // half-open [lo, lo+64) chain would silently drop the final event)
    val slices = (0 until Trickles).map { i =>
      val lo = bootstrapCut + i * 64L
      if (i == Trickles - 1) env.filter(col("event_id") >= lo)
      else env.filter(col("event_id") >= lo && col("event_id") < lo + 64L)
    }
    val cowCommits = slices.map(b =>
      time(VersionedTableImpl.commitMerge(spark, cowRoot, b, NB)))
    val morCommits = slices.map(b =>
      time(MorTableImpl.commitAppend(spark, morRoot, b, NB)))

    val vCow = VersionedTableImpl.currentVersion(spark, cowRoot)
    val vMor = VersionedTableImpl.currentVersion(spark, morRoot)
    val readCow = time(
      VersionedTableImpl.readVersion(spark, cowRoot, vCow).count())
    val readMorRaw = time(MorTableImpl.readMor(spark, morRoot, vMor).count())
    val compact = time(MorTableImpl.compactMor(spark, morRoot, 4, NB))
    val readMorCompacted = time(MorTableImpl.readMor(spark, morRoot,
      VersionedTableImpl.currentVersion(spark, morRoot)).count())

    // the two flavors must agree on the state they reached
    val a = VersionedTableImpl.readVersion(spark, cowRoot, vCow)
      .select("user_id", "last_seq").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val b = MorTableImpl.readMor(spark, morRoot,
        VersionedTableImpl.currentVersion(spark, morRoot))
      .select("user_id", "last_seq").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    require(a.sameElements(b), "COW and MOR diverged on the same log")

    def arr(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    val line =
      f"""{"bench":"mor_vs_cow","sf":"$sfDir","n_buckets":$NB,"trickles":$Trickles,
         |"bootstrap_cow_sec":$bootCow%.3f,"bootstrap_mor_sec":$bootMor%.3f,
         |"cow_trickle_sec":${arr(cowCommits)},"mor_trickle_sec":${arr(morCommits)},
         |"cow_trickle_total":${cowCommits.sum}%.3f,"mor_trickle_total":${morCommits.sum}%.3f,
         |"read_cow_sec":$readCow%.3f,"read_mor_uncompacted_sec":$readMorRaw%.3f,
         |"compact_sec":$compact%.3f,"read_mor_compacted_sec":$readMorCompacted%.3f}"""
        .stripMargin.replace("\n", "")
    println(line)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench/mor_vs_cow.json"), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write: ${e.getMessage}") }
    spark.stop()
  }
}
