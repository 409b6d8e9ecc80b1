package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cdc.CdcSynth

/** MULTI-WRITER VALIDATION WORKER: one OS process = one independent writer
  * committing `batches` CDC batches to the versioned table at `root`
  * through the standard claim protocol. Each worker owns a disjoint key
  * range (`1000 * workerId + 100 * batch + i`), so the one-shot expected
  * state is the union of every worker's batches regardless of commit
  * interleaving.
  *
  * This is the cross-PROCESS leg of the concurrency story: every in-suite
  * race spec shares one JVM and one cached Hadoop `FileSystem` instance,
  * which can mask atomicity assumptions; separate processes exercise the
  * protocol against the filesystem itself — the analogue of the
  * reference's independently-scheduled KCL workers coordinating through
  * the DynamoDB lease table (KCLScheduler.java:101-125).
  *
  * Usage: `CommitWorker <tableRoot> <nBuckets> <workerId> <nBatches>`.
  * Exits 0 when every batch committed; any lost-claim exhaustion or
  * protocol violation escapes as a non-zero exit for the harness to catch.
  */
object CommitWorker {
  def main(args: Array[String]): Unit = {
    val Array(root, nbS, idS, batchesS) = args.take(4)
    val (nb, id, batches) = (nbS.toInt, idS.toInt, batchesS.toInt)
    val builder = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-commit-worker-$id")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // an objstore:// root points at the test shim (non-atomic renames,
    // conditional PUTs) — present on the spawning suite's classpath; wired
    // by NAME so this main-side tool carries no test-code dependency
    if (root.startsWith("objstore:"))
      builder.config("spark.hadoop.fs.objstore.impl",
        "graft.fs.ObjectStoreFileSystem")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    (0 until batches).foreach { j =>
      val base = 1000L * id + 100L * j
      val rows = (0L until 10L).map(i => (8L * (base + i), base + i))
      val env = CdcSynth.envelope(rows.toDF("event_id", "user_id")
        .withColumn("event_type", concat(lit("t"), pmod(col("user_id"), lit(3L))))
        .withColumn("value", col("event_id").cast("double") / 4.0)
        .withColumn("ts",
          timestamp_millis(lit(1700000000000L) + col("event_id") * 1000L))
        .withColumn("props", concat(lit("{\"k\":"), col("user_id") * 7L, lit("}"))))
      val v = graft.ops.VersionedTableImpl.commitMerge(spark, root, env, nb,
        maxAttempts = 30, staleClaimMs = 15000L)
      println(s"[worker $id] batch $j committed as v$v")
    }
    spark.stop()
  }
}
