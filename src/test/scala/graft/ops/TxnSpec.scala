package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.CdcSynth

/** Cross-table transaction mechanics the q232 gate (state equality of the
  * published tables) cannot see: the record is the commit point — a crash
  * BEFORE it leaves nothing visible anywhere (and aborts cleanly), a crash
  * AFTER it rolls forward to all-visible via recovery, idempotently.
  */
class TxnSpec extends SparkSpec {
  import spark.implicits._

  private val NB = 8

  private def env(rows: Seq[(Long, Long)]): DataFrame =
    CdcSynth.envelope(rows.toDF("event_id", "user_id")
      .withColumn("event_type", concat(lit("t"), pmod(col("user_id"), lit(3L))))
      .withColumn("value", col("event_id").cast("double") / 4.0)
      .withColumn("ts", timestamp_millis(lit(1700000000000L) + col("event_id") * 1000L))
      .withColumn("props", concat(lit("{\"k\":"), col("user_id") * 7L, lit("}"))))

  private def users(df: DataFrame): Map[Long, Double] =
    df.select(col("user_id"), col("value"))
      .as[(Long, Double)].collect().toMap

  test("commitTxn: both tables publish, the record is consumed, states equal direct commits") {
    val (a, b) = (Files.createTempDirectory("txn_a").toString,
      Files.createTempDirectory("txn_b").toString)
    val txd = Files.createTempDirectory("txn_d").toString
    val batchA = env((0L until 10L).map(u => (8L * u, u)))
    val batchB = env((0L until 5L).map(u => (8L * (u + 20), u)))

    val done = VersionedTableImpl.commitTxn(spark, txd,
      Seq((a, batchA, NB), (b, batchB, NB)))
    assert(done == Seq(a -> 1, b -> 1))
    assert(VersionedTableImpl.currentVersion(spark, a) == 1)
    assert(VersionedTableImpl.currentVersion(spark, b) == 1)
    assert(users(VersionedTableImpl.readVersion(spark, a, 1)).size == 10)
    assert(users(VersionedTableImpl.readVersion(spark, b, 1)).size == 5)
    // the record was consumed; recovery finds nothing
    assert(VersionedTableImpl.recoverTxns(spark, txd) == 0)

    // direct-commit equivalence: a table given the same batch outside any
    // transaction reaches the identical state
    val c = Files.createTempDirectory("txn_c").toString
    VersionedTableImpl.commitMerge(spark, c, batchA, NB)
    assert(users(VersionedTableImpl.readVersion(spark, a, 1)) ==
      users(VersionedTableImpl.readVersion(spark, c, 1)))
  }

  test("crash AFTER the record rolls forward: recovery publishes every pending, idempotently") {
    val (a, b) = (Files.createTempDirectory("txn_ra").toString,
      Files.createTempDirectory("txn_rb").toString)
    val txd = Files.createTempDirectory("txn_rd").toString
    // simulate commitTxn dying between the record create and the
    // publishes: stage both pendings by hand, write the record, stop
    val va = VersionedTableImpl.commitMerge(spark, a,
      env((0L until 8L).map(u => (8L * u, u))), NB, pendingStage = true)
    val vb = VersionedTableImpl.commitMerge(spark, b,
      env((0L until 4L).map(u => (8L * (u + 30) + 1, u))), NB, pendingStage = true)
    val fs = new org.apache.hadoop.fs.Path(txd)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rec = new org.apache.hadoop.fs.Path(txd, "txn-crashed")
    val out = fs.create(rec, false)
    out.write(s"$a\t$va\n$b\t$vb".getBytes("UTF-8")); out.close()

    // nothing is visible yet — the crash left only pendings + the record
    assert(VersionedTableImpl.currentVersion(spark, a) == 0)
    assert(VersionedTableImpl.currentVersion(spark, b) == 0)

    // recovery rolls FORWARD
    assert(VersionedTableImpl.recoverTxns(spark, txd) == 1)
    assert(VersionedTableImpl.currentVersion(spark, a) == 1)
    assert(VersionedTableImpl.currentVersion(spark, b) == 1)
    assert(users(VersionedTableImpl.readVersion(spark, a, 1)).size == 8)
    assert(users(VersionedTableImpl.readVersion(spark, b, 1)).size == 4)
    // idempotent re-run (the crash-during-recovery case)
    assert(VersionedTableImpl.recoverTxns(spark, txd) == 0)
    assert(VersionedTableImpl.currentVersion(spark, a) == 1)
  }

  test("crash BEFORE the record aborts: nothing visible, abort releases, vacuum reclaims") {
    val a = Files.createTempDirectory("txn_aa").toString
    val va = VersionedTableImpl.commitMerge(spark, a,
      env((0L until 6L).map(u => (8L * u, u))), NB, pendingStage = true)
    assert(VersionedTableImpl.currentVersion(spark, a) == 0,
      "a staged pending must be invisible")

    VersionedTableImpl.abortTxn(spark, Seq(a -> va))
    // the version number is free again: a direct commit takes v1
    assert(VersionedTableImpl.commitMerge(spark, a,
      env((0L until 3L).map(u => (8L * (u + 50), u))), NB) == 1)
    assert(users(VersionedTableImpl.readVersion(spark, a, 1)).size == 3)
    // the aborted staging's moved files are unreferenced -> reclaimed
    val swept = VersionedTableImpl.vacuum(spark, a, keepFrom = 1)
    assert(swept.nonEmpty, "aborted staged files must be vacuum-eligible")
    assert(users(VersionedTableImpl.readVersion(spark, a, 1)).size == 3,
      "vacuum must not touch the committed state")
  }
}
