package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.cdc.CdcSynth

/** Dead-letter quarantine contract: failing records are ROUTED with the
  * rules they broke (not dropped), passing records flow to the inner
  * sink, nothing is counted twice, and a replayed epoch rewrites its own
  * dead letters instead of duplicating them. */
class QuarantineSpec extends SparkSpec {
  import spark.implicits._

  // value = i/4 - 5 → ids 0..19 give negatives for i < 20
  private def events(ids: Seq[Int]) = ids.map { i =>
    LkEvent(i.toLong, (i % 17).toLong, s"t${i % 3}", i / 4.0 - 5.0,
      new Timestamp(1700000000000L + i * 1000L), s"""{"k":${(i % 17) * 7}}""")
  }

  private val rules = Seq(
    // image.value must be non-negative; a tombstone (null image) has no
    // value to check — null predicate = FAIL (fail-closed), which makes
    // delete envelopes quarantine under this rule set on purpose
    "value_non_negative" -> (col("image.value") >= 0.0),
    "seq_present" -> col("metadata.stream_sequence_number").isNotNull)

  test("failing records are routed with their rules; replay rewrites, not duplicates") {
    val all = events(0 until 120)
    val dlq = Files.createTempDirectory("graft_dlq").toString
    val okDir = Files.createTempDirectory("graft_dlq_ok").toString
    val ckpt = Files.createTempDirectory("graft_dlq_ckpt").toString

    val inner: Sinks.BatchSink = (batch, id) =>
      batch.write.mode("overwrite").parquet(s"$okDir/epoch=$id")
    def drain(input: MemoryStream[LkEvent]): Unit =
      CdcSynth.envelope(input.toDF()).writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch(Quarantine.sink(dlq, rules)(inner))
        .start().awaitTermination()

    val input = MemoryStream[LkEvent](spark)
    input.addData(all.slice(0, 70): _*)
    drain(input)
    input.addData(all.slice(70, 120): _*)
    drain(input)

    val ok = spark.read.parquet(okDir)
    val bad = spark.read.parquet(dlq)
    // conservation: every envelope landed exactly once, on one side
    assert(ok.count() + bad.count() == all.size,
      s"split must conserve records: ${ok.count()} + ${bad.count()} != ${all.size}")
    assert(ok.join(bad, Seq("event_id"), "inner").count() == 0,
      "no record may land on both sides")
    // the failing side knows why: negative values and imageless envelopes
    val reasons = bad.select(col("event_id"), col("failed_rules"))
      .as[(Long, Seq[String])].collect().toMap
    assert(reasons.values.forall(_.contains("value_non_negative")))
    val negWithImage = bad.filter(col("image").isNotNull &&
      col("image.value") < 0.0).count()
    assert(negWithImage > 0, "expected some genuinely negative-value records")
    // passing side is clean
    assert(ok.filter(col("image.value") < 0.0).count() == 0)
    assert(ok.filter(col("image").isNull).count() == 0,
      "imageless envelopes fail the null-predicate rule (fail-closed)")

    // replay: a second drain of an already-drained stream rewrites the
    // same epochs — dead-letter volume must not grow
    val badBefore = bad.count()
    drain(input)
    assert(spark.read.parquet(dlq).count() == badBefore,
      "a replayed/idle drain must not duplicate dead letters")
  }

  test("config-driven: filter-action=quarantine routes JEXL failures to the dead letter") {
    val tmp = Files.createTempDirectory("graft_dlq_cli").toString
    val (logDir, outDir, confPath) = (s"$tmp/log", s"$tmp/out", s"$tmp/conf.hocon")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(confPath),
      """keyspaces-cdc-streams.stream {
        |  source = shardlog
        |  filter-expression = "newImage != null && (newImage.value ?: 0) >= 0"
        |  connector {
        |    sink = file
        |    filter-action = quarantine
        |    record-format = new-image
        |    partition-keys = "user_id"
        |  }
        |}""".stripMargin)
    val rows = events(0 until 80)
    val env = CdcSynth.envelope(rows.toDF())
    val shard = pmod(coalesce(col("image.user_id"), col("oldImage.user_id")), lit(4L))
    graft.sources.ShardLog.record(env, logDir, shard)
    graft.StreamMain.run(spark, confPath, logDir, outDir)

    val kept = spark.read.json(s"$outDir/data")
    val dead = spark.read.parquet(s"$outDir/deadletter")
    assert(kept.count() + dead.count() == rows.size,
      s"quarantine must conserve records: ${kept.count()} + ${dead.count()}")
    assert(dead.count() > 0 && kept.count() > 0)
    // dead letters keep FULL envelope fidelity even under new-image format
    assert(dead.columns.contains("oldImage") && dead.columns.contains("failed_rules"))
    assert(dead.filter(col("image.value") >= 0.0).count() == 0,
      "no passing record may be quarantined")
  }
}
