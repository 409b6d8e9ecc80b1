package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.cdc.CdcSynth
import graft.ops.MorTableImpl

/** Stream-table enrichment contract: every micro-batch record picks up
  * the table state for its key through the bucket-pruned serving read —
  * known keys get the table's value, unknown keys get nulls, and the
  * state read matches what a direct readMor would have served. */
class EnrichSpec extends SparkSpec {
  import spark.implicits._

  private val NB = 8

  private def events(ids: Seq[Int]) = ids.map { i =>
    LkEvent(i.toLong, (i % 17).toLong, s"t${i % 3}", i / 4.0,
      new Timestamp(1700000000000L + i * 1000L), s"""{"k":${(i % 17) * 7}}""")
  }

  test("micro-batches enrich with current table state; misses are null") {
    val root = Files.createTempDirectory("graft_enrich").toString
    // table state: users 0..16 (ids 0..67 cover them all)
    MorTableImpl.commitAppend(spark,
      root, CdcSynth.envelope(events(0 until 68).toDF()), NB)
    val expectedState = MorTableImpl.readMor(spark, root, 1)
      .select($"user_id", $"value", $"last_seq")
      .as[(Long, Double, String)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap

    val outDir = Files.createTempDirectory("graft_enrich_out").toString
    val ckpt = Files.createTempDirectory("graft_enrich_ckpt").toString
    // the "stream": fresh events for users 0..24 — 17..24 are NOT in the
    // table (user_id = i % 17 caps table keys at 16)
    val probes = (0 until 25).map(u => LkEvent(1000L + u, u.toLong, "t0", 1.0,
      new Timestamp(1700009000000L), """{"k":0}"""))
    val input = MemoryStream[LkEvent](spark)
    input.addData(probes: _*)
    CdcSynth.envelope(input.toDF()).writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        Enrich.withMorState(batch, root, NB)
          .select(coalesce(col("image.user_id"), col("oldImage.user_id")).as("uid"),
            col("state_value"), col("state_last_seq"))
          .write.mode("overwrite").parquet(s"$outDir/epoch=$id")
        ()
      }
      .start().awaitTermination()

    val got = spark.read.parquet(outDir)
      .select($"uid", $"state_value", $"state_last_seq")
      .as[(Long, Option[Double], Option[String])].collect()
    assert(got.length == probes.length)
    got.foreach { case (uid, v, seq) =>
      expectedState.get(uid) match {
        case Some((ev, eseq)) =>
          assert(v.contains(ev) && seq.contains(eseq),
            s"key $uid must enrich with table state ($ev, $eseq), got ($v, $seq)")
        case None =>
          assert(v.isEmpty && seq.isEmpty,
            s"unknown key $uid must enrich to nulls, got ($v, $seq)")
      }
    }
  }
}
