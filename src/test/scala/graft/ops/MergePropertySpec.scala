package graft.ops

import scala.util.Random

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.CdcSynth

/** Algebraic properties of the MERGE fold that make the lakehouse paths
  * safe to run incrementally, in parallel, and under redelivery —
  * deterministic seeded generation (the scalatest/scalacheck bridge isn't
  * in the offline dependency cache):
  *
  *  1. batch-split invariance: folding a log in ANY contiguous batching
  *     equals the one-shot replay (what licenses micro-batch streaming);
  *  2. redelivery idempotence: folding any batch twice changes nothing
  *     (what licenses at-least-once delivery);
  *  3. shard commutativity: folding key-disjoint batches in either order
  *     gives the same state (two shards racing is safe — the reference's
  *     delivery model orders per key/shard, not across shards). NOTE the
  *     stronger property — arbitrary cross-batch reorder of the SAME
  *     key — is deliberately NOT claimed: once a tombstone wins, the
  *     deleted row carries no last_seq, so a stale earlier upsert would
  *     re-insert; that is exactly why CDC delivery guarantees per-key
  *     order and why the sinks fold batches in stream order.
  */
class MergePropertySpec extends SparkSpec {
  import spark.implicits._

  private def env(rows: Seq[(Long, Long)]): DataFrame =
    CdcSynth.envelope(rows.toDF("event_id", "user_id")
      .withColumn("event_type", concat(lit("t"), pmod(col("user_id"), lit(3L))))
      .withColumn("value", col("event_id").cast("double") / 4.0)
      .withColumn("ts", timestamp_millis(lit(1700000000000L) + col("event_id") * 1000L))
      .withColumn("props", concat(lit("{\"k\":"), col("user_id") * 7L, lit("}"))))

  private def emptyBase: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      LakehouseOpsImpl.tableSchema)

  private def fold(base: DataFrame, batch: Seq[(Long, Long)]): DataFrame =
    LakehouseOpsImpl.mergeLatest(base,
      LakehouseOpsImpl.latestUpdates(env(batch),
        coalesce(col("image.user_id"), col("oldImage.user_id")),
        col("metadata.stream_sequence_number")))
      .drop("from_base")

  private def state(df: DataFrame): Seq[(Long, String, String, String, Double, Long)] =
    df.select(col("user_id"), col("last_op"), col("last_seq"),
      col("event_type"), col("value"), col("k"))
      .as[(Long, String, String, String, Double, Long)].collect().toSeq.sorted

  test("merge fold: batch-split invariance, redelivery idempotence, reorder tolerance") {
    val rng = new Random(7)
    (1 to 5).foreach { trial =>
      // a log with heavy key reuse so ops genuinely collide
      val log = (0 until 60).map { i =>
        (i.toLong * (1 + rng.nextInt(7)) + i, rng.nextInt(9).toLong)
      }.distinct.sortBy(_._1)
      val oneShot = state(fold(emptyBase, log))

      // 1. arbitrary contiguous batching
      val cut1 = 1 + rng.nextInt(log.size - 2)
      val cut2 = cut1 + 1 + rng.nextInt(log.size - cut1 - 1)
      val folded = state(fold(fold(fold(emptyBase,
        log.slice(0, cut1)), log.slice(cut1, cut2)), log.slice(cut2, log.size)))
      assert(folded == oneShot, s"trial $trial: batched fold must equal one-shot")

      // 2. redelivery of the middle batch is a no-op
      val redelivered = state(fold(fold(fold(fold(emptyBase,
        log.slice(0, cut1)), log.slice(cut1, cut2)), log.slice(cut1, cut2)),
        log.slice(cut2, log.size)))
      assert(redelivered == oneShot, s"trial $trial: redelivery must be a no-op")

      // 3. key-disjoint "shards" fold in either order
      val (shardA, shardB) = log.partition(_._2 % 2 == 0)
      val ab = state(fold(fold(emptyBase, shardA), shardB))
      val ba = state(fold(fold(emptyBase, shardB), shardA))
      assert(ab == ba && ab == oneShot,
        s"trial $trial: key-disjoint shard folds must commute")
    }
  }
}
