package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.{SparkSpec, Tables}

/** Stream-equals-batch for cluster MEMBERSHIP: the component map folded
  * forward per micro-batch (with a mid-stream restart from checkpoint)
  * must equal the q46-machinery batch rebuild over the same pair set —
  * so mid-stream dedup decisions read the same clusters a batch job
  * would compute afterwards. */
class StreamComponentsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def mapRows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("id"), col("comp")).as[(Long, Long)].collect().toSet

  test("stream-folded components equal the batch rebuild, across a restart") {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().sortBy(_._1).toSeq
    val batches = docs.grouped((docs.size + 2) / 3).toSeq
    assert(batches.size == 3)

    val mapRoot = Files.createTempDirectory("graft_scc_map").toString
    val ckpt = Files.createTempDirectory("graft_scc_ckpt").toString

    // batch 1, then STOP — restart must resume from the checkpoint
    val input = MemoryStream[(Long, String)](spark)
    input.addData(batches(0): _*)
    StreamComponents.run(
      StreamDedup.candidatePairs(input.toDS()).toDF(),
      mapRoot, ckpt).awaitTermination()
    val afterFirst = mapRows(StreamComponents.latestMap(spark, mapRoot))

    // restart: remaining batches drain through the SAME checkpoint
    input.addData(batches(1): _*)
    input.addData(batches(2): _*)
    StreamComponents.run(
      StreamDedup.candidatePairs(input.toDS()).toDF(),
      mapRoot, ckpt).awaitTermination()

    // an idle re-run folds nothing new and leaves the map unchanged
    val beforeIdle = mapRows(StreamComponents.latestMap(spark, mapRoot))
    StreamComponents.run(
      StreamDedup.candidatePairs(input.toDS()).toDF(),
      mapRoot, ckpt).awaitTermination()
    val got = mapRows(StreamComponents.latestMap(spark, mapRoot))
    assert(got == beforeIdle, "idle drain must not change the map")

    // reference: the q46 batch machinery over the batch LSH pair set
    val batchPairs = graft.ops.DedupOpsImpl.minhashLsh(spark, dir)
      .select(col("a_id"), col("b_id"))
    val expected = mapRows(graft.ops.DedupOpsImpl.connectedComponents(batchPairs))
    assert(got == expected,
      s"stream-folded map must equal the batch rebuild (${got.size} vs ${expected.size})")
    assert(got.nonEmpty && afterFirst.size < got.size,
      "the fixture must actually grow the map across batches")
    graft.ops.DedupOpsImpl.clearCaches()
  }

  test("fold relabels a component when a smaller id arrives later") {
    val m0 = StreamComponents.emptyMap(spark)
    val m1 = StreamComponents.fold(m0, Seq((10L, 20L), (20L, 30L)).toDF("aId", "bId"))
    assert(mapRows(m1) == Set((10L, 10L), (20L, 10L), (30L, 10L)))
    // late arrival 5 links into the 10-rooted star: everything re-roots to 5
    val m2 = StreamComponents.fold(m1, Seq((5L, 30L)).toDF("aId", "bId"))
    assert(mapRows(m2) == Set((5L, 5L), (10L, 5L), (20L, 5L), (30L, 5L)))
    // and an unrelated pair starts its own component
    val m3 = StreamComponents.fold(m2, Seq((40L, 50L)).toDF("aId", "bId"))
    assert(mapRows(m3) == mapRows(m2) ++ Set((40L, 40L), (50L, 40L)))
  }
}
