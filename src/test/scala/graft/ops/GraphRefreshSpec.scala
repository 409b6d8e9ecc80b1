package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Delta-refresh contract for the kNN graph: appending vectors to the
  * corpus must be servable by re-ranking ONLY the nodes whose LSH buckets
  * the delta touched, and the refreshed graph must be ROW-EQUAL to a full
  * rebuild over the appended corpus — the same stream-equals-batch
  * discipline StreamIndexSpec pins for IVF. */
class GraphRefreshSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def emb: DataFrame = graft.Tables(spark, dir, "embeddings")

  private def rows(df: DataFrame): Set[(Long, Long, Long, Double)] =
    df.select(col("src"), col("rn"), col("dst"), col("cosine"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

  test("refresh after append equals the full rebuild, touching only affected sources") {
    val all = emb
    // 1% delta: big enough to change edges, small enough that its band
    // buckets cannot cover the whole corpus (a 10% delta at 500 vectors
    // touches all 64 buckets and the incrementality assertion is vacuous)
    val base = all.filter(pmod(col("vec_id"), lit(100L)) =!= 0L)
    val deltaIds = all.filter(pmod(col("vec_id"), lit(100L)) === 0L)
      .select(col("vec_id"))

    val oldEdges = VectorOpsImpl.knnGraphOf(base).localCheckpoint()
    val refreshed = VectorOpsImpl.refreshKnnGraph(spark, all, deltaIds, oldEdges)
    val full = VectorOpsImpl.knnGraphOf(all)

    assert(rows(refreshed) == rows(full),
      "delta refresh must be row-equal to the full rebuild")

    // incrementality is real: some sources keep their old edges untouched
    val nTotal = all.count()
    val sigs = VectorOpsImpl.bandedSignaturesOf(all,
      VectorOpsImpl.NearDupBands, VectorOpsImpl.NearDupBandBits)
    val touched = sigs.join(
        sigs.join(deltaIds, "vec_id").select(col("band"), col("bv")).distinct(),
        Seq("band", "bv"))
      .select(col("vec_id")).distinct().count()
    assert(touched < nTotal,
      s"fixture degenerated: delta touched every bucket ($touched of $nTotal)")
    graft.ops.Memo.unpersistAll(oldEdges)
  }

  test("a no-op delta (empty append) refreshes nothing and changes nothing") {
    val all = emb
    val none = all.filter(lit(false)).select(col("vec_id"))
    val oldEdges = VectorOpsImpl.knnGraphOf(all).localCheckpoint()
    val refreshed = VectorOpsImpl.refreshKnnGraph(spark, all, none, oldEdges)
    assert(rows(refreshed) == rows(oldEdges))
    graft.ops.Memo.unpersistAll(oldEdges)
  }

  test("q140 persisted-artifact exemplars equal the in-session q135 rebuild") {
    val fromDisk = GraphPersistImpl.persistedExemplars(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val inSession = VectorOpsImpl.clusterExemplars(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(fromDisk.nonEmpty && fromDisk.sameElements(inSession))
    // the query-time plan reads parquet only — no embedding or document scan
    val plan = GraphPersistImpl.persistedExemplars(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("embeddings.parquet") && !plan.contains("documents.parquet"),
      "persisted-index consumers must not touch the corpus")
    GraphPersistImpl.clearCaches()
    VectorOpsImpl.clearCaches()
    DedupOpsImpl.clearCaches()
  }
}
