package graft.ops

import org.apache.spark.sql.functions.col

import graft.{SparkSpec, Tables}

/** The persisted-ANN-truth refresh contract beyond what the q181 gate
  * (hash-equality with the whole-corpus rebuild) proves: an empty append
  * leaves the artifact bit-identical, and a second refresh with the same
  * delta is idempotent (re-ranking an already-merged candidate set cannot
  * change it).
  */
class AnnPersistSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("refresh with an empty delta is the identity; re-refresh is idempotent") {
    graft.expr.DotF64.register(spark)
    val truth = VectorOpsImpl.cosineTopK(spark, dir)
    val e = Tables(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("rn"), col("neighbor_id"), col("cosine"))
        .as[(Long, Long, Long, Double)].collect().toSeq.sorted

    val base = rows(truth)
    val emptyDelta = e.filter(col("vec_id") < 0)
    assert(rows(AnnPersistImpl.refreshTruth(truth, q, emptyDelta)) == base,
      "empty append must leave the truth bit-identical")

    val delta = e.filter(col("vec_id") >= 20)
    val once = rows(AnnPersistImpl.refreshTruth(truth, q, delta))
    val twice = rows(AnnPersistImpl.refreshTruth(
      AnnPersistImpl.refreshTruth(truth, q, delta), q, delta))
    assert(once == twice, "re-merging the same delta must be a no-op")
    assert(once == base, // delta ⊆ corpus here, so refresh rediscovers truth
      "refreshing with already-included vectors cannot displace exact truth")
  }
}
