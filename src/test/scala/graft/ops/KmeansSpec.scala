package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic Lloyd k-means (q74-q76): properties the value gate can't
  * see at sf0.01 — the empty-cluster COALESCE path (all sf0.01 clusters are
  * non-empty) and stability across cache invalidation. */
class KmeansSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("empty clusters keep their seed center with n = 0") {
    val tmp = java.nio.file.Files.createTempDirectory("kmeans").toString
    import spark.implicits._
    // 8 vectors, ids 0-3 identical: their four identical seed centers tie on
    // distance 0, the smallest center id wins all four points, and the other
    // three clusters stay empty through every iteration — each must keep its
    // seed center verbatim with n = 0. Ids 4-7 are distinct points sitting
    // exactly on their own seeds.
    def vec(base: Double): Seq[Float] =
      Seq.tabulate(VectorOpsImpl.Dims)(i => (base + i * 0.001).toFloat)
    val rows = (0L to 7L).map { id =>
      (id, if (id <= 3) vec(0.5) else vec(id.toDouble))
    }
    rows.toDF("vec_id", "embedding").write.parquet(s"$tmp/embeddings.parquet")
    VectorOpsImpl.clearCaches()
    val out = VectorOpsImpl.kmeansCentroids(spark, tmp).collect()
    assert(out.length == 8, "k = min(KmeansK, corpus size) seeds")
    assert(out.map(_.getLong(1)).sum == 8L, "every vector lands in one cluster")
    val empties = out.filter(_.getLong(1) == 0L)
    assert(empties.length == 3, s"3 duplicate seeds must go empty: ${out.mkString(", ")}")
    // an empty cluster keeps its PREVIOUS center: either its seed verbatim
    // or the floor-quantized mean of the identical duplicates it held for
    // one round (the two differ by < 1e-12, the quantization grain) — a
    // broken COALESCE would surface as null/zero garbage here
    val seedOrder = (0L to 7L).sortBy(id => (md5hex(s"seed:$id"), id))
    empties.foreach { r =>
      val seedVec = rows(seedOrder(r.getLong(0).toInt).toInt)._2
      (0 until 4).foreach { j =>
        assert(math.abs(r.getDouble(2 + j) - seedVec(j).toDouble) < 1e-12,
          s"empty cluster ${r.getLong(0)} must keep its previous center at dim ${j + 1}")
      }
    }
    VectorOpsImpl.clearCaches()
  }

  test("k-means centroids are stable across cache invalidation") {
    val dir = "/root/testdata/sf0.001"
    VectorOpsImpl.clearCaches()
    val a = VectorOpsImpl.kmeansCentroids(spark, dir).collect().map(_.toString).toSeq
    VectorOpsImpl.clearCaches()
    val b = VectorOpsImpl.kmeansCentroids(spark, dir).collect().map(_.toString).toSeq
    assert(a == b, "recomputed centroids must be bitwise identical")
  }

  test("learned-codebook assignment covers the corpus; IVF probe bounded per query") {
    val dir = "/root/testdata/sf0.001"
    val corpus = graft.Tables(spark, dir, "embeddings").count()
    val asg = VectorOpsImpl.kmeansAssign(spark, dir)
    assert(asg.count() == corpus, "every vector gets an assignment")
    val mm = asg.agg(min(col("assigned")), max(col("assigned"))).head()
    assert(mm.getLong(0) >= 0L && mm.getLong(1) < VectorOpsImpl.KmeansK)
    val perQuery = VectorOpsImpl.kmeansIvfTopK(spark, dir)
      .groupBy(col("query_id")).count().collect()
    assert(perQuery.length == 8, "all 8 query vectors probe")
    assert(perQuery.forall(_.getLong(1) <= 3), "top-3 per query")
  }

  test("residual encoding lifts IVF-PQ recall at identical index bytes") {
    // the reason q148/q149 exist: within a coarse cell residuals concentrate
    // near zero, so the same 8-byte code budget quantizes a smaller ball
    // than raw-vector PQ — recall must not be WORSE than q79's at the same
    // (cluster, 8-code) layout, and the codes must differ (it is a
    // genuinely different quantizer, not a relabeling)
    val dir = "/root/testdata/sf0.001"
    val r = VectorOpsImpl.annRecall(spark, dir).collect()
      .map(x => x.getString(0) -> x.getAs[Double]("recall")).toMap
    assert(r("rivfpq") >= r("kmeans_ivfpq"),
      s"residual IVF-PQ recall ${r("rivfpq")} must be >= raw IVF-PQ ${r("kmeans_ivfpq")}")
    val raw = VectorOpsImpl.pqKmeansEncode(spark, dir).collect()
      .map(x => x.getLong(0) -> (1 to 8).map(i => x.getLong(x.length - 9 + i)))
    val res = VectorOpsImpl.residualPqEncode(spark, dir).collect()
      .map(x => x.getLong(0) -> (1 to 8).map(i => x.getLong(x.length - 9 + i)))
    assert(raw.toMap != res.toMap, "residual codes must not equal raw-vector codes")
  }
}
