package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants of the round-5 measurement/layout operators: kNN PageRank
  * (q131), count-min heavy hitters (q132), dedup-aware sharding (q133). */
class CentralitySketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q131 pagerank: every score >= base, isolated nodes sit exactly at base") {
    val pr = VectorOpsImpl.knnPagerank(spark, dir)
    val base = VectorOpsImpl.PrBase
    assert(pr.filter(col("score") < base - 1e-12).count() === 0,
      "damped recurrence can never drop below the base mass")
    // nodes that receive no in-links (not a dst of any kNN edge) stay at base
    val edges = VectorOpsImpl.knnGraph(spark, dir).select(col("dst"))
    val isolated = pr.join(edges, pr("vec_id") === edges("dst"), "left_anti")
    val distinctScores = isolated.select(col("score")).distinct().collect()
    assert(distinctScores.nonEmpty, "the sf0.001 graph must leave some node unlinked")
    assert(distinctScores.forall(_.getDouble(0) == base),
      s"no-in-link nodes must score exactly $base")
    // centrality is informative: linked nodes separate from the base mass
    assert(pr.filter(col("score") > base + 1e-9).count() > 0)
  }

  test("q131 pagerank equals a pure-Scala recomputation, bitwise") {
    val edges = VectorOpsImpl.knnGraph(spark, dir)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = graft.Tables(spark, dir, "embeddings")
      .select("vec_id").collect().map(_.getLong(0))
    val outdeg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var score = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to VectorOpsImpl.PrIters) {
      // same floor-quantized order-independent sum as both engines
      val sums = edges.groupBy(_._2).view.mapValues { es =>
        val q = es.map { case (u, _) =>
          BigInt(math.floor(score(u) / outdeg(u) * 1e12).toLong)
        }.sum
        q.toDouble / 1e12
      }.toMap
      score = nodes.map(v => v ->
        (VectorOpsImpl.PrBase + VectorOpsImpl.PrDamp * sums.getOrElse(v, 0.0))).toMap
    }
    val got = VectorOpsImpl.knnPagerank(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet === score.keySet)
    got.foreach { case (v, s) =>
      assert(s == score(v), s"node $v: engine $s vs scala ${score(v)}")
    }
  }

  test("q132 cms estimates equal a pure-Scala sketch recomputation") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def nibble(i: Int, word: String): Int = {
      val d = md.digest(s"cms$i:$word".getBytes("UTF-8"))
      (d(0) >> 4) & 0xf
    }
    val words = graft.Tables(spark, dir, "documents").select("text").collect()
      .flatMap(_.getString(0).split(" ")).filter(_.nonEmpty)
    val wc = words.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val grid = scala.collection.mutable.Map.empty[(Int, Int), Long].withDefaultValue(0L)
    for ((w, c) <- wc; i <- 0 until TextOpsImpl.CmsDepth)
      grid((i, nibble(i, w))) += c
    val est = wc.map { case (w, _) =>
      w -> (0 until TextOpsImpl.CmsDepth).map(i => grid((i, nibble(i, w)))).min
    }
    TextOpsImpl.cmsHeavyHitters(spark, dir).collect().foreach { r =>
      val w = r.getString(0)
      assert(r.getAs[Long]("n_exact") === wc(w))
      assert(r.getAs[Long]("cms_est") === est(w), s"word $w")
    }
  }

  test("q132 count-min: estimates only ever overcount, and bound the exact count") {
    val hh = TextOpsImpl.cmsHeavyHitters(spark, dir).collect()
    assert(hh.length > 0)
    hh.foreach { r =>
      val exact = r.getAs[Long]("n_exact")
      val est = r.getAs[Long]("cms_est")
      assert(est >= exact, s"CMS must never undercount: ${r}")
      assert(r.getAs[Long]("overcount") === est - exact)
    }
    // width 16 on this corpus must actually collide somewhere, or the
    // estimate/exact panel measures nothing
    assert(hh.exists(_.getAs[Long]("overcount") > 0),
      "sketch width is sized to force collisions on the gate corpus")
  }

  test("q135 exemplars: one per community, a member of it, with its max score") {
    val ex = VectorOpsImpl.clusterExemplars(spark, dir).collect()
    val cl = VectorOpsImpl.knnClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap // vec_id -> cluster
    val pr = VectorOpsImpl.knnPagerank(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ex.map(_.getLong(0)).toSet === cl.values.toSet, "one exemplar per community")
    ex.foreach { r =>
      val (cluster, id, score) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(cl(id) === cluster, "exemplar must belong to its cluster")
      assert(score === pr(id))
      val best = cl.collect { case (v, c) if c == cluster => pr(v) }.max
      assert(score === best, s"exemplar of $cluster must carry the max PageRank")
    }
  }

  test("q133 shards: cluster-atomic, covering, and balanced counts reconcile") {
    val shards = DedupOpsImpl.dedupShards(spark, dir).collect()
    val nDocs = graft.Tables(spark, dir, "documents").count()
    assert(shards.map(_.getAs[Long]("n_docs")).sum === nDocs,
      "shard sizes must partition the corpus")
    // atomicity: recompute the per-doc assignment and check every component
    // lands on exactly one shard
    val comp = DedupOpsImpl.dedupComponents(spark, dir)
      .select(col("doc_id"), col("component"))
    val assigned = comp.withColumn("shard", expr(
      s"(instr('0123456789abcdef', substr(md5(concat('shard:', " +
        s"CAST(component AS STRING))), 1, 1)) - 1) % ${DedupOpsImpl.NumShards}"))
    val split = assigned.groupBy(col("component"))
      .agg(countDistinct(col("shard")).as("n_shards"))
      .filter(col("n_shards") > 1)
    assert(split.count() === 0, "a near-dup cluster must never span shards")
    // clustered-doc totals reconcile with the component map
    assert(shards.map(_.getAs[Long]("n_clustered")).sum === comp.count())
  }
}
