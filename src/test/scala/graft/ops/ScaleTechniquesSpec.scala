package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale techniques: salting for skewed joins, bucketing for exchange-free
  * co-located joins. Correctness here, plan shapes asserted where they are
  * the point.
  */
class ScaleTechniquesSpec extends SparkSpec {
  import spark.implicits._

  test("salted join matches plain join results and spreads the hot key") {
    val big = ((1 to 1000).map(i => ("hot", i)) ++ (1 to 20).map(i => (s"k$i", i)))
      .toDF("key", "payload")
    val small = (Seq("hot") ++ (1 to 20).map(i => s"k$i")).zipWithIndex
      .toDF("key", "dim")
    val plain = big.join(small, "key").select($"key", $"payload", $"dim")
      .as[(String, Int, Int)].collect().toSet
    val salted = Skew.saltedJoin(big, small, "key", saltFactor = 8)
      .select($"key", $"payload", $"dim").as[(String, Int, Int)].collect().toSet
    assert(salted == plain)

    // the hot key's rows really spread over multiple salt buckets
    val buckets = big.withColumn("__salt",
        pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(8)).cast("int"))
      .filter($"key" === "hot").select($"__salt").distinct().count()
    assert(buckets > 4, s"expected hot key spread over >4 of 8 salt buckets, got $buckets")
  }

  test("AQE splits a skewed join partition at runtime (the salting-free path)") {
    // own child session: skew thresholds tuned WAY down so test-sized data
    // trips the optimization, without touching other specs' plans
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "10KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "10KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    import s.implicits._
    val big = ((1 to 60000).map(i => ("hot", i)) ++
      (1 to 200).map(i => (s"k${i % 40}", i))).toDF("key", "payload")
    val small = (Seq("hot") ++ (0 until 40).map(i => s"k$i")).zipWithIndex
      .toDF("key", "dim")
    // no aggregation downstream: a consumer requiring hash distribution on
    // the join key would veto the split (it would re-shuffle) unless
    // forceOptimizeSkewedJoin is set — the join itself is the demo
    val joined = big.join(small, "key").select($"key", $"payload", $"dim")
    val rows = joined.collect()
    assert(rows.length == 60200 && rows.count(_.getString(0) == "hot") == 60000,
      s"semantics unchanged: ${rows.length}")
    // the executed plan really took the skew path
    val rendered = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(rendered.contains("skew=true"),
      s"AQE must mark the skewed join side (skew=true):\n$rendered")
  }

  test("q146 bucketed range join equals the naive inequality join") {
    val dir = "/root/testdata/sf0.001"
    val got = RelationalOps.purchaseClickAttribution(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    val ev = graft.Tables(spark, dir, "events")
      .select($"event_id", $"event_type", unix_millis($"ts").as("ems"), $"value")
      .collect()
    val clicks = ev.filter(_.getString(1) == "click")
    val naive = ev.filter(_.getString(1) == "purchase").map { p =>
      val pe = p.getLong(2)
      val in = clicks.filter { c =>
        val ce = c.getLong(2)
        ce >= pe - RelationalOps.RangeJoinWindowMs && ce < pe
      }
      (p.getLong(0), in.length.toLong,
        if (in.isEmpty) None
        else Some(in.map(c => BigDecimal(c.getDouble(3)).setScale(6, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble))
    }.sortBy(_._1).toSeq
    assert(got.map(t => (t._1, t._2)) == naive.map(t => (t._1, t._2)))
    got.zip(naive).foreach { case ((id, _, gv), (_, _, nv)) =>
      (gv, nv) match {
        case (Some(g), Some(n)) => assert(math.abs(g - n) < 1e-9, s"purchase $id")
        case (a, b) => assert(a == b, s"purchase $id")
      }
    }
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    // the 100 TB star-join pattern: the fact table is partitioned on the
    // join key's dimension attribute; a filter that only exists on the DIM
    // side must still prune fact partitions — Spark inserts a runtime
    // subquery (DPP) into the scan's partition filters
    val dir = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    graft.Tables(spark, dir, "orders").write
      .partitionBy("o_orderstatus").mode("overwrite").parquet(tmp)
    val fact = spark.read.parquet(tmp)
    // the dim must be a real datasource: an in-memory LocalRelation gets its
    // filter constant-folded away, and DPP's selective-predicate heuristic
    // then sees no reason to prune
    val dimTmp = java.nio.file.Files.createTempDirectory("graft_dpp_dim").toString
    Seq(("O", "open"), ("F", "filled"), ("P", "pending"))
      .toDF("status", "label").write.mode("overwrite").parquet(dimTmp)
    val dim = spark.read.parquet(dimTmp).filter($"label" === "open")
    val joined = fact.join(dim, fact("o_orderstatus") === dim("status"))
    val s = joined.queryExecution.executedPlan.toString
    assert(s.toLowerCase.contains("dynamicpruning"),
      s"fact scan must carry a runtime partition-pruning subquery:\n$s")
    // semantics: only the surviving partition's rows come back
    val statuses = joined.select($"o_orderstatus").distinct()
      .as[String].collect().toSeq
    assert(statuses == Seq("O"))
  }

  test("bucketed tables join without a shuffle exchange") {
    // default warehouse dir (static conf); tables dropped in finally
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("id", "va")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("id", "vb")
    a.write.bucketBy(4, "id").sortBy("id").mode("overwrite").saveAsTable("bkt_a")
    b.write.bucketBy(4, "id").sortBy("id").mode("overwrite").saveAsTable("bkt_b")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed co-located join must not shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
