package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Skewed-join hardening proof (SURVEY build brief: "skewed keys → salting
  * or AQE skew-join"): a deliberate 100:1 hot-key fixture, with assertions
  * that (a) the deterministic salt actually spreads the hot key across all
  * reducer buckets with bounded per-bucket input, (b) salting preserves
  * join semantics exactly, (c) the salt is content-derived and therefore
  * stable under task retry/replay, and (d) AQE's runtime skew-join split
  * engages on the same fixture when the join shuffles — the two mitigation
  * paths a 100 TB deployment relies on, both pinned. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private val HotRows = 100000L
  private val SaltFactor = 8

  /** 100:1 skew: one key with 100k rows, 100 keys with 10 rows each. */
  private def big: DataFrame =
    spark.range(HotRows).select(lit("hot").as("key"), col("id").as("payload"))
      .union(spark.range(1000).select(
        concat(lit("k"), (col("id") % 100)).as("key"), (col("id") + HotRows).as("payload")))

  private def small: DataFrame =
    ("hot" +: (0 until 100).map(i => s"k$i")).map(k => (k, s"dim_$k"))
      .toDF("key", "dim")

  test("salted join equals the plain join on a 100:1 hot key") {
    val plain = big.join(small, "key")
    val salted = Skew.saltedJoin(big, small, "key", SaltFactor)
    assert(salted.count() == plain.count())
    // spot-check content equality, not just cardinality
    val a = salted.groupBy("key").agg(count(lit(1)).as("n"), sum("payload").as("s"))
      .as[(String, Long, Long)].collect().toSet
    val b = plain.groupBy("key").agg(count(lit(1)).as("n"), sum("payload").as("s"))
      .as[(String, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("the hot key spreads over every salt bucket with bounded per-bucket input") {
    val b = big
    val salted = b.withColumn("__salt",
      pmod(xxhash64(b.columns.map(col).toIndexedSeq: _*), lit(SaltFactor)).cast("int"))
    val counts = salted.filter($"key" === "hot")
      .groupBy($"__salt").agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect().toMap
    assert(counts.keySet == (0 until SaltFactor).toSet,
      s"hot key must land in every salt bucket: $counts")
    val ideal = HotRows / SaltFactor
    assert(counts.values.max <= 2 * ideal,
      s"per-reducer input must stay near ideal ($ideal): $counts")
  }

  test("salt is content-derived: identical under re-execution (retry/replay safety)") {
    def saltCounts = {
      val b = big
      b.withColumn("__salt",
          pmod(xxhash64(b.columns.map(col).toIndexedSeq: _*), lit(SaltFactor)).cast("int"))
        .groupBy($"key", $"__salt").agg(count(lit(1)).as("n"))
        .as[(String, Int, Long)].collect().toSet
    }
    assert(saltCounts == saltCounts)
  }

  test("AQE splits the skewed shuffle join at runtime (skew=true in the final plan)") {
    val keep = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // shrink thresholds so the ~MB-scale hot partition counts as skewed
      // thresholds sized against COMPRESSED shuffle bytes (a 100k-row
      // constant-string partition lz4-compresses to a few KB)
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // force a shuffle join: broadcast would sidestep the skew entirely
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // NOTE: no groupBy on the join key afterwards — an aggregate that
      // REQUIRES the join's hash distribution makes AQE (correctly) skip
      // the skew split to avoid a re-shuffle; a global count's partial
      // aggregation is partition-local, so the split is admissible. This
      // is itself a scale lesson the spec documents: keep skewed joins
      // out of plans that immediately re-require their partitioning.
      val j = big.join(small, "key").agg(sum("payload").as("n"))
      j.collect() // execute so AQE finalizes the plan
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must mark the hot partition as skew-split:\n$plan")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
