package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    ("a", 10, 1), ("a", 30, 2), ("a", 20, 3), ("a", 40, 4),
    ("b", 5, 5), ("b", 7, 6),
    ("c", 9, 7))
    .toDF("key", "score", "id")

  test("keeps k best rows per key with correct ranks") {
    val out = TopK.topKPerKey(df, 2, Seq("key"), Seq(TopK.desc("score"), TopK.asc("id")))
      .select($"key", $"rank", $"score", $"id")
      .as[(String, Long, Int, Int)].collect().toSet
    assert(out == Set(
      ("a", 1L, 40, 4), ("a", 2L, 30, 2),
      ("b", 1L, 7, 6), ("b", 2L, 5, 5),
      ("c", 1L, 9, 7)))
  }

  test("matches the window+row_number formulation on real data") {
    val li = graft.Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val native = TopK.topKPerKey(li, 3, Seq("l_suppkey"),
        Seq(TopK.desc("l_extendedprice"), TopK.asc("l_orderkey"), TopK.asc("l_linenumber")))
      .select($"l_suppkey", $"rank", $"l_orderkey", $"l_extendedprice")
      .as[(Long, Long, Long, Double)].collect().toSet
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
    val windowed = li.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"l_suppkey", $"rank", $"l_orderkey", $"l_extendedprice")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(native == windowed)
  }

  test("physical plan has a partial top-k below the exchange (map-side combine)") {
    val planned = TopK.topKPerKey(df, 2, Seq("key"), Seq(TopK.desc("score")))
    planned.write.format("noop").mode("overwrite").save()
    val s = planned.queryExecution.executedPlan.toString
    val execs = "TopKPerKey ".r.findAllIn(s).size
    assert(execs == 2, s"expected partial+final TopKPerKey nodes, plan:\n$s")
    // textual order: final on top, then the hash exchange, then the partial
    val exchangeIdx = s.indexOf("Exchange hashpartitioning")
    assert(exchangeIdx >= 0, s"expected a hash exchange on the key:\n$s")
    assert(s.indexOf("TopKPerKey ") < exchangeIdx
      && exchangeIdx < s.lastIndexOf("TopKPerKey "),
      s"partial top-k must sit below the exchange (map-side combine):\n$s")
  }

  test("handles skew: one giant key among many small ones") {
    val skewed = ((1 to 5000).map(i => ("hot", i, i)) ++
      (1 to 50).map(i => (s"k$i", i, i))).toDF("key", "score", "id")
      .repartition(8)
    val out = TopK.topKPerKey(skewed, 3, Seq("key"), Seq(TopK.desc("score")))
      .groupBy($"key").count().as[(String, Long)].collect().toMap
    assert(out("hot") == 3L && out.size == 51)
    assert(out.values.forall(_ <= 3L))
  }
}
