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
