package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Plan lock for runtime Bloom-filter join pruning
  * ([[Skew.enableRuntimeBloomFilters]]): with the application-side
  * threshold armed and broadcast disabled (forcing the shuffle join shape
  * the filter exists for), the optimizer must push a `might_contain`
  * runtime filter onto the fact side of a selective dim join — and the
  * answer must not change. Runs in its own child session so the conf
  * never leaks into other specs' plans. */
class RuntimeFilterSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("a selective dim filter injects a bloom filter on the fact scan side") {
    val s = spark.newSession()
    Skew.enableRuntimeBloomFilters(s, applicationThresholdBytes = 0L)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val li = Tables(s, dir, "lineitem")
    val o = Tables(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
    val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("l_extendedprice")).as("s"))
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(optimized.contains("might_contain"),
      s"runtime bloom filter must be injected on the fact side:\n$optimized")

    // and it only prunes — the result equals the plain session's
    val plain = Tables(spark, dir, "lineitem")
    val po = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val expected = plain.join(po, plain("l_orderkey") === po("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("l_extendedprice")).as("s"))
      .collect().toSeq
    assert(joined.collect().toSeq == expected,
      "the runtime filter must not change the answer")
  }
}
