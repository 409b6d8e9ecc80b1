package graft.ops

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Plan locks for the bucketed co-located join (q213): the whole point of
  * bucketing is the ABSENCE of exchanges, so the spec asserts on the
  * executed plan, not just the result. */
class BucketedSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def executed(df: org.apache.spark.sql.DataFrame) = {
    df.collect() // finalize any adaptive plan before inspecting it
    df.queryExecution.executedPlan
  }

  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val here = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case other => Seq(other) ++ other.children.flatMap(allNodes)
    }
    here.flatMap {
      case a: AdaptiveSparkPlanExec => allNodes(a)
      case n => Seq(n) ++ n.subqueries.flatMap(allNodes)
    }.distinct
  }

  test("co-located join + aggregate runs with zero shuffle exchanges") {
    // assert on the FINAL adaptive plan's rendering: node-walking does not
    // cross AQE query-stage boundaries, the string faithfully shows them
    val plan = executed(BucketedOpsImpl.colocatedRevenue(spark, dir))
    val rendered = plan.toString.split("== Initial Plan ==").head
    assert(rendered.contains("SortMergeJoin"),
      s"bucketed fact-fact join must be a sort-merge join:\n$rendered")
    assert(!rendered.contains("Exchange"),
      s"bucketed join + bucket-keyed aggregate must not shuffle:\n$rendered")
    assert(rendered.contains("Bucketed: true"),
      s"both scans must be bucketed scans:\n$rendered")
  }

  test("bucketed results equal the shuffle plan over raw parquet") {
    val bucketed = BucketedOpsImpl.bucketedTopRevenue(spark, dir)
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    val raw = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(100)
    assert(bucketed.collect().toSeq == raw.collect().toSeq,
      "bucketed layout must change the plan, not the answer")
  }

  test("a bucket-key equality predicate prunes the scan to one bucket") {
    val (liName, _) = BucketedOpsImpl.ensureTables(spark, dir)
    val someKey = spark.table(liName).select("l_orderkey").head.getLong(0)
    val filtered = spark.table(liName).filter(col("l_orderkey") === someKey)
    // the scan itself carries the bucket filter (inputFiles reports the
    // unpruned listing — the round-7 lesson), so assert on the scan node
    val scan = allNodes(executed(filtered)).collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("expected a FileSourceScanExec"))
    val selected = scan.optionalBucketSet.map(_.cardinality())
    assert(selected.contains(1),
      s"bucket-key lookup must prune to 1 of ${BucketedOpsImpl.NumBuckets} " +
        s"buckets, got $selected")
  }
}
