package graft.ops

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Plan locks for the time-partitioned fact + dynamic partition pruning
  * (q220): the point is the fact scan reading ONLY the qualifying months'
  * partitions, so the spec asserts on the executed plan and its metrics,
  * not just the result. */
class PartitionedSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def executed(df: org.apache.spark.sql.DataFrame) = {
    df.collect()
    df.queryExecution.executedPlan
  }

  private def factScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => factScans(a.executedPlan)
    case q: QueryStageExec => factScans(q.plan) // cross AQE stage boundaries
    case f: FileSourceScanExec
      if f.output.exists(_.name == "l_extendedprice") => Seq(f)
    case other =>
      other.children.flatMap(factScans) ++ other.subqueries.flatMap(factScans)
  }

  test("the fact scan carries a dynamic pruning filter and reads only qualifying months") {
    val df = PartitionedOpsImpl.dppRevenue(spark, dir)
    val plan = executed(df)
    val rendered = plan.toString.split("== Initial Plan ==").head
    assert(rendered.contains("dynamicpruning"),
      s"fact scan must carry a dynamic partition pruning filter:\n$rendered")
    val scan = factScans(plan).headOption
      .getOrElse(fail(s"no fact FileSourceScanExec found:\n$rendered"))
    val qualifying = PartitionedOpsImpl.qualifyingMonths(spark, dir).count()
    val allMonths = Tables(spark, dir, "lineitem")
      .select(date_format(col("l_shipdate"), "yyyy-MM")).distinct().count()
    val filesRead = scan.metrics("numFiles").value
    assert(qualifying < allMonths / 4,
      s"fixture drift: $qualifying of $allMonths months qualify — prune too weak to test")
    // one file per month partition (the writer repartitions by month), so
    // files read ≈ partitions read; a non-pruned scan would read every month
    assert(filesRead <= qualifying + 1 && filesRead < allMonths,
      s"DPP should read ~$qualifying month partitions, read $filesRead files " +
        s"of $allMonths months")
  }

  test("pruned results equal the unpartitioned static computation") {
    val dpp = PartitionedOpsImpl.dppRevenue(spark, dir).collect().toSeq
    val months = PartitionedOpsImpl.qualifyingMonths(spark, dir)
    val raw = Tables(spark, dir, "lineitem")
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .join(months, Seq("ship_month"))
      .groupBy(col("ship_month"))
      .agg(Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("ship_month"))
      .collect().toSeq
    assert(dpp == raw, "partition layout must change the scan, not the answer")
  }
}
