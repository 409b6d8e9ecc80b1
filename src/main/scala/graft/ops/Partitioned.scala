package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.ops.Det.{dsum, dsumSql}

/** TIME-PARTITIONED fact layout + DYNAMIC PARTITION PRUNING — the other
  * half of the physical-layout story next to [[BucketedOpsImpl]]: bucketing
  * kills the shuffle, partitioning kills the scan. The fact table is
  * written hive-partitioned by ship month (the reference's own S3 sink
  * lays CDC objects out by time partition for exactly this reason —
  * S3TargetMapper + the `targets.s3.partition` granularity config); a
  * query joining it to a FILTERED dimension then only reads the partitions
  * the dim rows name — but which months qualify is only known at RUNTIME
  * (the dim filter is on an attribute, not on the partition key), so
  * static pruning can't help. Spark's dynamic partition pruning closes
  * this: the dim side's build is reused as a subquery filter on the fact
  * scan's partition column (`PartitionFilters: dynamicpruning#...`), and
  * at 100 TB the fact scan drops from "every month ever" to the handful
  * of qualifying months before a single row is read. PartitionedSpec
  * locks the executed plan: the DPP filter present, and the scan's
  * selected-partition count equal to the qualifying months.
  */
object PartitionedOpsImpl {

  private val built = new ConcurrentHashMap[(SparkSession, String), String]()

  def clearCaches(): Unit = built.clear()

  /** Lineitem written hive-partitioned by ship month. */
  def ensureFact(s: SparkSession, dir: String): String =
    Memo.getOrCacheAny(built, s, dir, { d =>
      val path = java.nio.file.Files.createTempDirectory("graft_part").toString
      Tables(s, d, "lineitem")
        .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
        .repartition(col("ship_month"))
        .write.mode("overwrite").partitionBy("ship_month").parquet(path)
      path
    })

  /** The months the dim filter qualifies: months of early 1996 containing
    * at least one urgent order — knowable only by scanning the dim. */
  def qualifyingMonths(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        year(col("o_orderdate")) === 1996 && quarter(col("o_orderdate")) === 1)
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("ship_month"))
      .distinct()

  /** q220: revenue shipped in qualifying months. The join key IS the fact
    * table's partition column, the dim side is broadcastable, the dim
    * filter is not expressible as a static partition predicate — the
    * exact shape DPP exists for. */
  def dppRevenue(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(ensureFact(s, dir))
      .join(broadcast(qualifyingMonths(s, dir)), Seq("ship_month"))
      .groupBy(col("ship_month"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("ship_month"))
}

object PartitionedOps {
  def queries: Seq[Q] = Seq(
    Q("q220_dpp_revenue", PartitionedOpsImpl.dppRevenue, Some(
      s"""SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  COUNT(*) AS n_lines
         |FROM lineitem
         |WHERE strftime(l_shipdate, '%Y-%m') IN (
         |  SELECT DISTINCT strftime(o_orderdate, '%Y-%m') FROM orders
         |  WHERE o_orderpriority = '1-URGENT'
         |    AND year(o_orderdate) = 1996 AND quarter(o_orderdate) = 1)
         |GROUP BY 1 ORDER BY 1""".stripMargin)))
}
