package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derive a larger scale factor from driver-shipped testdata for the SCALE
  * SWEEP (`runMain graft.ScaleGen <srcDir> <dstDir> <factor>`): every fact
  * table is replicated `factor`× with all primary/foreign keys shifted by
  * replica × [[ScaleGen.KeyStride]], so per-replica join cardinalities are
  * preserved and totals scale linearly — the same shape a real corpus
  * growing 10× has. Dimension tables (region, nation) stay 1×: dimensions
  * don't grow with the corpus.
  *
  * Text replicas ROTATE each document's word sequence by the replica index:
  * token multiset (and so the vocabulary — which also doesn't grow 10×
  * with a 10× corpus) and character length are preserved, while replicas
  * stay near-duplicates of their original — deliberately: a 10×-replicated
  * corpus is exactly the workload dedup exists for, so the sweep stresses
  * the pair generators' caps rather than sidestepping them. Embedding
  * replicas get a small deterministic per-replica perturbation so they are
  * near- but not exact duplicates.
  *
  * Replica 0 is the identity — the original rows survive verbatim.
  */
object ScaleGen {

  /** Key shift per replica; far above any key in the shipped data. */
  val KeyStride = 10000000L

  private def replicate(df: DataFrame, factor: Int)(
      remap: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until factor).map(r => remap(df, r)).reduce(_ unionByName _)

  private def shift(c: String, r: Int) = col(c) + lit(r * KeyStride)

  def main(args: Array[String]): Unit = {
    val Array(src, dst, factorStr) = args.take(3)
    val factor = factorStr.toInt
    val spark = SparkSession.builder()
      .master(s"local[${Cpus(default = 16)}]")
      .config("spark.sql.shuffle.partitions", Cpus(default = 16))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def write(name: String, df: DataFrame): Unit = {
      // ROLL ROW GROUPS at ~8 MB (round-15 "Next round" #4): the shipped
      // testdata is single-file single-row-group per table, and parquet
      // scans split only at row-group boundaries — an sf1 derivation that
      // inherits that layout caps every corpus scan at ~10 of 32 cores
      // (one task per replica file), so the scale sweep measures the
      // FIXTURE's layout, not the plans. 8 MB groups let maxSplitBytes
      // shape real parallelism exactly as a production-written table
      // would. Content is untouched — hashes stay identical.
      df.write.mode("overwrite")
        .option("parquet.block.size", (8L * 1024 * 1024).toString)
        .parquet(s"$dst/$name.parquet")
      println(s"[scalegen] $name: ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }

    // dimensions: 1×
    for (t <- Seq("region", "nation"))
      write(t, Tables(spark, src, t))

    write("customer", replicate(Tables(spark, src, "customer"), factor) { (df, r) =>
      df.withColumn("c_custkey", shift("c_custkey", r)) })
    write("supplier", replicate(Tables(spark, src, "supplier"), factor) { (df, r) =>
      df.withColumn("s_suppkey", shift("s_suppkey", r)) })
    write("part", replicate(Tables(spark, src, "part"), factor) { (df, r) =>
      df.withColumn("p_partkey", shift("p_partkey", r)) })
    write("orders", replicate(Tables(spark, src, "orders"), factor) { (df, r) =>
      df.withColumn("o_orderkey", shift("o_orderkey", r))
        .withColumn("o_custkey", shift("o_custkey", r)) })
    write("lineitem", replicate(Tables(spark, src, "lineitem"), factor) { (df, r) =>
      df.withColumn("l_orderkey", shift("l_orderkey", r))
        .withColumn("l_partkey", shift("l_partkey", r))
        .withColumn("l_suppkey", shift("l_suppkey", r)) })
    write("events", replicate(Tables(spark, src, "events"), factor) { (df, r) =>
      df.withColumn("event_id", shift("event_id", r))
        .withColumn("user_id", shift("user_id", r)) })
    write("documents", replicate(Tables(spark, src, "documents"), factor) { (df, r) =>
      df.withColumn("doc_id", shift("doc_id", r))
        .withColumn("text",
          if (r == 0) col("text")
          else expr(
            s"""array_join(concat(slice(split(text, ' '), ${r + 1}, 1000000),
               |  slice(split(text, ' '), 1, $r)), ' ')""".stripMargin)) })
    write("embeddings", replicate(Tables(spark, src, "embeddings"), factor) { (df, r) =>
      df.withColumn("vec_id", shift("vec_id", r))
        .withColumn("embedding",
          if (r == 0) col("embedding")
          else expr(s"transform(embedding, (x, i) -> CAST(x + $r * 0.001 * ((i % 7) - 3) AS FLOAT))")) })

    spark.stop()
  }
}
