package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Column PROFILER (q159) — the table-health panel every warehouse runs
  * before trusting a dataset: per numeric column, row/null/exact-distinct
  * counts, min/max, and the EXACT median. Profiling at 100 TB is a scan
  * problem, and the shape here is the scalable one:
  *
  *  - counts/nulls/distincts/min/max for ALL columns come from ONE pass
  *    (a single-row aggregate, map-side combined; exact distincts expand
  *    to Spark's grouping-based rewrite — one shuffle of distinct values
  *    per column, the minimum possible for exactness);
  *  - the single stats row unfolds to per-column rows AFTER aggregation
  *    (the q124 explode-above-the-agg discipline — the corpus is never
  *    exploded);
  *  - medians use the q38 value-HISTOGRAM rank: shuffle distinct
  *    (column, value) pairs once, cumulative-count the per-column
  *    histogram, and take the first value covering rank ⌊(n+1)/2⌋ —
  *    exact without ever sorting the table (approx_percentile would give
  *    up exactness AND cross-engine determinism).
  */
object ProfileOpsImpl {

  val ProfileCols: Seq[String] =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  def columnProfile(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val aggs = count(lit(1)).as("n_rows") +: ProfileCols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
        countDistinct(col(c)).as(s"dist_$c"),
        min(col(c)).as(s"min_$c"),
        max(col(c)).as(s"max_$c"))
    }
    val stats = li.agg(aggs.head, aggs.tail: _*)
    val unfolded = stats.select(col("n_rows"), explode(array(ProfileCols.map { c =>
        struct(lit(c).as("col_name"), col(s"null_$c").as("n_null"),
          col(s"dist_$c").as("n_distinct"),
          col(s"min_$c").as("min_v"), col(s"max_$c").as("max_v"))
      }: _*)).as("p"))
      .select(col("p.col_name").as("col_name"), col("n_rows"), col("p.n_null").as("n_null"),
        col("p.n_distinct").as("n_distinct"), col("p.min_v").as("min_v"),
        col("p.max_v").as("max_v"))
    // per-column exact median from the distinct-value histogram
    val hist = li.select(explode(array(ProfileCols.map { c =>
        struct(lit(c).as("col_name"), col(c).as("v"))
      }: _*)).as("p"))
      .select(col("p.col_name").as("col_name"), col("p.v").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("col_name"), col("v")).agg(count(lit(1)).as("cnt"))
    val wcum = Window.partitionBy(col("col_name")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val medians = hist
      .withColumn("cum", sum(col("cnt")).over(wcum))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("col_name"))))
      .filter(col("cum") >= expr("(n + 1) div 2"))
      .groupBy(col("col_name")).agg(min(col("v")).as("median_v"))
    unfolded.join(medians, Seq("col_name"), "left")
      .orderBy(col("col_name"))
  }

  private lazy val q159Sql: String = {
    val aggSel = ProfileCols.map { c =>
      s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  MIN($c) AS min_v, MAX($c) AS max_v
         |FROM lineitem""".stripMargin
    }.mkString("\nUNION ALL\n")
    val histSel = ProfileCols.map(c =>
      s"SELECT '$c' AS col_name, $c AS v FROM lineitem WHERE $c IS NOT NULL")
      .mkString(" UNION ALL ")
    s"""WITH stats AS (
       |$aggSel),
       |vals AS ($histSel),
       |hist AS (SELECT col_name, v, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM vals GROUP BY col_name, v),
       |cums AS (SELECT col_name, v, cnt,
       |    CAST(SUM(cnt) OVER (PARTITION BY col_name ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
       |    CAST(SUM(cnt) OVER (PARTITION BY col_name) AS BIGINT) AS n
       |  FROM hist),
       |med AS (SELECT col_name, MIN(v) AS median_v FROM cums
       |  WHERE cum >= (n + 1) // 2 GROUP BY col_name)
       |SELECT s.col_name, s.n_rows, s.n_null, s.n_distinct, s.min_v, s.max_v,
       |  m.median_v
       |FROM stats s LEFT JOIN med m USING (col_name)
       |ORDER BY s.col_name""".stripMargin
  }

  lazy val queries: Seq[Q] = Seq(
    Q("q159_profile_columns", columnProfile, Some(q159Sql)))
}

/** Registry hook. */
object ProfileOps {
  lazy val queries: Seq[Q] = ProfileOpsImpl.queries
}
