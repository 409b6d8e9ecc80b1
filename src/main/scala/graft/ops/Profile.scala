package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

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

  /** Exact cumulative counts over a (col_name, v, cnt) value histogram,
    * bucket-parallel (the q73/q115 two-pass prefix-sum discipline): a
    * naive `SUM OVER (PARTITION BY col_name ORDER BY v)` funnels each
    * column's whole distinct-value histogram through ONE reducer
    * (parallelism = #columns). Here each value buckets into its
    * power-of-2 bin (bit_length of the 2-dp canonical integer — monotone
    * in v, so ranks decompose by bin); pass 1 sums counts per
    * (column, bin) — ≤ 62 metadata rows per column — and a window over
    * that tiny frame yields each bin's offset plus the column total,
    * broadcast back; pass 2 runs the within-bin cumulative window, so
    * parallelism is columns × bins. `cum`/`n` are bit-identical to the
    * naive window, which is why the DuckDB oracles keep the plain
    * single-window form. */
  private[ops] def cumOverHist(hist: DataFrame): DataFrame = {
    val binned = hist
      .withColumn("b_k", expr("CAST(FLOOR(v * 100.0 + 0.5) AS BIGINT)"))
      .withColumn("b_bin", expr(QuantileSketchOpsImpl.binSql("b_k")))
      .drop("b_k")
    val offs = binned.groupBy(col("col_name"), col("b_bin"))
      .agg(sum(col("cnt")).as("c"))
      .withColumn("off", coalesce(
        sum(col("c")).over(Window.partitionBy(col("col_name"))
          .orderBy(col("b_bin")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("col_name"))))
      .select(col("col_name"), col("b_bin"), col("off"), col("n"))
    binned
      .withColumn("wcum", sum(col("cnt")).over(
        Window.partitionBy(col("col_name"), col("b_bin")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .join(broadcast(offs), Seq("col_name", "b_bin"))
      .withColumn("cum", col("off") + col("wcum"))
      .drop("b_bin", "wcum", "off")
  }

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
    val medians = cumOverHist(hist)
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

  /** Percentiles the q169 panel reports. */
  val QuantilePcts: Seq[Int] = Seq(25, 50, 75, 95, 99)

  /** q169: EXACT multi-quantile panel — p25/p50/p75/p95/p99 per profiled
    * column, each the smallest value whose cumulative count reaches
    * ⌈n·pct/100⌉ (pure integer rank arithmetic — no interpolation, no
    * approx sketch, bitwise identical in any engine). Same scale shape as
    * the q159 medians: one distinct-(column, value) histogram shuffle,
    * per-column cumulative windows, and the quantile grid is
    * columns × percentiles rows — the histogram is built ONCE for all
    * five percentiles (five approx_percentile calls would scan five
    * times and still not be deterministic). */
  def columnQuantiles(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val hist = li.select(explode(array(ProfileCols.map { c =>
        struct(lit(c).as("col_name"), col(c).as("v"))
      }: _*)).as("p"))
      .select(col("p.col_name").as("col_name"), col("p.v").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("col_name"), col("v")).agg(count(lit(1)).as("cnt"))
    val cums = cumOverHist(hist)
    val pcts = QuantilePcts.map(p => s"SELECT CAST($p AS BIGINT) AS pct")
      .mkString(" UNION ALL ")
    cums.crossJoin(broadcast(s.sql(pcts)))
      .filter(expr("cum * 100 >= n * pct"))
      .groupBy(col("col_name"), col("pct"))
      .agg(min(col("v")).as("value"))
      .orderBy(col("col_name"), col("pct"))
  }

  private lazy val q169Sql: String = {
    val histSel = ProfileCols.map(c =>
      s"SELECT '$c' AS col_name, $c AS v FROM lineitem WHERE $c IS NOT NULL")
      .mkString(" UNION ALL ")
    val pcts = QuantilePcts.map(p => s"SELECT CAST($p AS BIGINT) AS pct")
      .mkString(" UNION ALL ")
    s"""WITH vals AS ($histSel),
       |hist AS (SELECT col_name, v, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM vals GROUP BY col_name, v),
       |cums AS (SELECT col_name, v, cnt,
       |    CAST(SUM(cnt) OVER (PARTITION BY col_name ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
       |    CAST(SUM(cnt) OVER (PARTITION BY col_name) AS BIGINT) AS n
       |  FROM hist),
       |pcts AS ($pcts)
       |SELECT col_name, pct, MIN(v) AS value
       |FROM cums, pcts
       |WHERE cum * 100 >= n * pct
       |GROUP BY col_name, pct
       |ORDER BY col_name, pct""".stripMargin
  }

  /** Join keys the skew report profiles: (tag, table, column). */
  val SkewKeys: Seq[(String, String, String)] = Seq(
    ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
    ("lineitem.l_partkey", "lineitem", "l_partkey"),
    ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
    ("orders.o_custkey", "orders", "o_custkey"),
    ("events.user_id", "events", "user_id"))

  /** q167: JOIN-KEY SKEW report — the diagnostic a planner (or the person
    * choosing between plain/salted/AQE-split joins) reads before a big
    * join: per candidate key, distinct-key count, max and top-1-share of
    * per-key group sizes, and the exact median group size. A top-share
    * near 1/partitions means one reducer owns a whole wave; the salting
    * factor comes straight from max/median.
    *
    * Scale shape: per key, one map-side-combined (key → count) aggregate
    * (the frequency table is distinct-keys-sized), then metadata-scale
    * stats over it; the median rides the q38 histogram rank over group
    * SIZES (distinct sizes ≤ distinct keys). Nothing corpus-sized moves
    * after the first aggregate. */
  def joinSkewReport(s: SparkSession, dir: String): DataFrame = {
    val perKey = SkewKeys.map { case (tag, table, column) =>
      val freq = Tables(s, dir, table)
        .groupBy(col(column).as("k")).agg(count(lit(1)).as("cnt"))
      val stats = freq.agg(count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("n_rows"), max(col("cnt")).as("max_group"))
      val hist = freq.groupBy(col("cnt")).agg(count(lit(1)).as("m"))
      val wcum = Window.orderBy(col("cnt"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val med = hist
        .withColumn("cum", sum(col("m")).over(wcum))
        .withColumn("n", sum(col("m")).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .filter(col("cum") >= expr("(n + 1) div 2"))
        .agg(min(col("cnt")).as("median_group"))
      stats.crossJoin(broadcast(med))
        .select(lit(tag).as("join_key"), col("n_keys"), col("n_rows"),
          col("max_group"), col("median_group"),
          (col("max_group").cast(DoubleType) / col("n_rows").cast(DoubleType))
            .as("top_share"),
          (col("max_group").cast(DoubleType) / col("median_group").cast(DoubleType))
            .as("skew_factor"))
    }
    perKey.reduce(_ union _).orderBy(col("join_key"))
  }

  private lazy val q167Sql: String = {
    val per = SkewKeys.map { case (tag, table, column) =>
      s"""SELECT '$tag' AS join_key, st.n_keys, st.n_rows, st.max_group, md.median_group,
         |  CAST(st.max_group AS DOUBLE) / CAST(st.n_rows AS DOUBLE) AS top_share,
         |  CAST(st.max_group AS DOUBLE) / CAST(md.median_group AS DOUBLE) AS skew_factor
         |FROM (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows,
         |    CAST(MAX(cnt) AS BIGINT) AS max_group
         |  FROM (SELECT $column, COUNT(*) AS cnt FROM $table GROUP BY $column) f) st, (
         |  SELECT CAST(MIN(cnt) AS BIGINT) AS median_group FROM (
         |    SELECT cnt,
         |      SUM(m) OVER (ORDER BY cnt ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |      SUM(m) OVER () AS n
         |    FROM (SELECT cnt, COUNT(*) AS m FROM (
         |      SELECT $column, COUNT(*) AS cnt FROM $table GROUP BY $column) f GROUP BY cnt) h) c
         |  WHERE cum >= (n + 1) // 2) md""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT * FROM (
       |$per
       |) u ORDER BY join_key""".stripMargin
  }

  /** Foreign-key edges the RI audit checks: child (table, col) → parent
    * (table, col). */
  val RiEdges: Seq[(String, String, String, String)] = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"))

  /** q168: REFERENTIAL-INTEGRITY audit — orphan counts per foreign-key
    * edge (child rows whose key has no parent) plus null-key counts: the
    * data-quality gate every warehouse load runs before trusting joins
    * (an orphan silently disappears from an inner join — this panel is
    * how you notice BEFORE the revenue number is wrong).
    *
    * Scale shape: per edge, one left-anti join of the child's DISTINCT
    * keys (map-side combined, keys-sized) against the parent's key set,
    * then a child-side count of rows carrying an orphan key — the child
    * table streams once per edge and the orphan-key frame broadcasts. */
  def riAudit(s: SparkSession, dir: String): DataFrame = {
    val per = RiEdges.map { case (ct, cc, pt, pc) =>
      val child = Tables(s, dir, ct)
      val parent = Tables(s, dir, pt).select(col(pc).as("pk")).distinct()
      val orphanKeys = child.filter(col(cc).isNotNull)
        .select(col(cc).as("ck")).distinct()
        .join(parent, col("ck") === col("pk"), "left_anti")
      val orphanRows = child.join(broadcast(orphanKeys), col(cc) === col("ck"))
        .agg(count(lit(1)).as("orphan_rows"))
      val base = child.agg(count(lit(1)).as("child_rows"),
        sum(when(col(cc).isNull, 1L).otherwise(0L)).as("null_keys"))
      base.crossJoin(broadcast(orphanRows))
        .crossJoin(broadcast(orphanKeys.agg(count(lit(1)).as("orphan_keys"))))
        .select(lit(s"$ct.$cc -> $pt.$pc").as("fk_edge"), col("child_rows"),
          col("null_keys"), col("orphan_keys"), col("orphan_rows"))
    }
    per.reduce(_ union _).orderBy(col("fk_edge"))
  }

  private lazy val q168Sql: String = {
    val per = RiEdges.map { case (ct, cc, pt, pc) =>
      s"""SELECT '$ct.$cc -> $pt.$pc' AS fk_edge,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $ct) AS child_rows,
         |  (SELECT CAST(SUM(CASE WHEN $cc IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM $ct) AS null_keys,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM (
         |    SELECT DISTINCT $cc FROM $ct WHERE $cc IS NOT NULL
         |      AND $cc NOT IN (SELECT $pc FROM $pt)) o) AS orphan_keys,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $ct c WHERE c.$cc IN (
         |    SELECT DISTINCT $cc FROM $ct WHERE $cc IS NOT NULL
         |      AND $cc NOT IN (SELECT $pc FROM $pt))) AS orphan_rows""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT * FROM (
       |$per
       |) u ORDER BY fk_edge""".stripMargin
  }

  lazy val queries: Seq[Q] = Seq(
    Q("q159_profile_columns", columnProfile, Some(q159Sql)),
    Q("q167_profile_join_skew", joinSkewReport, Some(q167Sql)),
    Q("q169_profile_quantiles", columnQuantiles, Some(q169Sql)),
    Q("q168_profile_ri_audit", riAudit, Some(q168Sql)))
}

/** Registry hook. */
object ProfileOps {
  lazy val queries: Seq[Q] = ProfileOpsImpl.queries
}
