package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** MERGEABLE quantile SKETCH (q178) — power-of-2 histogram quantiles next
  * to the exact q169 panel: per profiled column, each value folds into
  * the bin `bit_length(canonical 2-dp integer)` (≤ 61 bins per column, a
  * log-free integer CASE chain — the q172 rank trick), bins merge by SUM
  * (associative/commutative — per-partition sketches combine map-side,
  * cross-day sketches add), and a percentile reads off the cumulative bin
  * histogram as the first bin covering rank ⌈n·pct/100⌉. The estimate is
  * the bin's UPPER edge, so `est / exact ∈ [1, 2)` by construction —
  * the sketch carries its own worst-case bound and the panel reports the
  * realized ratio per (column, percentile) beside the exact value.
  *
  * Where q169's exact panel shuffles every distinct value, the sketch
  * form shuffles ≤ columns × 61 bin rows after a map-side-combined
  * count — the quantile monitor that costs the same at 100 TB as at
  * 100 MB, and the one you can maintain incrementally (bins add) while
  * exact quantiles must re-rank the world.
  *
  * Determinism: bins, counts and ranks are pure integers; the only
  * doubles are the bin-edge reconstruction (exact powers of two over
  * 100) and the final est/exact ratio — same expression text in both
  * engines.
  */
object QuantileSketchOpsImpl {

  /** Bin index = bit_length of the 2-dp canonical integer (0 for zero),
    * as a generated integer CASE chain — no log2 (libm). */
  private[ops] def binSql(kCol: String): String = {
    val branches = (60 to 1 by -1)
      .map(r => s"WHEN $kCol >= ${1L << (r - 1)} THEN $r")
      .mkString(" ")
    s"(CASE $branches ELSE 0 END)"
  }

  /** Upper value edge of bin b: (2^b − 1) / 100 in doubles (exact within
    * the profiled ranges) — a 62-entry literal CASE shared verbatim. */
  private def edgeSql(bCol: String): String = {
    val branches = (0 to 61)
      .map(b => s"WHEN $bCol = $b THEN CAST(${(1L << b) - 1} AS DOUBLE) / 100.0")
      .mkString(" ")
    s"(CASE $branches END)"
  }

  private def canonSql(c: String): String =
    s"CAST(FLOOR($c * 100.0 + 0.5) AS BIGINT)"

  /** The sketch itself: (col_name, bin, cnt), ≤ 61 bins per column,
    * SUM-mergeable, map-side combined. On a STREAMING frame this is the
    * incrementally-maintained form: COUNT folds per arriving row into the
    * (col_name, bin)-keyed state — bounded forever, no watermark needed —
    * and the stream-built table equals the batch sketch at every
    * micro-batch boundary ([[graft.streaming.StreamQuantile]]). */
  private[graft] def binRows(vals: DataFrame): DataFrame =
    vals.withColumn("bin", expr(binSql("k")))
      .groupBy(col("col_name"), col("bin")).agg(count(lit(1)).as("cnt"))

  /** Percentile readoff from a bin table (stream-built or batch-built —
    * StreamQuantileSpec asserts the caller can't tell): first bin whose
    * cumulative count covers rank n·pct/100; estimate = bin upper edge. */
  private[graft] def estFromBins(s: SparkSession, bins: DataFrame): DataFrame = {
    val wcum = Window.partitionBy(col("col_name")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cums = bins
      .withColumn("cum", sum(col("cnt")).over(wcum))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("col_name"))))
    val pcts = ProfileOpsImpl.QuantilePcts
      .map(p => s"SELECT CAST($p AS BIGINT) AS pct").mkString(" UNION ALL ")
    cums.crossJoin(broadcast(s.sql(pcts)))
      .filter(expr("cum * 100 >= n * pct"))
      .groupBy(col("col_name"), col("pct"))
      .agg(min(col("bin")).as("bin"))
      .withColumn("est", expr(edgeSql("bin")))
  }

  def quantileSketch(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val vals = li.select(explode(array(ProfileOpsImpl.ProfileCols.map { c =>
        struct(lit(c).as("col_name"), expr(canonSql(c)).as("k"))
      }: _*)).as("p"))
      .select(col("p.col_name").as("col_name"), col("p.k").as("k"))
      .filter(col("k").isNotNull)
    val est = estFromBins(s, binRows(vals))
    // exact reference: the q169 histogram rank over distinct VALUES,
    // through the same bucket-parallel two-pass as q159/q169 (the extra
    // ×100 inside cumOverHist keeps binning monotone on the already-
    // canonical integers — bins are internal, only cum/n are semantic)
    val vhist = vals.groupBy(col("col_name"), col("k")).agg(count(lit(1)).as("cnt"))
    val vcum = ProfileOpsImpl.cumOverHist(vhist.withColumnRenamed("k", "v"))
      .withColumnRenamed("v", "k")
    val pcts = ProfileOpsImpl.QuantilePcts
      .map(p => s"SELECT CAST($p AS BIGINT) AS pct").mkString(" UNION ALL ")
    val exact = vcum.crossJoin(broadcast(s.sql(pcts)))
      .filter(expr("cum * 100 >= n * pct"))
      .groupBy(col("col_name"), col("pct"))
      .agg(min(col("k")).as("ek"))
      .withColumn("exact", expr("CAST(ek AS DOUBLE) / 100.0"))
    est.join(exact, Seq("col_name", "pct"))
      .select(col("col_name"), col("pct"), col("bin"), col("est"), col("exact"),
        expr("CASE WHEN exact > 0.0 THEN est / exact END").as("ratio"))
      .orderBy(col("col_name"), col("pct"))
  }

  private lazy val q178Sql: String = {
    val histSel = ProfileOpsImpl.ProfileCols.map(c =>
      s"SELECT '$c' AS col_name, ${canonSql(c)} AS k FROM lineitem WHERE $c IS NOT NULL")
      .mkString(" UNION ALL ")
    val pcts = ProfileOpsImpl.QuantilePcts
      .map(p => s"SELECT CAST($p AS BIGINT) AS pct").mkString(" UNION ALL ")
    s"""WITH vals AS MATERIALIZED ($histSel),
       |bins AS (SELECT col_name, ${binSql("k")} AS bin,
       |    CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM vals GROUP BY 1, 2),
       |cums AS (SELECT col_name, bin, cnt,
       |    CAST(SUM(cnt) OVER (PARTITION BY col_name ORDER BY bin
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
       |    CAST(SUM(cnt) OVER (PARTITION BY col_name) AS BIGINT) AS n
       |  FROM bins),
       |pcts AS ($pcts),
       |est AS (
       |  SELECT col_name, pct, MIN(bin) AS bin
       |  FROM cums, pcts WHERE cum * 100 >= n * pct
       |  GROUP BY col_name, pct),
       |este AS (SELECT col_name, pct, bin, ${edgeSql("bin")} AS est FROM est),
       |vhist AS (SELECT col_name, k, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM vals GROUP BY col_name, k),
       |vcum AS (SELECT col_name, k, cnt,
       |    CAST(SUM(cnt) OVER (PARTITION BY col_name ORDER BY k
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
       |    CAST(SUM(cnt) OVER (PARTITION BY col_name) AS BIGINT) AS n
       |  FROM vhist),
       |ex AS (
       |  SELECT col_name, pct, MIN(k) AS ek
       |  FROM vcum, pcts WHERE cum * 100 >= n * pct
       |  GROUP BY col_name, pct),
       |exe AS (SELECT col_name, pct, CAST(ek AS DOUBLE) / 100.0 AS exact FROM ex)
       |SELECT e.col_name, e.pct, e.bin, e.est, x.exact,
       |  CASE WHEN x.exact > 0.0 THEN e.est / x.exact END AS ratio
       |FROM este e JOIN exe x ON x.col_name = e.col_name AND x.pct = e.pct
       |ORDER BY e.col_name, e.pct""".stripMargin
  }

  lazy val queries: Seq[Q] = Seq(
    Q("q178_quantile_sketch", quantileSketch, Some(q178Sql), headline = true))
}

object QuantileSketchOps {
  lazy val queries: Seq[Q] = QuantileSketchOpsImpl.queries
}
