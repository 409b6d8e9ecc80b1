package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.expr.ZOrder

/** Data-LAYOUT operators: multi-dimensional clustering (z-order) and the
  * measurement of what it buys — min/max data skipping on every clustered
  * dimension. At 100 TB the dominant cost of a selective query is the scan;
  * parquet row-group pruning against file-level min/max statistics is what
  * turns "read the corpus" into "read the overlapping files", and the SORT
  * ORDER of the data decides how tight those min/max boxes are. A
  * single-column sort gives perfect pruning on that column and none on any
  * other; interleaving the bits of two quantized columns (Morton order)
  * gives good pruning on BOTH — the `OPTIMIZE ZORDER BY` operation of
  * lakehouse table formats, here as a first-class engine operator over the
  * native codegen'd [[graft.expr.ZOrderExpr]].
  *
  * Reference scope note: the reference connector has no layout optimizer —
  * this extends the engine the same way the dedup/ANN/curation families do
  * (cited in SURVEY.md §6 as north-star extensions).
  */
object LayoutOpsImpl {

  /** Rows per simulated file (parquet row-group / file target). */
  val FileRows = 512

  /** The measured query band: the middle ~20 % of the 16-bit cell space. */
  val BandLo = 26214
  val BandHi = 39321

  /** Quantization: map a value into a 16-bit grid cell via broadcast
    * global min/max — identical SQL text on both engines so the cells (and
    * therefore every downstream z-value) are bitwise portable. */
  private def cellSql(v: String, mn: String, mx: String): String =
    s"CAST(LEAST(FLOOR((CAST($v AS DOUBLE) - $mn) / ($mx - $mn) * 65536.0), 65535) AS BIGINT)"

  private def cells(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    val st = o.agg(
      expr("MIN(CAST(o_totalprice AS DOUBLE))").as("mnp"),
      expr("MAX(CAST(o_totalprice AS DOUBLE))").as("mxp"),
      expr("MIN(CAST(o_custkey AS DOUBLE))").as("mnc"),
      expr("MAX(CAST(o_custkey AS DOUBLE))").as("mxc"))
    // single-row global stats frame: the one legitimate crossJoin shape
    o.crossJoin(broadcast(st))
      .select(col("o_orderkey"),
        expr(cellSql("o_totalprice", "mnp", "mxp")).as("cellx"),
        expr(cellSql("o_custkey", "mnc", "mxc")).as("celly"))
  }

  /** q125: the clustering key itself — 16-bit price × customer cells and
    * their Morton interleave, computed by the native codegen'd `zorder2`
    * expression in one narrow pass (the scan never shuffles; the only
    * exchange in the plan is the broadcast of the single-row stats). */
  def zorderKey(s: SparkSession, dir: String): DataFrame =
    cells(s, dir)
      .select(col("o_orderkey"), col("cellx"), col("celly"),
        graft.expr.ZOrderFunctions.zorder2(col("cellx"), col("celly")).as("zval"))
      .orderBy(col("o_orderkey"))

  /** Bucket-parallel global file assignment: rank within `bucket` (a PREFIX
    * of the layout's sort key, so bucket-then-rank equals the global
    * order), add broadcast per-bucket offsets, split into [[FileRows]]-row
    * files — the q73 discipline: no corpus-wide single-reducer window. At
    * production scale this is `repartitionByRange(zval)` + per-partition
    * file rolls; the explicit offset arithmetic here keeps the simulated
    * file boundaries bitwise reproducible for the oracle. */
  private def fileAssign(c: DataFrame, layout: String, bucketSql: String,
      orderCols: Seq[String]): DataFrame = {
    val b = c.withColumn("bucket", expr(bucketSql))
    val ranked = b.withColumn("r",
      row_number().over(Window.partitionBy(col("bucket"))
        .orderBy(orderCols.map(col): _*)).cast("long"))
    val offsets = b.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(
        sum(col("cnt")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("off"))
    ranked.join(broadcast(offsets), "bucket")
      .select(lit(layout).as("layout"),
        expr(s"CAST(FLOOR((off + r - 1) / $FileRows.0) AS BIGINT)").as("file"),
        col("cellx"), col("celly"), col("zval"))
  }

  /** q126: the data-skipping measurement — the same rows laid out two ways
    * (z-order vs single-column sort), split into files, and probed with a
    * selective band predicate on each dimension. A file must be scanned iff
    * its min/max box overlaps the band; `skip_fraction` is what the layout
    * saves. The linear layout wins slightly on its own sort column and
    * scans EVERYTHING for the other dimension; z-order prunes well on
    * both — the 4-row panel quantifies exactly that trade on real data. */
  def zorderSkipping(s: SparkSession, dir: String): DataFrame = {
    val z = cells(s, dir).withColumn("zval",
      graft.expr.ZOrderFunctions.zorder2(col("cellx"), col("celly")))
    // top-10-bit buckets: zval < 2^32, so /2^22 is a sort-prefix
    val zf = fileAssign(z, "zorder",
      "CAST(FLOOR(zval / 4194304.0) AS BIGINT)", Seq("zval", "o_orderkey"))
    val lf = fileAssign(z, "linear",
      "CAST(FLOOR(cellx / 256.0) AS BIGINT)", Seq("cellx", "o_orderkey"))
    val fs = zf.union(lf)
      .groupBy(col("layout"), col("file"))
      .agg(min(col("cellx")).as("mnx"), max(col("cellx")).as("mxx"),
        min(col("celly")).as("mny"), max(col("celly")).as("mxy"))
    val perLayout = fs.groupBy(col("layout")).agg(
      count(lit(1)).as("files_total"),
      sum(expr(s"CASE WHEN mxx >= $BandLo AND mnx <= $BandHi THEN 1 ELSE 0 END")).as("xs"),
      sum(expr(s"CASE WHEN mxy >= $BandLo AND mny <= $BandHi THEN 1 ELSE 0 END")).as("ys"))
    perLayout
      .select(col("layout"), col("files_total"), explode(array(
        struct(lit("x_band").as("query"), col("xs").as("files_scanned")),
        struct(lit("y_band").as("query"), col("ys").as("files_scanned")))).as("q"))
      .select(col("layout"), col("q.query").as("query"), col("files_total"),
        col("q.files_scanned").as("files_scanned"),
        expr("1.0 - CAST(q.files_scanned AS DOUBLE) / files_total").as("skip_fraction"))
      .orderBy(col("layout"), col("query"))
  }

  /** q150: the Hilbert clustering key — same 16-bit cells as q125, mapped
    * by the native codegen'd `hilbert2` traversal instead of the Morton
    * interleave. Same narrow plan shape: one pass, the only exchange is the
    * single-row stats broadcast. */
  def hilbertKey(s: SparkSession, dir: String): DataFrame =
    cells(s, dir)
      .select(col("o_orderkey"), col("cellx"), col("celly"),
        graft.expr.HilbertFunctions.hilbert2(col("cellx"), col("celly")).as("hval"))
      .orderBy(col("o_orderkey"))

  /** q151: the three-way layout shoot-out — the SAME rows split into the
    * SAME [[FileRows]]-row files under linear, Morton and Hilbert sort
    * orders, probed with the same selective band per dimension. Hilbert's
    * curve never takes Morton's long diagonal jumps, so its files' min/max
    * boxes are tighter and its skip fraction dominates Morton's on both
    * dimensions (measured, not asserted — the panel is the evidence a
    * layout decision actually needs). Measurement scale shape is q126's:
    * bucket-parallel ranks, broadcast offsets, metadata-sized file boxes. */
  def hilbertSkipping(s: SparkSession, dir: String): DataFrame = {
    val z = cells(s, dir)
      .withColumn("zval",
        graft.expr.ZOrderFunctions.zorder2(col("cellx"), col("celly")))
      .withColumn("hval",
        graft.expr.HilbertFunctions.hilbert2(col("cellx"), col("celly")))
    val zf = fileAssign(z, "zorder",
      "CAST(FLOOR(zval / 4194304.0) AS BIGINT)", Seq("zval", "o_orderkey"))
    val lf = fileAssign(z, "linear",
      "CAST(FLOOR(cellx / 256.0) AS BIGINT)", Seq("cellx", "o_orderkey"))
    val hf = fileAssign(z, "hilbert",
      "CAST(FLOOR(hval / 4194304.0) AS BIGINT)", Seq("hval", "o_orderkey"))
    val fs = zf.union(lf).union(hf)
      .groupBy(col("layout"), col("file"))
      .agg(min(col("cellx")).as("mnx"), max(col("cellx")).as("mxx"),
        min(col("celly")).as("mny"), max(col("celly")).as("mxy"))
    val perLayout = fs.groupBy(col("layout")).agg(
      count(lit(1)).as("files_total"),
      sum(expr(s"CASE WHEN mxx >= $BandLo AND mnx <= $BandHi THEN 1 ELSE 0 END")).as("xs"),
      sum(expr(s"CASE WHEN mxy >= $BandLo AND mny <= $BandHi THEN 1 ELSE 0 END")).as("ys"))
    perLayout
      .select(col("layout"), col("files_total"), explode(array(
        struct(lit("x_band").as("query"), col("xs").as("files_scanned")),
        struct(lit("y_band").as("query"), col("ys").as("files_scanned")))).as("q"))
      .select(col("layout"), col("q.query").as("query"), col("files_total"),
        col("q.files_scanned").as("files_scanned"),
        expr("1.0 - CAST(q.files_scanned AS DOUBLE) / files_total").as("skip_fraction"))
      .orderBy(col("layout"), col("query"))
  }

  /** q127: clustering HEALTH — the re-optimize trigger. Files written in
    * ARRIVAL order (ingestion appends) have z-ranges that straddle the
    * whole space, so any z-range query touches most of them; files written
    * in z-order have disjoint, tight ranges. `avg_overlap` = the average
    * number of files whose [z_min, z_max] intersects a given file's range
    * (self included): 1.0 is a perfectly clustered table, the file count
    * is a fully interleaved one. Lakehouse OPTIMIZE schedulers run exactly
    * this metric to decide when re-clustering pays for itself; here it is
    * an oracle-gated operator.
    *
    * Scale shape: everything after the file assignment is METADATA-sized —
    * per-file boxes are one row per file, and the overlap join is
    * |files|², i.e. thousands of rows for a 100 TB table. The file
    * assignment itself is the q73 bucket-parallel rank (arrival buckets =
    * FLOOR(key / FileRows), a monotone prefix of the arrival order). */
  def zorderHealth(s: SparkSession, dir: String): DataFrame = {
    val z = cells(s, dir).withColumn("zval",
      graft.expr.ZOrderFunctions.zorder2(col("cellx"), col("celly")))
    val arrival = fileAssign(z, "arrival",
      s"CAST(FLOOR(o_orderkey / $FileRows.0) AS BIGINT)", Seq("o_orderkey"))
    val zsorted = fileAssign(z, "zorder",
      "CAST(FLOOR(zval / 4194304.0) AS BIGINT)", Seq("zval", "o_orderkey"))
    val boxes = arrival.union(zsorted)
      .groupBy(col("layout"), col("file"))
      .agg(min(col("zval")).as("zmn"), max(col("zval")).as("zmx"))
    val overlaps = boxes.as("a").join(boxes.as("b"),
        col("a.layout") === col("b.layout")
          && col("a.zmn") <= col("b.zmx") && col("b.zmn") <= col("a.zmx"))
      .groupBy(col("a.layout").as("layout"))
      .agg(count(lit(1)).as("overlapping_pairs"))
    val totals = boxes.groupBy(col("layout")).agg(count(lit(1)).as("files_total"))
    totals.join(overlaps, "layout")
      .select(col("layout"), col("files_total"), col("overlapping_pairs"),
        expr("CAST(overlapping_pairs AS DOUBLE) / files_total").as("avg_overlap"))
      .orderBy(col("layout"))
  }

  /** Number of target range partitions the boundary planner emits. */
  val RangeSplits = 16

  /** q128: range-boundary PLANNER — the missing half of the production
    * z-order write path (`repartitionByRange` needs boundaries; Spark's
    * own RangePartitioner samples them nondeterministically, which is fine
    * for execution but useless as a reproducible artifact). Boundaries are
    * planned at z-PREFIX granularity (top 16 bits): a 65 536-row histogram
    * of prefix counts — metadata-sized no matter how big the corpus — and
    * for each split k the smallest prefix whose cumulative row count
    * reaches k/16 of the table. The same discipline as q38's
    * quantiles-from-histogram: the corpus is aggregated once and never
    * sorted. */
  def zorderRanges(s: SparkSession, dir: String): DataFrame = {
    val z = cells(s, dir).withColumn("zval",
      graft.expr.ZOrderFunctions.zorder2(col("cellx"), col("celly")))
    val hist = z.groupBy(expr("CAST(FLOOR(zval / 65536.0) AS BIGINT)").as("prefix"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        Window.orderBy(col("prefix"))
          .rowsBetween(Window.unboundedPreceding, 0)))
    val n = z.agg(count(lit(1)).as("n"))
    val splits = (1 until RangeSplits)
      .map(k => s"SELECT CAST($k AS BIGINT) AS split").mkString(" UNION ALL ")
    val grid = hist.crossJoin(broadcast(n))
      .crossJoin(broadcast(s.sql(splits)))
      .filter(expr(s"cum >= FLOOR(n * split / $RangeSplits.0)"))
      .groupBy(col("split"))
      .agg(min(col("prefix")).as("boundary_prefix"))
    val withRows = grid.join(broadcast(hist.select(col("prefix"), col("cum"))),
        col("boundary_prefix") === col("prefix"))
      .select(col("split"), col("boundary_prefix"), col("cum").as("rows_below"))
      .orderBy(col("split"))
    withRows
  }

  // ---------------------------------------------------------------- oracle

  private def cellCte: String =
    s"""st AS (
       |  SELECT MIN(CAST(o_totalprice AS DOUBLE)) AS mnp, MAX(CAST(o_totalprice AS DOUBLE)) AS mxp,
       |         MIN(CAST(o_custkey AS DOUBLE)) AS mnc, MAX(CAST(o_custkey AS DOUBLE)) AS mxc
       |  FROM orders),
       |c AS (
       |  SELECT o_orderkey,
       |    ${cellSql("o_totalprice", "mnp", "mxp")} AS cellx,
       |    ${cellSql("o_custkey", "mnc", "mxc")} AS celly
       |  FROM orders, st)""".stripMargin

  /** Shared oracle CTE text: bucket-parallel rank → FileRows-row files —
    * the SQL mirror of [[fileAssign]] (expects a `z` CTE with o_orderkey,
    * cellx, celly, zval). */
  private def rank(layout: String, bucket: String, ord: String): String =
    s"""SELECT '$layout' AS layout,
       |  CAST(FLOOR((off + r - 1) / $FileRows.0) AS BIGINT) AS file, cellx, celly, zval
       |FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY $ord) AS r
       |  FROM (SELECT *, $bucket AS bucket FROM z) zz
       |) rr JOIN (
       |  SELECT bucket, COALESCE(SUM(cnt) OVER (ORDER BY bucket
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
       |  FROM (SELECT $bucket AS bucket, COUNT(*) AS cnt FROM z GROUP BY 1) bc
       |) oo USING (bucket)""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("q125_zorder_key", zorderKey, Some(
      s"""WITH $cellCte
         |SELECT o_orderkey, cellx, celly,
         |  ${ZOrder.interleaveSql("cellx", "celly")} AS zval
         |FROM c ORDER BY o_orderkey""".stripMargin)),

    Q("q126_zorder_skipping", zorderSkipping, Some {
      s"""WITH $cellCte,
         |z AS (SELECT o_orderkey, cellx, celly,
         |  ${ZOrder.interleaveSql("cellx", "celly")} AS zval FROM c),
         |f AS (
         |${rank("linear", "CAST(FLOOR(cellx / 256.0) AS BIGINT)", "cellx, o_orderkey")}
         |UNION ALL
         |${rank("zorder", "CAST(FLOOR(zval / 4194304.0) AS BIGINT)", "zval, o_orderkey")}),
         |fs AS (
         |  SELECT layout, file, MIN(cellx) AS mnx, MAX(cellx) AS mxx,
         |         MIN(celly) AS mny, MAX(celly) AS mxy
         |  FROM f GROUP BY layout, file),
         |fl AS (
         |  SELECT layout, COUNT(*) AS files_total,
         |    SUM(CASE WHEN mxx >= $BandLo AND mnx <= $BandHi THEN 1 ELSE 0 END) AS xs,
         |    SUM(CASE WHEN mxy >= $BandLo AND mny <= $BandHi THEN 1 ELSE 0 END) AS ys
         |  FROM fs GROUP BY layout)
         |SELECT layout, query, files_total, CAST(files_scanned AS BIGINT) AS files_scanned,
         |  1.0 - CAST(files_scanned AS DOUBLE) / files_total AS skip_fraction
         |FROM (
         |  SELECT layout, 'x_band' AS query, files_total, xs AS files_scanned FROM fl
         |  UNION ALL
         |  SELECT layout, 'y_band', files_total, ys FROM fl)
         |ORDER BY layout, query""".stripMargin
    }),

    Q("q150_hilbert_key", hilbertKey, Some(
      s"""WITH $cellCte,
         |${graft.expr.Hilbert.chainSql("c",
              Seq("o_orderkey", "cellx", "celly"), "cellx", "celly")}
         |SELECT o_orderkey, cellx, celly, hacc AS hval
         |FROM h${graft.expr.Hilbert.Bits} ORDER BY o_orderkey""".stripMargin)),

    Q("q151_hilbert_skipping", hilbertSkipping, Some {
      s"""WITH $cellCte,
         |${graft.expr.Hilbert.chainSql("c",
              Seq("o_orderkey", "cellx", "celly"), "cellx", "celly")},
         |z AS (SELECT o_orderkey, cellx, celly,
         |  ${ZOrder.interleaveSql("cellx", "celly")} AS zval,
         |  hacc AS hval FROM h${graft.expr.Hilbert.Bits}),
         |f AS (
         |${rank("linear", "CAST(FLOOR(cellx / 256.0) AS BIGINT)", "cellx, o_orderkey")}
         |UNION ALL
         |${rank("zorder", "CAST(FLOOR(zval / 4194304.0) AS BIGINT)", "zval, o_orderkey")}
         |UNION ALL
         |${rank("hilbert", "CAST(FLOOR(hval / 4194304.0) AS BIGINT)", "hval, o_orderkey")}),
         |fs AS (
         |  SELECT layout, file, MIN(cellx) AS mnx, MAX(cellx) AS mxx,
         |         MIN(celly) AS mny, MAX(celly) AS mxy
         |  FROM f GROUP BY layout, file),
         |fl AS (
         |  SELECT layout, COUNT(*) AS files_total,
         |    SUM(CASE WHEN mxx >= $BandLo AND mnx <= $BandHi THEN 1 ELSE 0 END) AS xs,
         |    SUM(CASE WHEN mxy >= $BandLo AND mny <= $BandHi THEN 1 ELSE 0 END) AS ys
         |  FROM fs GROUP BY layout)
         |SELECT layout, query, files_total, CAST(files_scanned AS BIGINT) AS files_scanned,
         |  1.0 - CAST(files_scanned AS DOUBLE) / files_total AS skip_fraction
         |FROM (
         |  SELECT layout, 'x_band' AS query, files_total, xs AS files_scanned FROM fl
         |  UNION ALL
         |  SELECT layout, 'y_band', files_total, ys FROM fl)
         |ORDER BY layout, query""".stripMargin
    }),

    Q("q127_zorder_health", zorderHealth, Some(
      s"""WITH $cellCte,
         |z AS (SELECT o_orderkey, cellx, celly,
         |  ${ZOrder.interleaveSql("cellx", "celly")} AS zval FROM c),
         |f AS (
         |${rank("arrival", s"CAST(FLOOR(o_orderkey / $FileRows.0) AS BIGINT)", "o_orderkey")}
         |UNION ALL
         |${rank("zorder", "CAST(FLOOR(zval / 4194304.0) AS BIGINT)", "zval, o_orderkey")}),
         |bx AS (
         |  SELECT layout, file, MIN(zval) AS zmn, MAX(zval) AS zmx
         |  FROM f GROUP BY layout, file),
         |ov AS (
         |  SELECT a.layout AS layout, COUNT(*) AS overlapping_pairs
         |  FROM bx a JOIN bx b ON a.layout = b.layout
         |    AND a.zmn <= b.zmx AND b.zmn <= a.zmx
         |  GROUP BY a.layout),
         |tt AS (SELECT layout, COUNT(*) AS files_total FROM bx GROUP BY layout)
         |SELECT t.layout, t.files_total, o.overlapping_pairs,
         |  CAST(o.overlapping_pairs AS DOUBLE) / t.files_total AS avg_overlap
         |FROM tt t JOIN ov o USING (layout)
         |ORDER BY layout""".stripMargin)),

    Q("q128_zorder_ranges", zorderRanges, Some {
      val splits = (1 until RangeSplits)
        .map(k => s"SELECT CAST($k AS BIGINT) AS split").mkString(" UNION ALL ")
      s"""WITH $cellCte,
         |z AS (SELECT o_orderkey, cellx, celly,
         |  ${ZOrder.interleaveSql("cellx", "celly")} AS zval FROM c),
         |hist AS (
         |  SELECT CAST(FLOOR(zval / 65536.0) AS BIGINT) AS prefix, COUNT(*) AS cnt
         |  FROM z GROUP BY 1),
         |cumh AS (
         |  SELECT prefix, cnt, SUM(cnt) OVER (ORDER BY prefix
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM hist),
         |nn AS (SELECT COUNT(*) AS n FROM z),
         |sp AS ($splits),
         |g AS (
         |  SELECT split, MIN(prefix) AS boundary_prefix
         |  FROM cumh, nn, sp
         |  WHERE cum >= FLOOR(n * split / $RangeSplits.0)
         |  GROUP BY split)
         |SELECT g.split, g.boundary_prefix, CAST(c.cum AS BIGINT) AS rows_below
         |FROM g JOIN cumh c ON c.prefix = g.boundary_prefix
         |ORDER BY split""".stripMargin
    })
  )
}
