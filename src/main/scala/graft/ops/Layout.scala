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

  /** Bloom bits per file and hash functions for q160. */
  val BloomBits = 1024
  val BloomHashes = 2
  /** Probe-key selector: every o_orderkey divisible by this is probed. */
  val BloomProbeMod = 997

  /** q160: BLOOM-filter file skipping — the pruning structure min/max
    * statistics cannot replace: for POINT lookups on a high-cardinality
    * column laid out in arrival order, every file's [min, max] range is
    * wide (arrival order ≈ key order here is the best case — real ingest
    * is worse), while a per-file Bloom filter prunes by membership
    * regardless of ordering. This is exactly parquet's column Bloom
    * filter / the lakehouse file-skipping index, built and measured as an
    * engine operator: per probe key, the files a min/max reader must scan
    * vs the files a Bloom reader must scan vs the files that truly
    * contain it (the Bloom excess over truth is its false-positive cost,
    * visible in the panel).
    *
    * Determinism: hash positions are md5-nibble arithmetic (3 nibbles →
    * 12 bits, folded mod [[BloomBits]]) — the same bits in both engines;
    * a file "may contain" a key iff ALL [[BloomHashes]] positions are set.
    *
    * Scale shape: the per-file Bloom is METADATA — distinct (file, pos)
    * rows, ≤ files × BloomBits regardless of corpus size — and the probe
    * join keys on pos (uniform), so probing cost is
    * O(probe keys × files-per-pos). The corpus is scanned once to build
    * the index (the real deployment writes it at ingest, inside the same
    * commit as the file). File assignment reuses the q73 bucket-parallel
    * rank. */
  /** The Spark-side Bloom hash-position formula (h-th position of a key
    * expression), exposed for the collision regression spec. */
  private[graft] def bloomPosSql(keyExpr: String, h: Int): String = {
    val off = h * 3
    def nib(i: Int) =
      s"(instr('0123456789abcdef', substr(md5('blm:' || CAST($keyExpr AS STRING)), ${off + i}, 1)) - 1)"
    s"pmod(CAST(${nib(1)} * 256 + ${nib(2)} * 16 + ${nib(3)} AS BIGINT), $BloomBits)"
  }

  def bloomSkipping(s: SparkSession, dir: String): DataFrame = {
    // time-ordered ingest: files hold ~37 days of arrivals each, so every
    // file's o_orderkey [min, max] spans nearly the whole key domain and a
    // min/max reader prunes NOTHING — the regime Bloom filters exist for
    val keyed = Tables(s, dir, "orders")
      .select(col("o_orderkey"),
        expr("CAST(FLOOR(unix_millis(CAST(o_orderdate AS TIMESTAMP)) / 1000.0 / 86400.0 / 37.0) AS BIGINT)")
          .as("file"))
    val probes = Tables(s, dir, "orders")
      .filter(expr(s"o_orderkey % $BloomProbeMod = 0"))
      .select(col("o_orderkey").as("k")).distinct()
    bloomSkippingKeyed(keyed, probes)
  }

  /** [[bloomSkipping]]'s core over an explicit (o_orderkey, file)
    * assignment and probe-key set — split out so the no-false-negative
    * contract is testable on synthetic frames (incl. hash-collision keys
    * the sf fixtures may not contain). */
  private[graft] def bloomSkippingKeyed(keyed: DataFrame,
      probes: DataFrame): DataFrame = {
    // per-file bloom: distinct set positions (metadata-sized)
    val filePos = (0 until BloomHashes).map { h =>
      keyed.select(col("file"), expr(bloomPosSql("o_orderkey", h)).as("pos"))
    }.reduce(_ union _).distinct()
    // file min/max stats (what a range reader prunes with)
    val fileStats = keyed.groupBy(col("file"))
      .agg(min(col("o_orderkey")).as("mn"), max(col("o_orderkey")).as("mx"))
    val filesTotal = fileStats.count()
    val probePos = (0 until BloomHashes).map { h =>
      probes.select(col("k"), expr(bloomPosSql("k", h)).as("pos"))
    }.reduce(_ union _).distinct()
    // A key's two hash positions can collide (prob ~1/BloomBits); its probe
    // then yields ONE joined row per containing file, so requiring
    // hits == BloomHashes would produce Bloom false negatives. Compare
    // against the key's own distinct-position count instead.
    val keyNPos = probePos.groupBy(col("k")).agg(count(lit(1)).as("n_pos"))
    val bloomPass = broadcast(probePos).join(filePos, "pos")
      .groupBy(col("k"), col("file")).agg(count(lit(1)).as("hits"))
      .join(broadcast(keyNPos), "k")
      .filter(col("hits") === col("n_pos"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_files"))
      .select(lit("bloom").as("method"), col("k"), col("n_files"))
    val minmaxPass = broadcast(probes).join(fileStats,
        col("k") >= col("mn") && col("k") <= col("mx"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_files"))
      .select(lit("minmax").as("method"), col("k"), col("n_files"))
    val truePass = broadcast(probes).join(keyed, col("k") === col("o_orderkey"))
      .select(col("k"), col("file")).distinct()
      .groupBy(col("k")).agg(count(lit(1)).as("n_files"))
      .select(lit("true").as("method"), col("k"), col("n_files"))
    bloomPass.union(minmaxPass).union(truePass)
      .groupBy(col("method"))
      .agg(count(lit(1)).as("n_keys"), sum(col("n_files")).as("total_scanned"))
      .select(col("method"), col("n_keys"), lit(filesTotal).as("files_total"),
        col("total_scanned"),
        (col("total_scanned").cast("double") /
          (col("n_keys") * lit(filesTotal)).cast("double")).as("scan_fraction"))
      .orderBy(col("method"))
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

    Q("q160_bloom_skipping", bloomSkipping, Some {
      def posSql(keyExpr: String, h: Int): String = {
        val off = h * 3
        def nib(i: Int) =
          s"(strpos('0123456789abcdef', substr(md5('blm:' || CAST($keyExpr AS VARCHAR)), ${off + i}, 1)) - 1)"
        s"(CAST(${nib(1)} * 256 + ${nib(2)} * 16 + ${nib(3)} AS BIGINT) % $BloomBits)"
      }
      def posUnion(src: String, idCol: String, outCols: String): String =
        (0 until BloomHashes).map(h =>
          s"SELECT $outCols, ${posSql(idCol, h)} AS pos FROM $src")
          .mkString(" UNION ALL ")
      s"""WITH keyed AS (
         |  SELECT o_orderkey,
         |    CAST(FLOOR(epoch_ms(o_orderdate) / 1000.0 / 86400.0 / 37.0) AS BIGINT) AS file
         |  FROM orders),
         |fp AS (SELECT DISTINCT file, pos FROM (
         |  ${posUnion("keyed", "o_orderkey", "file")}) t),
         |fs AS (SELECT file, MIN(o_orderkey) AS mn, MAX(o_orderkey) AS mx
         |  FROM keyed GROUP BY file),
         |ft AS (SELECT CAST(COUNT(*) AS BIGINT) AS files_total FROM fs),
         |pk AS (SELECT DISTINCT o_orderkey AS k FROM orders
         |  WHERE o_orderkey % $BloomProbeMod = 0),
         |pp AS (SELECT DISTINCT k, pos FROM (
         |  ${posUnion("pk", "k", "k")}) t),
         |pn AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_pos FROM pp GROUP BY k),
         |bp AS (SELECT 'bloom' AS method, k, CAST(COUNT(*) AS BIGINT) AS n_files FROM (
         |    SELECT p.k, f.file, COUNT(*) AS hits
         |    FROM pp p JOIN fp f USING (pos) GROUP BY p.k, f.file) t
         |  JOIN pn USING (k) WHERE hits = n_pos GROUP BY k),
         |mp AS (SELECT 'minmax' AS method, k, CAST(COUNT(*) AS BIGINT) AS n_files
         |  FROM pk p JOIN fs f ON p.k >= f.mn AND p.k <= f.mx GROUP BY k),
         |tp AS (SELECT 'true' AS method, k, CAST(COUNT(*) AS BIGINT) AS n_files FROM (
         |    SELECT DISTINCT p.k, kk.file FROM pk p JOIN keyed kk ON kk.o_orderkey = p.k) t
         |  GROUP BY k),
         |u AS (SELECT * FROM bp UNION ALL SELECT * FROM mp UNION ALL SELECT * FROM tp),
         |agg AS (SELECT method, CAST(COUNT(*) AS BIGINT) AS n_keys,
         |    CAST(SUM(n_files) AS BIGINT) AS total_scanned
         |  FROM u GROUP BY method)
         |SELECT method, n_keys, files_total, total_scanned,
         |  CAST(total_scanned AS DOUBLE) / CAST(n_keys * files_total AS DOUBLE) AS scan_fraction
         |FROM agg, ft ORDER BY method""".stripMargin
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
