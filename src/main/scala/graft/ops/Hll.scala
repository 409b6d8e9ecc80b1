package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.{Q, Tables}

/** HYPERLOGLOG distinct-count sketches (q172) — the cardinality member of
  * the engine's mergeable-sketch family (count-min q132 = frequency, KMV
  * q121/q156 = distinct + set algebra, Bloom q94/q160 = membership). KMV
  * answers set OPERATIONS between sketch pairs; HLL is what a 100 TB
  * pipeline actually runs for per-source/overall cardinality monitoring,
  * because its per-group state is a fixed [[HllM]]-register byte array
  * whose merge is element-wise MAX — associative, commutative,
  * idempotent, so partial aggregation (map-side combine) and cross-source
  * union both come for free.
  *
  * Determinism discipline (the repo-wide rule that every gate hashes
  * bit-identically against DuckDB):
  *  - the hash is md5-derived (register = first byte, rank input = next
  *    60 bits), not engine RNG;
  *  - the rank (leading-zero count) is a generated 60-branch integer CASE
  *    chain — no log2(), which is libm-dependent;
  *  - the harmonic-mean denominator Σ 2^(−M_j) is computed EXACTLY as the
  *    integer Σ 2^(61−M_j) in DECIMAL(38,0) (each term a literal from a
  *    61-entry CASE — no floating sum-order dependence), with one final
  *    cast to double shared by both engines;
  *  - the bias constant α_m is spelled as the same double expression
  *    `0.7213 / (1.0 + 1.079 / m)` in both engines (identical IEEE ops).
  *
  * The small-range regime (raw estimate ≤ 2.5·m with empty registers —
  * where the paper switches to linear counting) GUARDS instead of
  * correcting: `hll_est`/`rel_err` come out NULL and `small_range` true,
  * because the ln() the correction needs breaks bitwise cross-engine
  * parity (the q35/q112 rational-idf rationale) and a source that small
  * should be counted exactly. q175's low-cardinality lineitem columns
  * (l_discount, l_tax) exercise the guard inside the gate; HllGuardSpec
  * pins both regimes.
  *
  * Scale shape: one narrow corpus pass → (source, register)-keyed MAX
  * aggregate (map-side combined, ≤ sources × [[HllM]] rows) → per-source
  * [[HllM]]-row reduce. The `__ALL__` row re-aggregates the REGISTERS
  * (MAX across sources), proving the merge property in-gate: the global
  * sketch is the register-wise max of the per-source sketches, never a
  * second corpus scan. The exact COUNT(DISTINCT) columns are the gate's
  * truth reference — a production run at 100 TB omits them (that exact
  * distinct is the very shuffle HLL exists to avoid).
  */
object HllOpsImpl {

  /** Register-index bits (m = 2^p registers). */
  val HllP = 8
  val HllM: Int = 1 << HllP

  /** Nibble extractor: `f` is the position-of-char function (Spark
    * `instr`, DuckDB `strpos`). */
  private def nib(f: String, md5Expr: String, i: Int): String =
    s"(CAST($f('0123456789abcdef', substr($md5Expr, $i, 1)) AS BIGINT) - 1)"

  /** Register index from the first 2 hex nibbles (8 bits → 0..255). */
  private def regSql(f: String, md5Expr: String): String =
    s"(${nib(f, md5Expr, 1)} * 16 + ${nib(f, md5Expr, 2)})"

  /** 60-bit rank input from nibbles 3..17. */
  private def vSql(f: String, md5Expr: String): String =
    (3 to 17).map { i =>
      val pow = java.math.BigInteger.valueOf(16L).pow(17 - i)
      s"${nib(f, md5Expr, i)} * $pow"
    }.mkString("(", " + ", ")")

  /** Leading-zero rank ρ ∈ 1..61 over the 60-bit value as a pure integer
    * CASE chain (v ≥ 2^(60−r) → ρ = r; v = 0 → 61). */
  private def rhoSql(vCol: String): String = {
    val branches = (1 to 60)
      .map(r => s"WHEN $vCol >= ${1L << (60 - r)} THEN $r")
      .mkString(" ")
    s"(CASE $branches ELSE 61 END)"
  }

  /** Exact per-register term 2^(61−ρ) as a 61-entry literal CASE (avoids
    * engine-specific shift operators; bare literals — Spark types
    * out-of-int-range ones as BIGINT, DuckDB has no `L` suffix). */
  private def termSql(rhoCol: String): String = {
    val branches = (1 to 61)
      .map(r => s"WHEN $rhoCol = $r THEN CAST(${1L << (61 - r)} AS BIGINT)")
      .mkString(" ")
    s"(CASE $branches END)"
  }

  /** α_m · m² · 2^61 — the numerator of the integer-denominator estimator
    * form, computed ONCE in JVM double arithmetic and injected as a
    * string-cast literal: a bare `0.7213` parses as DECIMAL in one engine
    * and DOUBLE in the other (the q80 literal-typing pitfall), and
    * Double.toString round-trips exactly through both engines' strtod. */
  private val estNum: Double =
    0.7213 / (1.0 + 1.079 / HllM) * HllM * HllM * 2305843009213693952.0
  private def estNumSql: String = s"CAST('$estNum' AS DOUBLE)"

  /** Raw estimate from the exact integer denominator: registers with no
    * observation contribute the full 2^61 (ρ = 0 ⇒ 2^(61−0)). */
  private def rawEstSql(sumCol: String, usedCol: String): String =
    s"$estNumSql / (CAST($sumCol AS DOUBLE) + " +
      s"CAST(($HllM - $usedCol) AS DOUBLE) * CAST(2305843009213693952 AS DOUBLE))"

  /** Small-range regime check (Flajolet et al.: raw HLL is biased below
    * ~2.5·m when registers remain empty — the branch where the paper
    * switches to linear counting). Both conjuncts are bitwise
    * cross-engine-stable: the raw estimate is the same IEEE expression on
    * both sides, and the threshold literal round-trips through strtod. */
  private def smallRangeSql(sumCol: String, usedCol: String): String =
    s"(${rawEstSql(sumCol, usedCol)} <= CAST('${2.5 * HllM}' AS DOUBLE) " +
      s"AND $usedCol < $HllM)"

  /** Guarded estimate: NULL in the small-range regime rather than a
    * silently biased number — linear counting needs ln(), which would
    * break bitwise cross-engine parity (the q35/q112 rationale), and a
    * monitored source this small should be counted exactly anyway. */
  private def estSql(sumCol: String, usedCol: String): String =
    s"CASE WHEN ${smallRangeSql(sumCol, usedCol)} THEN CAST(NULL AS DOUBLE) " +
      s"ELSE ${rawEstSql(sumCol, usedCol)} END"

  /** Test hooks: the generated SQL fragments, for the independent-md5
    * property lock in SketchSamplingSpec. */
  private[graft] def testRegSql(f: String, e: String): String = regSql(f, e)
  private[graft] def testVSql(f: String, e: String): String = vSql(f, e)
  private[graft] def testRhoSql(v: String): String = rhoSql(v)

  /** Add (reg, rho) to any (source, tok) frame — pure per-row math. */
  private[graft] def hashed(toks: DataFrame): DataFrame =
    toks
      .withColumn("h", md5(concat(lit("hll:"), col("tok"))))
      .withColumn("reg", expr(regSql("instr", "h")))
      .withColumn("v", expr(vSql("instr", "h")))
      .withColumn("rho", expr(rhoSql("v")))

  /** Per-token (source, tok, reg, rho) projection — pure per-row math,
    * batch and streaming frames alike; expects (source, text). */
  private[graft] def tokenized(docs: DataFrame): DataFrame =
    hashed(docs
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= ""))

  /** The register table (source, reg, m_reg) — the sketch itself. On a
    * STREAMING frame this is the incrementally-maintained form: MAX is
    * idempotent/commutative, so the keyed state is exactly the ≤
    * sources × [[HllM]] register rows and each arriving document folds in
    * without replay ([[graft.streaming.StreamHll]]). */
  private[graft] def registerRows(docs: DataFrame): DataFrame =
    tokenized(docs).groupBy(col("source"), col("reg"))
      .agg(max(col("rho")).as("m_reg"))

  /** Sketch assembly: (source, reg, m_reg) registers + per-source exact
    * distinct → the estimate panel row per source. */
  private[graft] def assemble(regs: DataFrame, exact: DataFrame): DataFrame =
    regs
      .withColumn("term", expr(termSql("m_reg")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("registers_used"),
        sum(col("term").cast("decimal(38,0)")).as("sum_scaled"))
      .join(exact, "source")
      .withColumn("hll_est", expr(estSql("sum_scaled", "registers_used")))
      .withColumn("small_range", expr(smallRangeSql("sum_scaled", "registers_used")))
      .select(col("source"), lit(HllM.toLong).as("m_registers"),
        col("registers_used"), col("n_exact"), col("hll_est"),
        ((col("hll_est") - col("n_exact").cast(DoubleType)) /
          col("n_exact").cast(DoubleType)).as("rel_err"),
        col("small_range"))
      .orderBy(col("source"))

  /** Per-source + `__ALL__` HLL cardinality vs exact distinct. */
  def hllCardinality(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val toks = tokenized(docs)
    // the sketch: sources × ≤256 rows, map-side-combined MAX — dedup-first
    // would force a full token shuffle the register MAX never needs (q175
    // profits from dedup-first only because its canonical numeric tokens
    // are low-cardinality; text tokens are not)
    val regs = registerRows(docs)
    // register-wise MAX across sources IS the merged global sketch
    val merged = regs.groupBy(col("reg")).agg(max(col("m_reg")).as("m_reg"))
      .withColumn("source", lit("__ALL__"))
      .select(col("source"), col("reg"), col("m_reg"))
    val exact = toks.groupBy(col("source"))
      .agg(countDistinct(col("tok")).as("n_exact"))
      .unionByName(toks.agg(countDistinct(col("tok")).as("n_exact"))
        .withColumn("source", lit("__ALL__"))
        .select(lit("__ALL__").as("source"), col("n_exact")))
    assemble(regs.unionByName(merged), exact)
  }

  /** Canonical 2-dp integer form of a profiled double column: identical
    * rounding expression in both engines, injective on the fixtures'
    * cent-grained values, and its BIGINT→string render (the hash input)
    * is formatting-stable cross-engine where a raw double's is not. */
  private def canonSql(c: String): String =
    s"CAST(FLOOR($c * 100.0 + 0.5) AS BIGINT)"

  /** q175: the SKETCHED column profiler — q159's exact distinct counts
    * replaced by the HLL estimate, column by column, with the exact count
    * kept alongside as the gate's truth reference. This is the profiler a
    * 100 TB deployment actually runs: q159's COUNT(DISTINCT) is one
    * shuffle of distinct values PER COLUMN, while the sketch form is a
    * single narrow pass emitting ≤ columns × [[HllM]] register rows — the
    * profile cost stops depending on column cardinality entirely. */
  def profileHll(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val vals = li.select(explode(array(ProfileOpsImpl.ProfileCols.map { c =>
        struct(lit(c).as("source"), expr(canonSql(c)).as("k"))
      }: _*)).as("p"))
      .select(col("p.source").as("source"), col("p.k").as("k"))
      .filter(col("k").isNotNull)
      .select(col("source"), col("k").cast("string").as("tok"))
    // ONE distinct shuffle serves both outputs: registers only need each
    // distinct token once (MAX rho is duplicate-insensitive), and the
    // exact reference is a map-side count over the same deduped frame —
    // where the naive form paid the explode twice (register agg + the
    // countDistinct's internal distinct expansion)
    val d = vals.distinct()
    val regs = hashed(d).groupBy(col("source"), col("reg"))
      .agg(max(col("rho")).as("m_reg"))
    val exact = d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_exact"))
    assemble(regs, exact)
      .withColumnRenamed("source", "col_name")
  }

  /** Oracle tail shared by q172/q175: expects a CTE `toks(source, tok,
    * reg, rho)`; `withAll` adds the register-merged `__ALL__` row. */
  private def oracleTailSql(withAll: Boolean, outKey: String): String = {
    val allRegs = if (withAll)
      s"""allregs AS (
         |  SELECT source, reg, m_reg FROM regs
         |  UNION ALL
         |  SELECT '__ALL__', reg, MAX(m_reg) FROM regs GROUP BY reg)"""
        .stripMargin
    else "allregs AS (SELECT source, reg, m_reg FROM regs)"
    val allEx = if (withAll)
      "UNION ALL\n  SELECT '__ALL__', CAST(COUNT(DISTINCT tok) AS BIGINT) FROM toks"
    else ""
    s"""regs AS MATERIALIZED (
       |  SELECT source, reg, MAX(rho) AS m_reg FROM toks GROUP BY source, reg),
       |$allRegs,
       |sk AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS registers_used,
       |    SUM(CAST(${termSql("m_reg")} AS DECIMAL(38,0))) AS sum_scaled
       |  FROM allregs GROUP BY source),
       |ex AS (
       |  SELECT source, CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_exact
       |  FROM toks GROUP BY source
       |  $allEx),
       |est AS (
       |  SELECT sk.source, CAST($HllM AS BIGINT) AS m_registers,
       |    registers_used, n_exact,
       |    ${estSql("sum_scaled", "registers_used")} AS hll_est,
       |    ${smallRangeSql("sum_scaled", "registers_used")} AS small_range
       |  FROM sk JOIN ex USING (source))
       |SELECT source AS $outKey, m_registers, registers_used, n_exact, hll_est,
       |  (hll_est - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE) AS rel_err,
       |  small_range
       |FROM est ORDER BY $outKey""".stripMargin
  }

  private lazy val q172Sql: String = {
    val md5E = "md5('hll:' || tok)"
    s"""WITH toks AS MATERIALIZED (
       |  SELECT source, tok, ${regSql("strpos", md5E)} AS reg,
       |    ${rhoSql(vSql("strpos", md5E))} AS rho
       |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
       |        FROM documents) t
       |  WHERE tok <> ''),
       |${oracleTailSql(withAll = true, outKey = "source")}""".stripMargin
  }

  private lazy val q175Sql: String = {
    val md5E = "md5('hll:' || tok)"
    val branches = ProfileOpsImpl.ProfileCols.map(c =>
      s"SELECT '$c' AS source, ${canonSql(c)} AS k FROM lineitem WHERE $c IS NOT NULL")
      .mkString("\n    UNION ALL\n    ")
    s"""WITH toks AS MATERIALIZED (
       |  SELECT source, tok, ${regSql("strpos", md5E)} AS reg,
       |    ${rhoSql(vSql("strpos", md5E))} AS rho
       |  FROM (SELECT source, CAST(k AS VARCHAR) AS tok FROM (
       |    $branches) v) t),
       |${oracleTailSql(withAll = false, outKey = "col_name")}""".stripMargin
  }

  lazy val queries: Seq[Q] = Seq(
    Q("q172_hll_cardinality", hllCardinality, Some(q172Sql), headline = true),
    Q("q175_profile_hll", profileHll, Some(q175Sql), headline = true))
}

object HllOps {
  lazy val queries: Seq[Q] = HllOpsImpl.queries
}
