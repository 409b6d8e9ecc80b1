package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}

/** Learned linear projection: top-2 principal components of the embedding
  * covariance by deterministic ORTHOGONAL POWER ITERATION — the learned
  * complement of the random JL sketch (q69): JL preserves distances in
  * expectation with no training; PCA spends a few corpus passes to find
  * the directions that actually carry the corpus' variance (drift plots,
  * whitening, cheap 2-d visual audits of cluster structure).
  *
  * The covariance matrix is NEVER materialized (64² cells × a 100 TB
  * corpus would be a 4096-way row amplification): each iteration computes
  * the matrix-vector products Cv and Cw matrix-free as
  * `Cv = (1/n) Σ_rows (x−μ)·((x−μ)ᵀv)` — ONE narrow pass projecting each
  * row onto the current iterate (a 64-term codegen'd dot with baked
  * μ/v/w literals, the kmeans-assignment shape) followed by a 128-cell
  * floor-quantized DECIMAL(38,0) aggregation (map-side combine ⇒ the
  * shuffle is 128 cells × partitions, metadata-sized). The projection is
  * MATERIALIZED before the aggregation (the [[VectorOpsImpl]] lloydStep
  * codegen split: fusing the dot into all 128 sums re-expands it 128× and
  * blows Janino's 64 KB method limit).
  *
  * Determinism, engine-portable end to end (the kmeans discipline):
  *  - init: v₀ = 1/8 ·(1,…,1), w₀ = 1/8 ·(+1,−1,…) — exactly orthogonal,
  *    exactly unit-norm (1/8 and ±1/8 are powers of two);
  *  - per round: v' = normalize(Cv); w' = normalize(Cw − (v'·Cw)v')
  *    (Gram-Schmidt, so the pair stays orthonormal BY CONSTRUCTION — no
  *    deflation against a half-converged v₁);
  *  - every corpus sum is floor-quantized at 1e12 into DECIMAL(38,0);
  *    every driver-side chain (dots, norms) is the same left-associated
  *    IEEE order the oracle SQL spells out; sqrt and decimal→double are
  *    correctly rounded in both engines — so the DuckDB oracle's unrolled
  *    fixed-iteration CTE chain reproduces the model bit for bit.
  *
  * Reference scope note: the reference connector (aws-samples
  * sample-keyspaces-cdc-streams-connectors) has no analytics operators at
  * all — this family extends the engine's training-data toolkit
  * (SURVEY.md §2's "beyond the reference" pipeline operators).
  */
object PcaOpsImpl {
  val Dims = 64
  val PcaIters = 6

  /** Learned model: mean, two orthonormal components, Rayleigh
    * eigenvalues, covariance trace (for explained-variance ratios). */
  final case class Model(
      n: Long,
      mu: Array[Double],
      v1: Array[Double],
      v2: Array[Double],
      lam1: Double,
      lam2: Double,
      trace: Double)

  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Model]()

  def clearCaches(): Unit = Memo.clearAny(modelCache)(_ => Seq.empty)

  private def embD(i: Int): Column =
    expr(s"CAST(element_at(embedding, $i) AS DOUBLE)")

  /** Floor-quantized exact sum: FLOOR(c·1e12) summed as DECIMAL(38,0),
    * returned as double — order-independent, bitwise equal to the oracle's
    * identical chain. (floor of a double is BIGINT in both engines'
    * intermediate; all quantities here are ≪ 2⁶³/1e12.) */
  private def qsum(c: Column): Column =
    sum(floor(c * lit(1e12)).cast(DecimalType(38, 0))).cast(DoubleType)

  /** μ then T orthogonal-iteration rounds then one Rayleigh/trace pass —
    * 2 + [[PcaIters]] corpus passes, k×64-double driver state only. */
  private[graft] def model(s: SparkSession, dir: String): Model =
    Memo.getOrCacheAny(modelCache, s, dir, { d =>
      val e = Tables(s, d, "embeddings").select(col("vec_id"), col("embedding"))

      // pass 0: n and the quantized mean (the q52 centroid discipline)
      val mrow = e.agg(count(lit(1)).as("n"),
        (1 to Dims).map(i => qsum(embD(i)).as(s"m$i")): _*).collect()(0)
      val n = mrow.getLong(0)
      val mu = (1 to Dims).map(i => mrow.getDouble(i) / 1e12 / n).toArray

      def dot(a: Array[Double], b: Array[Double]): Double =
        (0 until Dims).map(i => a(i) * b(i)).reduce(_ + _)
      def normalize(a: Array[Double]): Array[Double] = {
        val s0 = math.sqrt((0 until Dims).map(i => a(i) * a(i)).reduce(_ + _))
        a.map(_ / s0)
      }
      /** ONE fused pass: sv=(x−μ)·v, sw=(x−μ)·w per row feeding the 128
        * quantized sums of sv·(x_i−μ_i) and sw·(x_i−μ_i) in a single job.
        * Returns (Cv, Cw) with the 1/n already applied (raw/1e12/n, the
        * oracle's division order).
        *
        * Iteration-stable generated code (the NearestF64/DotF64 round-16
        * discipline): the centered array bakes only μ (fixed across
        * iterations) as inline constants, and v/w enter as array-literal
        * ARGUMENTS to dotf64 — ConstantFolding turns each into one codegen
        * reference object, so every iteration reuses the same compiled
        * stage instead of paying a fresh Janino pass over 128 new scalar
        * literals (the round-16 baseline's 2.7 s driver gap on
        * index:embed_pca_model). Bitwise parity: dotf64's widen-then-
        * multiply left-associative fold from 0.0 is the unrolled chain's
        * exact IEEE sequence (0.0 + t1 ≡ t1 — DotF64's scaladoc), and the
        * fused aggregate evaluates sv/sw once per row exactly like the
        * previous materialized view. Fusing is safe now because the
        * projection is two static calls, not 128 inlined terms (the old
        * split existed to stay under Janino's 64 KB method limit). */
      def cvw(v: Array[Double], w: Array[Double]): (Array[Double], Array[Double]) = {
        val centered = array((1 to Dims).map(i => embD(i) - lit(mu(i - 1))): _*)
        val st = e.select(col("embedding"),
          call_function("dotf64", centered, lit(v)).as("sv"),
          call_function("dotf64", centered, lit(w)).as("sw"))
        val sums =
          (1 to Dims).map(i => qsum(col("sv") * (embD(i) - lit(mu(i - 1)))).as(s"u$i")) ++
            (1 to Dims).map(i => qsum(col("sw") * (embD(i) - lit(mu(i - 1)))).as(s"z$i"))
        val r = st.agg(sums.head, sums.tail: _*).collect()(0)
        ((0 until Dims).map(i => r.getDouble(i) / 1e12 / n).toArray,
          (0 until Dims).map(i => r.getDouble(Dims + i) / 1e12 / n).toArray)
      }

      var v = Array.fill(Dims)(0.125)
      var w = (0 until Dims).map(i => if (i % 2 == 0) 0.125 else -0.125).toArray
      (1 to PcaIters).foreach { _ =>
        val (cv, cw) = cvw(v, w)
        val vn = normalize(cv)
        val dd = dot(vn, cw)
        v = vn
        w = normalize((0 until Dims).map(i => cw(i) - dd * vn(i)).toArray)
      }

      // final pass: Rayleigh eigenvalues (λ = vᵀCv, ‖v‖=1) + trace
      val (cv, cw) = cvw(v, w)
      val lam1 = dot(v, cv)
      val lam2 = dot(w, cw)
      val tsums = (1 to Dims).map(i =>
        qsum((embD(i) - lit(mu(i - 1))) * (embD(i) - lit(mu(i - 1)))).as(s"t$i"))
      val trow = e.agg(tsums.head, tsums.tail: _*).collect()(0)
      val trace = (0 until Dims).map(i => trow.getDouble(i) / 1e12 / n).reduce(_ + _)
      Model(n, mu, v, w, lam1, lam2, trace)
    })

  /** q141 gate: (component, eigenvalue, explained, d1..d64) — the learned
    * model as data, hash-matched against the oracle's full unrolled
    * fixed-iteration chain. Metadata-sized by construction. */
  def pcaComponents(s: SparkSession, dir: String): DataFrame = {
    val m = model(s, dir)
    val schema = StructType(Seq(
      StructField("component", LongType, nullable = false),
      StructField("eigenvalue", DoubleType, nullable = false),
      StructField("explained", DoubleType, nullable = false)) ++
      (1 to Dims).map(i => StructField(s"d$i", DoubleType, nullable = false)))
    val rows = Seq(
      org.apache.spark.sql.Row.fromSeq(1L +: m.lam1 +: (m.lam1 / m.trace) +: m.v1.toSeq),
      org.apache.spark.sql.Row.fromSeq(2L +: m.lam2 +: (m.lam2 / m.trace) +: m.v2.toSeq))
    s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
      .orderBy(col("component"))
  }

  /** q142 gate: every vector's 2-d PCA projection — ONE narrow codegen'd
    * scan with μ/v₁/v₂ baked as literals (the q62 encode shape: no join,
    * no shuffle; at 100 TB this is the whitening/visualization column you
    * write next to the corpus). */
  def pcaProject(s: SparkSession, dir: String): DataFrame = {
    val m = model(s, dir)
    def proj(a: Array[Double]): Column =
      (1 to Dims).map(i => (embD(i) - lit(m.mu(i - 1))) * lit(a(i - 1))).reduce(_ + _)
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), proj(m.v1).as("p1"), proj(m.v2).as("p2"))
      .orderBy(col("vec_id"))
  }

  // ----------------------------------------------------------- oracle SQL

  private def chain(f: Int => String): String = (1 to Dims).map(f).mkString(" + ")

  private def duckQsum(e: String): String =
    s"CAST(SUM(CAST(FLOOR(($e) * 1e12) AS DECIMAL(38,0))) AS DOUBLE)"

  /** The unrolled fixed-iteration model chain: CTE `pT` holds v1..v64,
    * w1..w64 after [[PcaIters]] rounds; `fin` holds λ/trace. Every CTE is
    * MATERIALIZED (DuckDB inlines CTEs; the recursion corollary from
    * SCALE.md applies to any reused chain). */
  private lazy val pcaChainSql: String = {
    val means = (1 to Dims).map(i =>
      s"${duckQsum(s"CAST(embedding[$i] AS DOUBLE)")} / 1e12 / COUNT(*) AS m$i")
      .mkString(",\n    ")
    def projSql(vcol: Int => String): String =
      chain(i => s"(CAST(e.embedding[$i] AS DOUBLE) - m.m$i) * ${vcol(i)}")
    /** The matrix-vector pass: sv/sw per row, then raw quantized sums. */
    def sgCtes(t: Int, prev: String): String = {
      val usums = (1 to Dims).map(i =>
        s"${duckQsum(s"s.sv * (CAST(s.embedding[$i] AS DOUBLE) - m.m$i)")} AS ru$i")
        .mkString(",\n    ")
      val zsums = (1 to Dims).map(i =>
        s"${duckQsum(s"s.sw * (CAST(s.embedding[$i] AS DOUBLE) - m.m$i)")} AS rz$i")
        .mkString(",\n    ")
      s"""s$t AS MATERIALIZED (
         |  SELECT e.embedding,
         |    (${projSql(i => s"p.v$i")}) AS sv,
         |    (${projSql(i => s"p.w$i")}) AS sw
         |  FROM embeddings e, $prev p, m),
         |g$t AS MATERIALIZED (
         |  SELECT
         |    $usums,
         |    $zsums
         |  FROM s$t s, m)""".stripMargin
    }
    /** Normalize/Gram-Schmidt layers turning raw sums into (v, w). */
    def stepCtes(t: Int, prev: String): String = {
      val divs = ((1 to Dims).map(i => s"g.ru$i / 1e12 / m.n AS u$i") ++
        (1 to Dims).map(i => s"g.rz$i / 1e12 / m.n AS z$i")).mkString(",\n    ")
      val vdiv = (1 to Dims).map(i => s"q.u$i / q.vs AS v$i").mkString(", ")
      val ys = (1 to Dims).map(i => s"o.z$i - o.d * o.v$i AS y$i").mkString(", ")
      val wdiv = (1 to Dims).map(i => s"x.y$i / x.ws AS w$i").mkString(", ")
      s"""${sgCtes(t, prev)},
         |n$t AS MATERIALIZED (SELECT
         |    $divs
         |  FROM g$t g, m),
         |q$t AS MATERIALIZED (
         |  SELECT *, sqrt(${chain(i => s"u$i * u$i")}) AS vs FROM n$t),
         |r$t AS MATERIALIZED (
         |  SELECT $vdiv, ${(1 to Dims).map(i => s"z$i").mkString(", ")} FROM q$t q),
         |o$t AS MATERIALIZED (
         |  SELECT *, (${chain(i => s"v$i * z$i")}) AS d FROM r$t),
         |y$t AS MATERIALIZED (
         |  SELECT ${(1 to Dims).map(i => s"v$i").mkString(", ")}, $ys FROM o$t o),
         |x$t AS MATERIALIZED (
         |  SELECT *, sqrt(${chain(i => s"y$i * y$i")}) AS ws FROM y$t),
         |p$t AS MATERIALIZED (
         |  SELECT ${(1 to Dims).map(i => s"v$i").mkString(", ")}, $wdiv FROM x$t x)"""
        .stripMargin
    }
    val p0 = s"p0 AS MATERIALIZED (SELECT ${(1 to Dims).map(i =>
      s"CAST(0.125 AS DOUBLE) AS v$i, CAST(${if (i % 2 == 1) "0.125" else "-0.125"} AS DOUBLE) AS w$i")
      .mkString(", ")})"
    val iters = (1 to PcaIters).map(t => stepCtes(t, s"p${t - 1}")).mkString(",\n")
    // final Rayleigh/trace pass over the converged pair (sums only — the
    // normalize layers are not needed for λ)
    val tsums = (1 to Dims).map(i =>
      s"${duckQsum(s"(CAST(e.embedding[$i] AS DOUBLE) - m.m$i) * (CAST(e.embedding[$i] AS DOUBLE) - m.m$i)")} AS rt$i")
      .mkString(",\n    ")
    s"""m AS MATERIALIZED (
       |  SELECT COUNT(*) AS n,
       |    $means
       |  FROM embeddings),
       |$p0,
       |$iters,
       |${sgCtes(PcaIters + 1, s"p$PcaIters")},
       |tr AS MATERIALIZED (
       |  SELECT
       |    $tsums
       |  FROM embeddings e, m),
       |fin AS MATERIALIZED (
       |  SELECT
       |    (${chain(i => s"p.v$i * (g.ru$i / 1e12 / m.n)")}) AS lam1,
       |    (${chain(i => s"p.w$i * (g.rz$i / 1e12 / m.n)")}) AS lam2,
       |    (${chain(i => s"t.rt$i / 1e12 / m.n")}) AS trace
       |  FROM p$PcaIters p, g${PcaIters + 1} g, tr t, m)""".stripMargin
  }

  lazy val queries: Seq[Q] = Seq(
    Q("q141_embed_pca", pcaComponents, Some {
      val v1cols = (1 to Dims).map(i => s"p.v$i AS d$i").mkString(", ")
      val v2cols = (1 to Dims).map(i => s"p.w$i AS d$i").mkString(", ")
      s"""WITH $pcaChainSql
         |SELECT CAST(1 AS BIGINT) AS component, f.lam1 AS eigenvalue,
         |  f.lam1 / f.trace AS explained,
         |  $v1cols
         |FROM fin f, p$PcaIters p
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), f.lam2, f.lam2 / f.trace, $v2cols
         |FROM fin f, p$PcaIters p
         |ORDER BY component""".stripMargin
    }, headline = true),
    Q("q142_embed_pca_project", pcaProject, Some {
      def projSql(vcol: Int => String): String =
        chain(i => s"(CAST(e.embedding[$i] AS DOUBLE) - m.m$i) * ${vcol(i)}")
      s"""WITH $pcaChainSql
         |SELECT e.vec_id,
         |  (${projSql(i => s"p.v$i")}) AS p1,
         |  (${projSql(i => s"p.w$i")}) AS p2
         |FROM embeddings e, m, p$PcaIters p
         |ORDER BY e.vec_id""".stripMargin
    }, headline = true))
}

/** Registry hook (the [[graft.Registry]] aggregation pattern). */
object PcaOps {
  lazy val queries: Seq[Q] = PcaOpsImpl.queries
}
