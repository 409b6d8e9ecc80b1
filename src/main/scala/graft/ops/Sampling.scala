package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Weighted PPS (probability-proportional-to-size) SAMPLING (q173) — the
  * budgeted-subsample step of training-data assembly: draw [[PpsDraws]]
  * documents with inclusion probability proportional to a per-document
  * weight (here token count, i.e. sample documents proportional to the
  * compute they will consume; a quality score plugs in the same way).
  * Systematic sampling over the cumulative-weight line is the
  * deterministic classic: lay the documents end-to-end on [0, W), drop an
  * evenly-spaced grid of n points offset by half a stride, and take the
  * document under each point. Reproducible bit-for-bit (no RNG), unbiased
  * for any fixed document order, and a document longer than one stride is
  * legitimately drawn more than once (that IS pps-with-replacement mass).
  *
  * Determinism + parity discipline: ALL selection arithmetic is integer —
  * a grid point j·W/(2n) (j odd) falls in a document's (prev, cum] span
  * iff 2n·prev < j·W ≤ 2n·cum, so both engines compare exact BIGINTs and
  * the kept set is engine-independent (no double grid positions).
  *
  * Scale shape: the cumulative weight uses the q73 two-pass prefix-sum
  * decomposition — per-bucket running sums in parallel windows plus a
  * broadcast (bucket → exclusive offset) table — NEVER a corpus-wide
  * single-partition window; then each document locally computes which
  * grid indices (if any) land in its span and explodes exactly those:
  * output rows = n draws, not corpus × n. One narrow scan, one bounded
  * window per bucket, one broadcast join.
  */
object SamplingOpsImpl {

  /** Number of systematic draws. */
  val PpsDraws = 64

  /** doc_id-range bucket width for the two-pass prefix sum. */
  val PpsBucket = 256L

  def ppsSample(s: SparkSession, dir: String): DataFrame = {
    val n2 = 2L * PpsDraws
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("bigint").as("w"))
      .withColumn("bucket", expr(s"doc_id div $PpsBucket"))
    val ranked = docs.withColumn("rsum",
      sum(col("w")).over(Window.partitionBy(col("bucket"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)))
    val offsets = docs.groupBy(col("bucket")).agg(sum(col("w")).as("bw"))
      .withColumn("off", coalesce(
        sum(col("bw")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("off"))
    val total = docs.agg(sum(col("w")).as("total_w"))
    val spans = ranked.join(broadcast(offsets), "bucket")
      .withColumn("cum", col("off") + col("rsum"))
      .withColumn("prev", col("cum") - col("w"))
      .crossJoin(broadcast(total))
    // grid points sit at j·W/(2n) for odd j; a document's span (prev, cum]
    // contains those with j in (2n·prev/W, 2n·cum/W] — exact integer end
    // points. The j_min > j_max guard matters twice: empty spans, and
    // Spark's 2-arg sequence() counts DOWN when start > stop.
    spans
      .withColumn("j_min", expr(s"($n2 * prev) div total_w + 1"))
      .withColumn("j_max", expr(s"($n2 * cum) div total_w"))
      .filter(col("j_min") <= col("j_max"))
      .select(col("doc_id"), col("w"), col("cum"), col("total_w"),
        explode(expr("sequence(j_min, j_max)")).as("j"))
      .filter(expr("j % 2 = 1"))
      .select(expr("(j - 1) div 2").as("draw"), col("doc_id"),
        col("w").as("weight"), col("total_w"))
      .orderBy(col("draw"))
  }

  private lazy val q173Sql: String = {
    val n2 = 2L * PpsDraws
    s"""WITH d AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS w
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, w,
       |    CAST(SUM(w) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
       |    CAST(SUM(w) OVER () AS BIGINT) AS total_w
       |  FROM d),
       |sp AS (
       |  SELECT doc_id, w, cum, cum - w AS prev, total_w,
       |    ($n2 * (cum - w)) // total_w + 1 AS j_min,
       |    ($n2 * cum) // total_w AS j_max
       |  FROM c),
       |ex AS (
       |  SELECT doc_id, w, cum, total_w, unnest(generate_series(j_min, j_max)) AS j
       |  FROM sp WHERE j_min <= j_max)
       |SELECT CAST((j - 1) // 2 AS BIGINT) AS draw, doc_id, w AS weight, total_w
       |FROM ex WHERE j % 2 = 1
       |ORDER BY draw""".stripMargin
  }

  lazy val queries: Seq[Q] = Seq(
    Q("q173_pps_sample", ppsSample, Some(q173Sql), headline = true))
}

object SamplingOps {
  lazy val queries: Seq[Q] = SamplingOpsImpl.queries
}
