package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{Q, Tables}

/** JOIN-SIZE estimation from sketches (q198) — the optimizer statistic as
  * a gated operator: the self-join size Σ_k c(k)² (the fan-out a shuffle
  * join on this key would produce, and the second frequency moment F₂ the
  * AMS line of work estimates) is approximated by the count-min sketch's
  * per-row INNER PRODUCT Σ_h cell(h)² with the final estimate the MIN
  * over the [[TextOpsImpl.CmsDepth]] independent rows — an upper bound,
  * since colliding keys only add cross terms. The gate reports estimate,
  * exact, and the realized ratio: the number a planner consults before
  * choosing broadcast vs shuffle vs skew-salting, priced at a
  * depth × width integer grid instead of a distinct-key aggregate.
  *
  * Determinism: cells are exact BIGINT sums over md5-nibble hashes (the
  * q132 geometry, width 16 to force real collisions on the fixture); the
  * only double is the final ratio.
  *
  * Scale shape: at 100 TB each executor sketches its partition into the
  * depth × 16 grid and grids add cell-wise — one tiny reduce, no
  * key-space shuffle; the gate form aggregates per-key counts first only
  * so the DuckDB mirror is the same aggregation (additivity makes the
  * cell contents identical). The exact reference column IS the expensive
  * per-key aggregate the sketch replaces — production drops it.
  */
object JoinEstimateImpl {

  import TextOpsImpl.{CmsDepth, cmsHash}

  def joinSizeEstimate(s: SparkSession, dir: String): DataFrame = {
    val kc = Tables(s, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
    val withH = (0 until CmsDepth).map(i =>
      kc.select(col("cnt"), lit(i.toLong).as("r"),
        expr(cmsHash(i, "instr", "CAST(user_id AS STRING)"))
          .cast(LongType).as("h"))).reduce(_ union _)
    val cells = withH.groupBy(col("r"), col("h"))
      .agg(sum(col("cnt")).cast(LongType).as("total"))
    val perRow = cells.groupBy(col("r"))
      .agg(sum(col("total") * col("total")).cast(LongType).as("est_r"))
    val est = perRow.agg(min(col("est_r")).cast(LongType).as("cms_join_est"))
    val exact = kc.agg(
      count(lit(1)).cast(LongType).as("n_keys"),
      sum(col("cnt")).cast(LongType).as("n_rows"),
      sum(col("cnt") * col("cnt")).cast(LongType).as("exact_join"))
    exact.crossJoin(broadcast(est))
      .select(col("n_keys"), col("n_rows"), col("exact_join"),
        col("cms_join_est"),
        (col("cms_join_est").cast("double") /
          col("exact_join").cast("double")).as("ratio"))
  }

  private lazy val q198Sql: String = {
    val wh = (0 until CmsDepth).map(i =>
      s"SELECT cnt, $i AS r, ${cmsHash(i, "strpos", "CAST(user_id AS VARCHAR)")} AS h FROM kc")
      .mkString("\n  UNION ALL ")
    s"""WITH kc AS (
       |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM events GROUP BY 1),
       |wh AS (
       |  $wh),
       |cells AS (SELECT r, h, CAST(SUM(cnt) AS BIGINT) AS total
       |          FROM wh GROUP BY r, h),
       |per_row AS (SELECT r, CAST(SUM(total * total) AS BIGINT) AS est_r
       |            FROM cells GROUP BY r),
       |est AS (SELECT CAST(MIN(est_r) AS BIGINT) AS cms_join_est FROM per_row),
       |ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       |    CAST(SUM(cnt) AS BIGINT) AS n_rows,
       |    CAST(SUM(cnt * cnt) AS BIGINT) AS exact_join
       |  FROM kc)
       |SELECT n_keys, n_rows, exact_join, cms_join_est,
       |  CAST(cms_join_est AS DOUBLE) / CAST(exact_join AS DOUBLE) AS ratio
       |FROM ex CROSS JOIN est""".stripMargin
  }

  lazy val queries: Seq[Q] = Seq(
    Q("q198_join_size_estimate", joinSizeEstimate, Some(q198Sql)))
}

object JoinEstimateOps {
  lazy val queries: Seq[Q] = JoinEstimateImpl.queries
}
