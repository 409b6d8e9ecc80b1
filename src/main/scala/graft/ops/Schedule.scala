package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{Q, Tables}

/** MIXTURE-faithful training ORDER (q189) — q170's temperature weights
  * decide HOW MUCH of each source to train on; this decides WHEN: a
  * deterministic stride schedule (the classic lottery/stride-scheduling
  * rule) where source s's k-th document lands at virtual time k / w_s, so
  * any prefix of the schedule realizes the target mixture proportions —
  * no RNG, no "shuffle and hope", reproducible across runs and engines.
  *
  * The gate emits the first 100 steps. Scale shape: a doc can appear at
  * step ≤ N only with per-source rank ≤ N, so the global interleave
  * window runs over a ≤ sources × N row frame — the corpus-wide ordering
  * is never materialized (the full schedule would compose the same key
  * with q73's bucket-parallel rank instead of one window). Per-source
  * ranks hash-partition by source; weights are a broadcast sources-row
  * frame.
  *
  * Determinism: token sums are exact BIGINTs; the only doubles are
  * √share and the stride key, identical expression text in both engines;
  * ties break on (key, source, doc_id) — a total order.
  */
object ScheduleOpsImpl {

  private val Steps = 100L

  def mixtureSchedule(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents").select(col("source"), col("doc_id"),
      expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n_tok"))
    val tok = d.groupBy(col("source")).agg(sum(col("n_tok")).cast(LongType).as("toks"))
    val tot = tok.agg(sum(col("toks")).cast(LongType).as("tt"))
    val w = tok.crossJoin(broadcast(tot))
      .select(col("source"),
        sqrt(col("toks").cast("double") / col("tt").cast("double")).as("wraw"))
    // Σwraw through the floor-1e12 decimal accumulator: a plain double
    // SUM is summation-order-dependent and diverged from the oracle in
    // the last ulp (the q170 lesson)
    val wsum = w.agg(expr(
      "CAST(SUM(CAST(FLOOR(wraw * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12")
      .as("ws"))
    val wgt = w.crossJoin(broadcast(wsum))
      .select(col("source"), (col("wraw") / col("ws")).as("wgt"))
    val ranked = d
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("doc_id"))).cast(LongType))
      .filter(col("rk") <= Steps) // rank > N can never reach step <= N
    ranked.join(broadcast(wgt), "source")
      .withColumn("vkey", col("rk").cast("double") / col("wgt"))
      .withColumn("step", row_number().over(
        Window.orderBy(col("vkey"), col("source"), col("doc_id"))).cast(LongType))
      .filter(col("step") <= Steps)
      .select(col("step"), col("source"), col("doc_id"), col("rk"),
        col("wgt"), col("vkey"))
      .orderBy(col("step"))
  }

  private lazy val q189Sql: String =
    s"""WITH d AS (
       |  SELECT source, doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
       |  FROM documents),
       |tok AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS toks FROM d GROUP BY 1),
       |tot AS (SELECT CAST(SUM(toks) AS BIGINT) AS tt FROM tok),
       |w AS (SELECT source, sqrt(CAST(toks AS DOUBLE) / CAST(tt AS DOUBLE)) AS wraw
       |      FROM tok CROSS JOIN tot),
       |ws AS (SELECT CAST(SUM(CAST(FLOOR(wraw * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS ws FROM w),
       |wgt AS (SELECT source, wraw / ws AS wgt FROM w CROSS JOIN ws),
       |ranked AS (
       |  SELECT source, doc_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS rk
       |  FROM d),
       |keyed AS (
       |  SELECT r.source, r.doc_id, r.rk, g.wgt,
       |    CAST(r.rk AS DOUBLE) / g.wgt AS vkey
       |  FROM ranked r JOIN wgt g ON g.source = r.source
       |  WHERE r.rk <= $Steps),
       |stepped AS (
       |  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY vkey, source, doc_id) AS BIGINT) AS step
       |  FROM keyed)
       |SELECT step, source, doc_id, rk, wgt, vkey
       |FROM stepped WHERE step <= $Steps ORDER BY step""".stripMargin

  /** q199: the schedule AUDITED — per source, the target weight vs the
    * share realized in the N-step prefix and the absolute gap. The stride
    * rule's whole point is that any prefix approximates the mixture;
    * this gate MEASURES that claim on the same frame q189 emits (gap ≤
    * one slot ≈ 1/N per source by the stride construction), so a
    * scheduler regression shows up as a widening gap, not a silent
    * mixture skew in some later training run. */
  def scheduleMix(s: SparkSession, dir: String): DataFrame =
    mixtureSchedule(s, dir)
      .groupBy(col("source"), col("wgt"))
      .agg(count(lit(1)).as("n_steps"))
      .select(col("source"), col("wgt").as("target_share"),
        col("n_steps"),
        (col("n_steps").cast("double") / Steps.toDouble).as("realized_share"),
        abs(col("n_steps").cast("double") / Steps.toDouble - col("wgt")).as("gap"))
      .orderBy(col("source"))

  private lazy val q199Sql: String =
    s"""SELECT source, wgt AS target_share,
       |  CAST(COUNT(*) AS BIGINT) AS n_steps,
       |  CAST(COUNT(*) AS DOUBLE) / ${Steps}.0 AS realized_share,
       |  abs(CAST(COUNT(*) AS DOUBLE) / ${Steps}.0 - wgt) AS gap
       |FROM ($q189Sql) sched
       |GROUP BY source, wgt ORDER BY source""".stripMargin

  /** Token budget as a multiple of the unique corpus: 2× forces some
    * sources past one epoch, so the plan actually exercises the repeat
    * logic on the fixtures (a ≤1× budget would trivially need no repeats). */
  private val BudgetMult = 2L

  /** Epochs beyond which repeated data stops helping — the ~4-epoch
    * "repeats are nearly as good as new data, then decay" knee measured by
    * Muennighoff et al., Scaling Data-Constrained Language Models (2023),
    * arXiv:2305.16264. Targets above the cap are flagged and truncated. */
  private val EpochCap = 4L

  /** q202: the EPOCH/REPEAT PLAN — q170/q189 decide the target mixture;
    * this decides what the mixture COSTS in repeats: for a token budget B
    * (= [[BudgetMult]] × unique corpus tokens) and the q189 temperature
    * weights, each source's target token count implies an epoch count
    * (target / unique). Sources whose target exceeds [[EpochCap]] epochs
    * are flagged and capped, and the capped deficit is reported — the
    * table a data-constrained training run reads to decide whether to
    * re-weight, crawl more of a source, or accept the diminishing-returns
    * repeats.
    *
    * Determinism: token sums are exact BIGINTs; weights are the q189
    * √share expressions (identical text both engines, Σ through the
    * floor-1e12 decimal accumulator); the target floors weight × budget
    * into a BIGINT, after which epochs is one double division and the
    * cap/deficit columns are pure BIGINT arithmetic. Scale shape: one
    * narrow corpus scan into a sources-row aggregate; everything after is
    * a broadcast of a sources-row frame — no second corpus pass, no
    * shuffle beyond the per-source token sum. */
  def epochPlan(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents").select(col("source"),
      expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n_tok"))
    val tok = d.groupBy(col("source")).agg(sum(col("n_tok")).cast(LongType).as("toks"))
    val tot = tok.agg(sum(col("toks")).cast(LongType).as("tt"))
    val w = tok.crossJoin(broadcast(tot))
      .select(col("source"), col("toks"), col("tt"),
        sqrt(col("toks").cast("double") / col("tt").cast("double")).as("wraw"))
    val wsum = w.agg(expr(
      "CAST(SUM(CAST(FLOOR(wraw * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12")
      .as("ws"))
    w.crossJoin(broadcast(wsum))
      .withColumn("weight", col("wraw") / col("ws"))
      .withColumn("target_toks",
        expr(s"CAST(FLOOR(weight * CAST($BudgetMult * tt AS DOUBLE)) AS BIGINT)"))
      .withColumn("epochs",
        col("target_toks").cast("double") / col("toks").cast("double"))
      .withColumn("capped_toks", least(col("target_toks"), col("toks") * EpochCap))
      .select(col("source"), col("toks").as("unique_toks"), col("weight"),
        col("target_toks"), col("epochs"), col("capped_toks"),
        (col("target_toks") - col("capped_toks")).as("deficit"),
        expr(s"CAST(CASE WHEN target_toks > toks * $EpochCap THEN 1 ELSE 0 END AS BIGINT)")
          .as("over_cap"))
      .orderBy(col("source"))
  }

  private lazy val q202Sql: String =
    s"""WITH d AS (
       |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
       |  FROM documents),
       |tok AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS toks FROM d GROUP BY 1),
       |tot AS (SELECT CAST(SUM(toks) AS BIGINT) AS tt FROM tok),
       |w AS (SELECT source, toks, tt,
       |        sqrt(CAST(toks AS DOUBLE) / CAST(tt AS DOUBLE)) AS wraw
       |      FROM tok CROSS JOIN tot),
       |ws AS (SELECT CAST(SUM(CAST(FLOOR(wraw * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS ws FROM w),
       |p AS (
       |  SELECT source, toks, wraw / ws AS weight,
       |    CAST(FLOOR((wraw / ws) * CAST($BudgetMult * tt AS DOUBLE)) AS BIGINT) AS target_toks
       |  FROM w CROSS JOIN ws)
       |SELECT source, toks AS unique_toks, weight, target_toks,
       |  CAST(target_toks AS DOUBLE) / CAST(toks AS DOUBLE) AS epochs,
       |  least(target_toks, toks * $EpochCap) AS capped_toks,
       |  target_toks - least(target_toks, toks * $EpochCap) AS deficit,
       |  CAST(CASE WHEN target_toks > toks * $EpochCap THEN 1 ELSE 0 END AS BIGINT) AS over_cap
       |FROM p ORDER BY source""".stripMargin

  lazy val queries: Seq[Q] = Seq(
    Q("q189_mixture_schedule", mixtureSchedule, Some(q189Sql)),
    Q("q199_schedule_mix", scheduleMix, Some(q199Sql)),
    Q("q202_epoch_plan", epochPlan, Some(q202Sql)))
}

object ScheduleOps {
  lazy val queries: Seq[Q] = ScheduleOpsImpl.queries
}
