package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Property locks for the round-8 planning operators (q202–q204), beyond
  * their DuckDB gates: the gates prove cross-engine equality, these prove
  * the arithmetic means what it claims — budget conservation for the epoch
  * plan, a counting identity for the commonness score, and the
  * policy-dominance ordering for the padding sweep.
  */
class PipelinePlanningSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q202 epoch plan conserves the budget and caps at 4 epochs") {
    val plan = ScheduleOpsImpl.epochPlan(spark, sf).collect()
    assert(plan.nonEmpty)
    val unique = plan.map(r => r.getAs[Long]("unique_toks")).sum
    val target = plan.map(r => r.getAs[Long]("target_toks")).sum
    // each per-source target floors once, so Σ target ∈ (B - |sources|, B]
    val budget = 2L * unique
    assert(target <= budget && target > budget - plan.length,
      s"sum(target)=$target outside (${budget - plan.length}, $budget]")
    plan.foreach { r =>
      val toks = r.getAs[Long]("unique_toks")
      val tgt = r.getAs[Long]("target_toks")
      val capped = r.getAs[Long]("capped_toks")
      val deficit = r.getAs[Long]("deficit")
      val epochs = r.getAs[Double]("epochs")
      val over = r.getAs[Long]("over_cap")
      assert(capped == math.min(tgt, 4L * toks))
      assert(deficit == tgt - capped)
      assert(math.abs(epochs - tgt.toDouble / toks) < 1e-12)
      assert((over == 1L) == (tgt > 4L * toks))
      assert(capped <= 4L * toks)
    }
  }

  test("q203 commonness satisfies the sum-df identity and its bounds") {
    val sc = DedupOpsImpl.ngramCommonness(spark, sf)
    val rows = sc.collect()
    val docs = Tables(spark, sf, "documents").count()
    assert(rows.length == docs, "one score row per document")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_shingles")
      val sum = r.getAs[Long]("sum_df")
      val share = r.getAs[Double]("repeat_share")
      assert(n >= 1 && sum >= n)
      assert(share >= 0.0 && share < 1.0)
      assert(math.abs(share - (sum - n).toDouble / sum) < 1e-12)
    }
    // Σ_docs sum_df must equal Σ_shingles df² (each shingle contributes its
    // df to every one of its df documents) — an identity an aggregation bug
    // on either side would break.
    val lhs = rows.map(_.getAs[Long]("sum_df")).sum
    val rhs = DedupOpsImpl.shingles(spark, sf)
      .groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .agg(sum(col("df") * col("df"))).collect()(0).getLong(0)
    assert(lhs == rhs, s"sum_df total $lhs != sum of df^2 $rhs")
  }

  test("q204 padding policies dominate in the packed <= bucket <= fixed order") {
    val p = CurationPanelsImpl.paddingSweep(spark, sf).collect()
    assert(p.length == 4)
    p.foreach { r =>
      val l = r.getAs[Long]("max_len")
      val kept = r.getAs[Long]("tokens_kept")
      val fixed = r.getAs[Long]("pad_fixed")
      val bucket = r.getAs[Long]("pad_bucket")
      val packed = r.getAs[Long]("pad_packed")
      assert(packed < l, "full packing pads less than one sequence")
      assert(bucket <= fixed, "power-of-two bucketing never pads more than fixed")
      assert(packed <= bucket || bucket == 0,
        "packing is the floor once any padding exists")
      Seq("waste_fixed", "waste_bucket", "waste_packed").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v < 1.0)
      }
      assert(kept > 0)
    }
    // longer contexts monotonically increase fixed-pad waste on a corpus
    // whose docs top out near the smallest grid point
    val byLen = p.sortBy(_.getAs[Long]("max_len")).map(_.getAs[Double]("waste_fixed"))
    assert(byLen.zip(byLen.tail).forall { case (a, b) => a <= b })
  }
}
