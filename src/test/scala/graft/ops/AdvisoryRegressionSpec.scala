package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fixture rows (top-level: Spark encoders cannot instantiate inner case
  * classes). */
final case class BloomKeyed(o_orderkey: Long, file: Long)
final case class GapEv(user_id: Long, ems: Long, value: Double, event_id: Long)
final case class VocabTok(source: String, tok: String)

/** Regression locks for the round-6 advisor findings — each test pins the
  * exact edge case the finding described, on synthetic frames the sf
  * fixtures don't contain.
  */
class AdvisoryRegressionSpec extends SparkSpec {
  import spark.implicits._

  test("bloom skipping has NO false negatives, including hash-collision keys") {
    // find keys whose two Bloom positions collide (prob ~1/1024 per key):
    // exactly the keys the old `hits === BloomHashes` filter excluded even
    // when a file truly contained them
    val ids = spark.range(0, 5000).toDF("id")
    val colliding = ids
      .filter(expr(LayoutOpsImpl.bloomPosSql("id", 0)) ===
        expr(LayoutOpsImpl.bloomPosSql("id", 1)))
      .select(col("id")).as[Long].collect().toSeq
    assert(colliding.nonEmpty,
      "fixture must contain at least one position-collision key in 0..4999")

    val keyed = (0L until 5000L).map(k => BloomKeyed(k, k % 7)).toDF()
    val probes = (colliding ++ Seq(17L, 1234L, 4321L)).distinct
      .toDF("k")
    val got = LayoutOpsImpl.bloomSkippingKeyed(keyed, probes)
      .select(col("method"), col("n_keys"), col("total_scanned"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    // every probe key exists in the data, so `true` covers them all; a
    // false negative would either drop a key from the bloom row set
    // (n_keys short) or scan fewer files than truly contain it
    assert(got("bloom")._1 == got("true")._1,
      s"bloom must pass every truly-present key: $got")
    assert(got("bloom")._2 >= got("true")._2,
      s"bloom may over-scan (false positives) but never under-scan: $got")
  }

  test("gap-fill handles a user whose event span contains no hour boundary") {
    // user 1: single mid-hour event — grid start > max ems; the old
    // sequence() call THREW here. user 2: a normal span for forward fill.
    val ev = Seq(
      GapEv(1L, 1800000L + 600000L, 7.0, 100L),
      GapEv(2L, 1800000L, 5.0, 200L),
      GapEv(2L, 7800000L, 9.0, 201L)).toDF()
    val got = RelationalOps.gapFillHourlyFrom(ev)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(got == Seq(
      (2L, 3600000L, 5.0),
      (2L, 7200000L, 5.0)),
      s"user 1 yields no grid rows (and no crash); user 2 forward-fills: $got")
  }

  test("KMV union estimate is exact when the merged sketch is not full") {
    // |A ∪ B| = 9 < KmvK: the sketch holds the entire union, so the
    // (km−1)/kth_frac estimator (valid only for a FULL sketch) must give
    // way to the exact small-set count
    val v = (
      (1 to 5).map(i => VocabTok("a", s"t$i")) ++
        (3 to 9).map(i => VocabTok("b", s"t$i"))).toDF()
    val row = TextOpsImpl.kmvSetOpsFrom(v)
      .select(col("k"), col("union_est"), col("inter_est"), col("union_exact"),
        col("exact_inter"))
      .as[(Long, Double, Double, Long, Long)].collect().toSeq
    assert(row.size == 1)
    val (k, unionEst, interEst, unionExact, exactInter) = row.head
    assert(k == 9L && unionExact == 9L && exactInter == 3L)
    assert(unionEst == 9.0,
      s"small-sketch union estimate must be the exact sketch size: $unionEst")
    assert(math.abs(interEst - 3.0) < 1e-9,
      s"jaccard_est × exact union = exact intersection here: $interEst")
  }
}
