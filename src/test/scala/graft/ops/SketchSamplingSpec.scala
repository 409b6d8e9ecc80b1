package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property locks for the round-7 operators, beyond their DuckDB gates:
  * the gates prove cross-engine equality, these prove the operators mean
  * what they claim (hash math matches an independent implementation,
  * estimator accuracy, systematic-sampling invariants, window stats equal
  * a brute-force recompute).
  */
class SketchSamplingSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("HLL register/rank SQL matches an independent Scala md5 computation") {
    val toks = Seq("scan", "filter", "läuft", "", "a b", "0", "tok42",
      "the-quick-brown-fox") ++ (0 until 200).map(i => s"w$i")
    val got = toks.toDF("tok")
      .withColumn("h", md5(concat(lit("hll:"), col("tok"))))
      .withColumn("reg", expr(HllOpsImpl.testRegSql("instr", "h")))
      .withColumn("v", expr(HllOpsImpl.testVSql("instr", "h")))
      .withColumn("rho", expr(HllOpsImpl.testRhoSql("v")))
      .select(col("tok"), col("reg"), col("rho"))
      .as[(String, Long, Int)].collect()
      .map { case (t, reg, rho) => t -> ((reg, rho)) }.toMap
    toks.foreach { t =>
      val hex = md5hex("hll:" + t)
      val reg = java.lang.Integer.parseInt(hex.substring(0, 2), 16)
      val v = java.lang.Long.parseLong(hex.substring(2, 17), 16)
      val rho = if (v == 0L) 61 else java.lang.Long.numberOfLeadingZeros(v) - 3
      assert(got(t) == ((reg.toLong, rho)),
        s"token '$t': sql=${got(t)} scala=($reg, $rho)")
    }
  }

  test("HLL estimate is within the expected error band of exact distinct") {
    val rows = HllOpsImpl.hllCardinality(spark, sf)
      .select(col("source"), col("n_exact"), col("hll_est"), col("rel_err"),
        col("small_range"))
      .as[(String, Long, Option[Double], Option[Double], Boolean)].collect()
    assert(rows.exists(_._1 == "__ALL__"), "merged __ALL__ row must exist")
    rows.foreach { case (src, n, est, rel, small) =>
      // the small-range guard: NULL estimate exactly when flagged
      assert(est.isEmpty == small && rel.isEmpty == small,
        s"$src: estimate must be NULL iff small_range ($est, $small)")
      if (n >= 1000 && !small) {
        // theoretical σ ≈ 1.04/√256 = 6.5%; 4σ is a generous but real bound
        assert(math.abs(rel.get) < 0.26, s"$src: est $est vs exact $n (rel $rel)")
      }
    }
  }

  test("PPS systematic sample: n distinct draws, monotone, long docs guaranteed") {
    val got = SamplingOpsImpl.ppsSample(spark, sf)
      .select(col("draw"), col("doc_id"), col("weight"), col("total_w"))
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got.size == SamplingOpsImpl.PpsDraws,
      s"exactly n draws: ${got.size}")
    assert(got.map(_._1) == (0L until SamplingOpsImpl.PpsDraws.toLong),
      "each grid index drawn exactly once")
    assert(got.map(_._2) == got.map(_._2).sorted,
      "systematic draws walk the doc_id order monotonically")
    val totalW = got.head._4
    val stride = totalW.toDouble / SamplingOpsImpl.PpsDraws
    val drawnIds = got.map(_._2).toSet
    val heavy = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("bigint").as("w"))
      .filter(col("w") > lit(stride))
      .select(col("doc_id")).as[Long].collect()
    heavy.foreach(id => assert(drawnIds.contains(id),
      s"doc $id heavier than one stride must be drawn"))
  }

  test("quantile sketch: est/exact in [1,2), bin = bit_length of the exact value") {
    val rows = QuantileSketchOpsImpl.quantileSketch(spark, sf)
      .select(col("col_name"), col("pct"), col("bin"), col("est"), col("exact"))
      .as[(String, Long, Int, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (c, p, bin, est, exact) =>
      val k = math.floor(exact * 100.0 + 0.5).toLong
      if (k > 0) {
        val ratio = est / exact
        assert(ratio >= 1.0 - 1e-12 && ratio < 2.0,
          s"$c p$p: est $est / exact $exact = $ratio outside [1,2)")
        assert(bin == 64 - java.lang.Long.numberOfLeadingZeros(k),
          s"$c p$p: bin $bin != bit_length($k)")
      } else assert(bin == 0, s"$c p$p: zero value must land in bin 0")
    }
  }

  test("quantile sketch bins are mergeable: halves sum to the whole") {
    val li = graft.Tables(spark, sf, "lineitem")
      .select(col("l_quantity").as("v"), (crc32(concat_ws("|",
        col("l_orderkey"), col("l_linenumber"))) % 2).as("half"))
      .withColumn("k", expr("CAST(FLOOR(v * 100.0 + 0.5) AS BIGINT)"))
      .withColumn("bin", expr(QuantileSketchOpsImpl.binSql("k")))
    val whole = li.groupBy("bin").count()
      .as[(Int, Long)].collect().toMap
    val merged = li.groupBy("half", "bin").count()
      .groupBy("bin").agg(sum("count").as("count"))
      .as[(Int, Long)].collect().toMap
    assert(whole == merged, "summed half-sketches must equal the full sketch")
  }

  test("burst z-scores equal a brute-force trailing-window recompute") {
    val got = MonitorOpsImpl.eventBursts(spark, sf)
      .select(col("hour"), col("n_events"), col("n_prev"), col("z"))
      .as[(Long, Long, Long, Option[Double])].collect().toSeq.sortBy(_._1)
    assert(got.nonEmpty)
    val byHour = got.map(r => r._1 -> r._2).toMap
    got.foreach { case (h, c, nPrev, z) =>
      val prev = ((h - 24) to (h - 1)).flatMap(byHour.get)
      assert(prev.size.toLong == nPrev, s"hour $h n_prev")
      if (nPrev >= MonitorOpsImpl.BurstMinPrev) {
        val mean = prev.sum.toDouble / prev.size
        val varr = prev.map(p => p * p).sum.toDouble / prev.size - mean * mean
        if (varr > 0.0) {
          val zExp = (c.toDouble - mean) / math.sqrt(varr)
          assert(z.isDefined && math.abs(z.get - zExp) < 1e-9,
            s"hour $h: z ${z} vs $zExp")
        } else assert(z.isEmpty)
      } else assert(z.isEmpty, s"cold-start hour $h must have NULL z")
    }
  }
}
