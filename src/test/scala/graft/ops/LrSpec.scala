package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Trained logistic quality/language classifier (q143/q144): the
  * distributed quantized gradient aggregation must equal a sequential
  * pure-Scala BigInt recomputation bitwise, and the model must actually
  * LEARN (beat the base rate on the weakly-labeled task — stop_ratio
  * carries real English signal because the stopword list is English). */
class LrSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Sequential mirror of [[LrOpsImpl.model]]: same features, same σ̃,
    * same IEEE association, BigInt gradient accumulators. */
  private def scalaModel(): (IndexedSeq[(Array[Double], Long)], Long) = {
    val stop = TextOpsImpl.stopwords.toSet
    val rows = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang")).collect()
      .map { r =>
        val text = r.getString(1)
        val toks = text.split(" ", -1)
        val nTok = toks.length.toLong
        val x1 = math.min(nTok.toDouble / 50.0, 1.0)
        val x2 = toks.count(stop).toDouble / nTok
        val x3 = toks.distinct.length.toDouble / nTok
        val x4 = ((text.length.toDouble - (nTok - 1)) / nTok) / 8.0
        val y = if (r.getString(2) == "en") 1.0 else 0.0
        (y, Array(1.0, x1, x2, x3, x4))
      }
    val n = rows.length.toLong
    def sig(z: Double): Double = 0.5 + 0.5 * (z / (1.0 + math.abs(z)))
    def zOf(w: Array[Double], x: Array[Double]): Double =
      (1 to 4).foldLeft(w(0))((acc, i) => acc + x(i) * w(i))
    def pass(w: Array[Double]): (Array[Double], Long) = {
      val g = (0 until LrOpsImpl.NFeat).map { j =>
        rows.map { case (y, x) =>
          BigInt(math.floor(((y - sig(zOf(w, x))) * x(j)) * 1e12).toLong)
        }.sum.toDouble / 1e12 / n
      }.toArray
      val ok = rows.count { case (y, x) => (zOf(w, x) >= 0.0) == (y == 1.0) }.toLong
      (g, ok)
    }
    val h = IndexedSeq.newBuilder[(Array[Double], Long)]
    var w = Array.fill(LrOpsImpl.NFeat)(0.0)
    (0 until LrOpsImpl.LrIters).foreach { _ =>
      val (g, ok) = pass(w)
      h += ((w, ok))
      w = (0 until LrOpsImpl.NFeat).map(j => w(j) + LrOpsImpl.LrEta * g(j)).toArray
    }
    val (_, okFinal) = pass(w)
    h += ((w, okFinal))
    (h.result(), n)
  }

  test("q143 training trajectory equals the sequential BigInt recomputation bitwise") {
    LrOpsImpl.clearCaches()
    val (hist, n) = scalaModel()
    val got = LrOpsImpl.lrTrain(spark, dir).collect()
    assert(got.length == LrOpsImpl.LrIters + 1)
    got.foreach { r =>
      val t = r.getLong(0).toInt
      val (w, ok) = hist(t)
      (0 until LrOpsImpl.NFeat).foreach { j =>
        assert(r.getDouble(1 + j) == w(j), s"iter $t w$j")
      }
      assert(r.getLong(6) == ok, s"iter $t n_correct")
      assert(r.getLong(7) == n, s"iter $t n")
    }
  }

  test("the trained model beats the base rate and improves over training") {
    val m = LrOpsImpl.model(spark, dir)
    val accs = m.history.map(_._2)
    // iter 0 (zero weights ⇒ z = 0 ⇒ keep everything) scores exactly the
    // positive base rate; the trained model must do strictly better
    val baseRate = accs.head
    assert(accs.last > baseRate,
      s"final accuracy ${accs.last}/${m.n} must beat the keep-all base rate $baseRate/${m.n}")
  }

  test("q144 applies the final weights as one narrow scan, consistent with the trajectory") {
    val m = LrOpsImpl.model(spark, dir)
    val applied = LrOpsImpl.lrApply(spark, dir).collect()
    assert(applied.length.toLong == m.n)
    // n_correct of the final trajectory row == per-doc agreement count here
    val agree = applied.count(r => r.getBoolean(2) == r.getBoolean(3)).toLong
    assert(agree == m.history.last._2, "apply gate agrees with the trajectory accuracy")
    // p is the σ̃ probability: in (0,1), and keep ⇔ p >= 0.5
    applied.foreach { r =>
      val p = r.getDouble(1)
      assert(p > 0.0 && p < 1.0)
      assert(r.getBoolean(2) == (p >= 0.5), s"keep must equal p >= 0.5 for doc ${r.getLong(0)}")
    }
    LrOpsImpl.clearCaches()
  }

  test("q147 eval panel equals the brute-force pairwise recomputation") {
    val row = LrOpsImpl.lrEval(spark, dir).collect()(0)
    val applied = LrOpsImpl.lrApply(spark, dir).collect()
      .map(r => (r.getDouble(1), r.getBoolean(2), r.getBoolean(3))) // (p, keep, is_en)
    val tp = applied.count { case (_, k, y) => k && y }.toLong
    val fp = applied.count { case (_, k, y) => k && !y }.toLong
    val tn = applied.count { case (_, k, y) => !k && !y }.toLong
    val fn = applied.count { case (_, k, y) => !k && y }.toLong
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      == ((tp, fp, tn, fn)))
    val n = applied.length.toLong
    assert(row.getAs[Double]("accuracy") == (tp + tn).toDouble / n.toDouble)
    // rank-based AUC == the O(np·nn) Mann-Whitney definition, exactly:
    // both numerators are the same integer and IEEE division is correctly
    // rounded, so the two formulations agree bitwise
    val pos = applied.filter(_._3).map(_._1)
    val neg = applied.filterNot(_._3).map(_._1)
    val u = pos.iterator.map(pp =>
      neg.count(pn => pp > pn) + 0.5 * neg.count(pn => pp == pn)).sum
    assert(row.getAs[Double]("auc") == u / (pos.length.toDouble * neg.length.toDouble))
    // the score must carry real ordering signal even when the hard
    // classifier degenerates (it predicts all-negative at small SF)
    assert(row.getAs[Double]("auc") > 0.5)
    LrOpsImpl.clearCaches()
  }
}
