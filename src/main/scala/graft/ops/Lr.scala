package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}

/** TRAINED quality/language classifier — the learning half of q82's
  * fixed-weight linear filter (the production workflow: weak labels →
  * train a cheap linear model → bake the learned weights into the narrow
  * codegen'd scan every ingest runs). Weak label here: `lang = 'en'`,
  * predicted from the same per-doc quality features q82 computes — the
  * stopword list is English, so `stop_ratio` carries real signal and the
  * learned boundary is the fastText-style "distill a language/quality
  * heuristic into a linear scorer" shape.
  *
  * Full-batch gradient ascent on the logistic likelihood, made
  * deterministic and engine-portable end to end:
  *  - the sigmoid is the libm-free algebraic surrogate
  *    σ̃(z) = 0.5 + 0.5·z/(1+|z|) (monotone, (0,1); only +,×,/,abs — ln
  *    and exp are libm-dependent and would break bitwise parity);
  *  - each iteration is ONE pass over the cached features view: a 5-term
  *    logit chain with the current weights baked as literals, then 5
  *    floor-quantized DECIMAL(38,0) gradient sums + a correct-prediction
  *    count (map-side combine ⇒ the shuffle is 7 cells × partitions);
  *  - the update w ← w + η·g/n uses the same division order in both
  *    engines; every chain is left-associated to match the oracle SQL.
  *
  * Scale shape: the features view is computed ONCE (the expensive
  * tokenize) and cached — at 100 TB it is the materialized features table
  * every training framework builds; each of the [[LrIters]] rounds then
  * costs one narrow scan of it with a 7-cell aggregate. Driver state is
  * 5 doubles. The apply gate (q144) is q82's baked-literal narrow scan
  * with learned constants.
  */
object LrOpsImpl {
  /** Features: x0 = 1 (bias), x1 len_sat, x2 stop_ratio, x3 distinct_ratio,
    * x4 avg_tok_len — exactly q82's definitions. */
  val NFeat = 5
  val LrIters = 8
  val LrEta = 0.5

  final case class Model(history: IndexedSeq[(Array[Double], Long)], n: Long) {
    def weights: Array[Double] = history.last._1
  }

  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Model]()
  private val featCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def clearCaches(): Unit = {
    Memo.clearAny(modelCache)(_ => Seq.empty)
    Memo.clear(featCache)
  }

  /** Featurize an arbitrary (doc_id, text, lang) frame — batch and
    * streaming alike (every feature is a stateless narrow expression, so
    * graft.streaming.StreamScore scores an arriving stream with the same
    * column definitions the trainer used — no train/serve skew). */
  private[graft] def featurize(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("toks")).cast(LongType))
      .withColumn("x1", least(col("n_tok").cast(DoubleType) / 50.0, lit(1.0)))
      .withColumn("x2",
          expr(s"CAST(size(filter(toks, x -> x IN ${TextOpsImpl.stopwordsInList})) AS BIGINT)")
            .cast(DoubleType) / col("n_tok"))
      .withColumn("x3",
          size(array_distinct(col("toks"))).cast(DoubleType) / col("n_tok"))
        // mean token length pre-scaled to O(1): raw avg_tok_len (~5) makes
        // full-batch steps overshoot the σ̃ boundary and the trajectory
        // oscillates keep-all/keep-none instead of settling (observed);
        // conditioning features to a common scale is the standard fix
      .withColumn("x4",
          ((length(col("text")).cast(DoubleType) - (col("n_tok") - lit(1L))) / col("n_tok"))
            / lit(8.0))
      .withColumn("y", when(col("lang") === "en", lit(1.0)).otherwise(lit(0.0)))
      .select(col("doc_id"), col("y"), col("x1"), col("x2"), col("x3"), col("x4"))

  /** Cached per-doc features + weak label (one tokenize per corpus). */
  private def features(s: SparkSession, dir: String): DataFrame =
    Memo.getOrCache(featCache, s, dir, { _ =>
      featurize(Tables(s, dir, "documents")).cache()
    })

  private def qsum(c: Column): Column =
    sum(floor(c * lit(1e12)).cast(DecimalType(38, 0))).cast(DoubleType)

  /** Logit chain with the given weights baked as literals — left-assoc
    * w0 + x1·w1 + x2·w2 + x3·w3 + x4·w4, the oracle's exact order. */
  private[graft] def logit(w: Array[Double]): Column =
    (1 to 4).foldLeft[Column](lit(w(0)))((acc, i) => acc + col(s"x$i") * lit(w(i)))

  /** σ̃(z) = 0.5 + 0.5·z/(1+|z|). */
  private[graft] def sig(z: Column): Column =
    lit(0.5) + lit(0.5) * (z / (lit(1.0) + abs(z)))

  /** One pass: gradient raw sums for each feature + correct-prediction
    * count under the CURRENT weights. Returns (gradient, nCorrect, n). */
  private def pass(f: DataFrame, w: Array[Double]): (Array[Double], Long, Long) = {
    val z = logit(w)
    val resid = col("y") - sig(z)
    val aggs =
      Seq(qsum(resid).as("g0")) ++
        (1 to 4).map(i => qsum(resid * col(s"x$i")).as(s"g$i")) ++
        Seq(sum(when((z >= lit(0.0)) === (col("y") === lit(1.0)), 1L).otherwise(0L))
          .as("ok"),
          count(lit(1)).as("n"))
    val r = f.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = r.getLong(6)
    ((0 until NFeat).map(j => r.getDouble(j) / 1e12 / n).toArray, r.getLong(5), n)
  }

  private[graft] def model(s: SparkSession, dir: String): Model =
    Memo.getOrCacheAny(modelCache, s, dir, { d =>
      val f = features(s, d)
      val h = IndexedSeq.newBuilder[(Array[Double], Long)]
      var w = Array.fill(NFeat)(0.0)
      var n = 0L
      (0 until LrIters).foreach { _ =>
        val (g, ok, nn) = pass(f, w)
        n = nn
        h += ((w, ok))
        w = (0 until NFeat).map(j => w(j) + LrEta * g(j)).toArray
      }
      val (_, okFinal, _) = pass(f, w) // accuracy of the final weights
      h += ((w, okFinal))
      Model(h.result(), n)
    })

  /** q143 gate: the training trajectory — (iter, w_bias..w_avglen,
    * n_correct, n), iter 0 = the zero model, iter [[LrIters]] = final.
    * Metadata-sized by construction; hash-matched against the oracle's
    * unrolled fixed-iteration chain. */
  def lrTrain(s: SparkSession, dir: String): DataFrame = {
    val m = model(s, dir)
    val schema = StructType(Seq(
      StructField("iter", LongType, nullable = false),
      StructField("w_bias", DoubleType, nullable = false),
      StructField("w_len", DoubleType, nullable = false),
      StructField("w_stop", DoubleType, nullable = false),
      StructField("w_distinct", DoubleType, nullable = false),
      StructField("w_avglen", DoubleType, nullable = false),
      StructField("n_correct", LongType, nullable = false),
      StructField("n", LongType, nullable = false)))
    val rows = m.history.zipWithIndex.map { case ((w, ok), t) =>
      org.apache.spark.sql.Row(t.toLong, w(0), w(1), w(2), w(3), w(4), ok, m.n)
    }
    s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
      .orderBy(col("iter"))
  }

  /** q144 gate: the learned filter applied — per doc σ̃-probability, keep
    * decision and the weak label, as ONE narrow scan with the trained
    * weights baked as literals (exactly how q82 deploys, with learned
    * constants). */
  def lrApply(s: SparkSession, dir: String): DataFrame = {
    val w = model(s, dir).weights
    val f = features(s, dir)
    val z = logit(w)
    f.select(col("doc_id"), sig(z).as("p"), (z >= lit(0.0)).as("keep"),
        (col("y") === lit(1.0)).as("is_en"))
      .orderBy(col("doc_id"))
  }

  /** q147 gate: the evaluation panel for the trained classifier — confusion
    * matrix, accuracy/precision/recall, and exact rank-based AUC (the
    * Mann-Whitney formulation with average ranks for ties:
    * AUC = (Σ_pos rank̄ − nPos(nPos+1)/2) / (nPos·nNeg)). Training a filter
    * without measuring it is how curation pipelines rot; this panel is the
    * measurement half of q143/q144, mirroring what q77/q113 do for ANN.
    *
    * Determinism: every count is an integer; ranks are computed on the
    * distinct-SCORE histogram with ties resolved by the average-rank rule,
    * carried as 2×-scaled integers (rank2 = 2·(cum−cnt)+cnt+1) so nothing
    * fractional exists until the single final division per metric — the
    * same bits in any engine, any partitioning. (Integer exactness bounds:
    * nPos·nNeg overflows int64 past ~6e9 docs; shard the eval or move the
    * product to DECIMAL(38,0) there.)
    *
    * Scale shape: one narrow scan of the cached features view for the
    * confusion counts; the AUC side aggregates to the distinct-score
    * histogram (map-side combine) and ranks it with the q73 two-pass
    * decomposition — a 256-way-parallel window keyed on the score's
    * leading byte (monotone in p, so (bucket, p) order IS p order) plus a
    * broadcast 256-row offset table. No single reducer ever sees the
    * corpus, even if every document's score is unique. */
  def lrEval(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val wt = model(s, dir).weights
    val f = features(s, dir)
    val z = logit(wt)
    val scored = f.select(sig(z).as("p"), (z >= lit(0.0)).as("pred"),
      (col("y") === lit(1.0)).as("pos"))
    val conf = scored.agg(
      sum(when(col("pred") && col("pos"), 1L).otherwise(0L)).as("tp"),
      sum(when(col("pred") && !col("pos"), 1L).otherwise(0L)).as("fp"),
      sum(when(!col("pred") && !col("pos"), 1L).otherwise(0L)).as("tn"),
      sum(when(!col("pred") && col("pos"), 1L).otherwise(0L)).as("fn"))
    val hist = scored.groupBy(col("p"))
      .agg(count(lit(1)).as("cnt"), sum(when(col("pos"), 1L).otherwise(0L)).as("npos"))
      .withColumn("bucket", floor(col("p") * lit(256.0)).cast(LongType))
    val ranked = hist.withColumn("cumb",
      sum(col("cnt")).over(w.partitionBy(col("bucket")).orderBy(col("p"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    val offsets = hist.groupBy(col("bucket")).agg(sum(col("cnt")).as("c"))
      .withColumn("off", coalesce(
        sum(col("c")).over(w.orderBy(col("bucket"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("bucket"), col("off"))
    val auc = ranked.join(broadcast(offsets), "bucket")
      .select(col("npos"),
        ((col("off") + col("cumb") - col("cnt")) * lit(2L) + col("cnt") + lit(1L)).as("rank2"))
      .agg(sum(col("npos") * col("rank2")).as("sumrank2"), sum(col("npos")).as("np"))
    // zero-denominator metrics (e.g. a model that never predicts positive)
    // are NULL by definition in both engines — Spark ANSI would throw and
    // DuckDB would yield NaN, neither of which hash-compares
    def ratio(num: Column, den: Column): Column =
      when(den > lit(0L), num.cast(DoubleType) / den.cast(DoubleType))
    conf.crossJoin(broadcast(auc)).select(
      col("tp"), col("fp"), col("tn"), col("fn"),
      ratio(col("tp") + col("tn"),
        col("tp") + col("fp") + col("tn") + col("fn")).as("accuracy"),
      ratio(col("tp"), col("tp") + col("fp")).as("precision"),
      ratio(col("tp"), col("tp") + col("fn")).as("recall"),
      ratio(col("sumrank2") - col("np") * (col("np") + lit(1L)),
        col("np") * (col("tp") + col("fp") + col("tn") + col("fn") - col("np")) * lit(2L))
        .as("auc"))
  }

  // ----------------------------------------------------------- oracle SQL

  private def duckQsum(e: String): String =
    s"CAST(SUM(CAST(FLOOR(($e) * 1e12) AS DECIMAL(38,0))) AS DOUBLE)"

  /** Feature + label CTE (q82's feature SQL + the weak label). */
  private lazy val featSql: String = {
    val stopSql = TextOpsImpl.stopwordsInList
    s"""t AS MATERIALIZED (
       |  SELECT doc_id, lang, length(text) AS n_chars,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x IN $stopSql)) AS BIGINT) AS n_stop,
       |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_dis
       |  FROM documents),
       |f AS MATERIALIZED (
       |  SELECT doc_id,
       |    CASE WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS y,
       |    least(CAST(n_tok AS DOUBLE) / 50.0, 1.0) AS x1,
       |    CAST(n_stop AS DOUBLE) / n_tok AS x2,
       |    CAST(n_dis AS DOUBLE) / n_tok AS x3,
       |    ((CAST(n_chars AS DOUBLE) - (n_tok - 1)) / n_tok) / 8.0 AS x4
       |  FROM t)""".stripMargin
  }

  private def zSql(wref: String): String =
    s"$wref.w0 + l.x1 * $wref.w1 + l.x2 * $wref.w2 + l.x3 * $wref.w3 + l.x4 * $wref.w4"

  private def sigSql(z: String): String =
    s"0.5 + 0.5 * (($z) / (1.0 + abs($z)))"

  /** Unrolled training chain: CTE `w$t` = weights after t updates; `e$t` =
    * the pass under w$t (gradient raw sums + correct count). */
  private lazy val lrChainSql: String = {
    def passCte(t: Int): String = {
      val grads = Seq(s"${duckQsum(s"l.y - (${sigSql("l.z")})")} AS rg0") ++
        (1 to 4).map(i =>
          s"${duckQsum(s"(l.y - (${sigSql("l.z")})) * l.x$i")} AS rg$i")
      s"""z$t AS MATERIALIZED (
         |  SELECT l.*, (${zSql("w")}) AS z FROM f l, w$t w),
         |e$t AS MATERIALIZED (
         |  SELECT
         |    ${grads.mkString(",\n    ")},
         |    SUM(CASE WHEN (l.z >= 0.0) = (l.y = 1.0) THEN 1 ELSE 0 END) AS ok,
         |    COUNT(*) AS n
         |  FROM z$t l)""".stripMargin
    }
    def updateCte(t: Int): String = {
      val ws = (0 until NFeat).map(j =>
        s"w.w$j + $LrEta * (e.rg$j / 1e12 / e.n) AS w$j").mkString(", ")
      s"w${t + 1} AS MATERIALIZED (SELECT $ws FROM w$t w, e$t e)"
    }
    val w0 = s"w0 AS MATERIALIZED (SELECT ${(0 until NFeat)
      .map(j => s"CAST(0.0 AS DOUBLE) AS w$j").mkString(", ")})"
    val steps = (0 until LrIters).map(t => s"${passCte(t)},\n${updateCte(t)}")
      .mkString(",\n")
    s"""$featSql,
       |$w0,
       |$steps,
       |${passCte(LrIters)}""".stripMargin
  }

  lazy val queries: Seq[Q] = Seq(
    Q("q143_text_lr_train", lrTrain, Some {
      val rows = (0 to LrIters).map(t =>
        s"""SELECT CAST($t AS BIGINT) AS iter, w.w0 AS w_bias, w.w1 AS w_len,
           |  w.w2 AS w_stop, w.w3 AS w_distinct, w.w4 AS w_avglen,
           |  CAST(e.ok AS BIGINT) AS n_correct, CAST(e.n AS BIGINT) AS n
           |FROM w$t w, e$t e""".stripMargin).mkString("\nUNION ALL\n")
      s"""WITH $lrChainSql
         |$rows
         |ORDER BY iter""".stripMargin
    }, headline = true),
    Q("q144_text_lr_apply", lrApply, Some(
      s"""WITH $lrChainSql
         |SELECT l.doc_id, (${sigSql(s"(${zSql("w")})")}) AS p,
         |  (${zSql("w")}) >= 0.0 AS keep, l.y = 1.0 AS is_en
         |FROM f l, w$LrIters w
         |ORDER BY l.doc_id""".stripMargin), headline = true),
    Q("q147_text_lr_eval", lrEval, Some(
      s"""WITH $lrChainSql,
         |scored AS MATERIALIZED (
         |  SELECT (${sigSql(s"(${zSql("w")})")}) AS p,
         |    (${zSql("w")}) >= 0.0 AS pred, l.y = 1.0 AS pos
         |  FROM f l, w$LrIters w),
         |conf AS MATERIALIZED (
         |  SELECT
         |    CAST(SUM(CASE WHEN pred AND pos THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |    CAST(SUM(CASE WHEN pred AND NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |    CAST(SUM(CASE WHEN NOT pred AND NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS tn,
         |    CAST(SUM(CASE WHEN NOT pred AND pos THEN 1 ELSE 0 END) AS BIGINT) AS fn
         |  FROM scored),
         |hist AS MATERIALIZED (
         |  SELECT p, CAST(FLOOR(p * 256.0) AS BIGINT) AS bucket,
         |    CAST(COUNT(*) AS BIGINT) AS cnt,
         |    CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS npos
         |  FROM scored GROUP BY p),
         |ranked AS MATERIALIZED (
         |  SELECT bucket, cnt, npos,
         |    CAST(SUM(cnt) OVER (PARTITION BY bucket ORDER BY p
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumb
         |  FROM hist),
         |offs AS MATERIALIZED (
         |  SELECT bucket, CAST(COALESCE(SUM(c) OVER (ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
         |  FROM (SELECT bucket, SUM(cnt) AS c FROM hist GROUP BY bucket) t),
         |auc AS MATERIALIZED (
         |  SELECT
         |    CAST(SUM(npos * ((o.off + r.cumb - r.cnt) * 2 + r.cnt + 1)) AS BIGINT) AS sumrank2,
         |    CAST(SUM(npos) AS BIGINT) AS np
         |  FROM ranked r JOIN offs o ON r.bucket = o.bucket)
         |SELECT tp, fp, tn, fn,
         |  CASE WHEN tp + fp + tn + fn > 0 THEN
         |    CAST(tp + tn AS DOUBLE) / CAST(tp + fp + tn + fn AS DOUBLE) END AS accuracy,
         |  CASE WHEN tp + fp > 0 THEN
         |    CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
         |  CASE WHEN tp + fn > 0 THEN
         |    CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall,
         |  CASE WHEN np * (tp + fp + tn + fn - np) * 2 > 0 THEN
         |    CAST(sumrank2 - np * (np + 1) AS DOUBLE) /
         |      CAST(np * (tp + fp + tn + fn - np) * 2 AS DOUBLE) END AS auc
         |FROM conf, auc""".stripMargin)))
}

/** Registry hook. */
object LrOps {
  lazy val queries: Seq[Q] = LrOpsImpl.queries
}
