package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{Q, Tables}

/** CURATION KNOB panels — the measure-the-knob discipline (q155 banding,
  * q158 nprobe, q160 bloom-vs-minmax, q152 fertility) applied to the two
  * dials every training-data run actually turns:
  *
  *  - [[qualitySweep]] (q187): for each quality threshold t ∈ {0.0 … 1.0}
  *    the docs and tokens RETAINED by `quality ≥ t` — the
  *    quality-vs-quantity trade curve behind "filter at 0.5 or 0.6?",
  *    quantified instead of guessed. One corpus pass folds docs into 11
  *    integer buckets (floor(quality·10) — exact: both engines compute
  *    the same double, and floor(x·10) ≥ t ⇔ x ≥ t/10 for integer t);
  *    everything after is arithmetic on ≤ 11 rows.
  *
  *  - [[truncationSweep]] (q188): for each context length L the tokens
  *    LOST to truncation, docs affected, and full-packing sequence count
  *    ⌈kept/L⌉ — the cost side of choosing max_seq_len before packing
  *    (q37's packer consumes the winner). One corpus scan fans each doc
  *    into |grid| candidate rows against a broadcast 5-row frame and
  *    immediately map-side-combines; all selection math is integer.
  *
  * Both panels end metadata-sized: the grid × aggregate frame, never the
  * corpus.
  */
object CurationPanelsImpl {

  def qualitySweep(s: SparkSession, dir: String): DataFrame = {
    val b = TextOpsImpl.qualityScore(s, dir)
      .select(col("n_tok"),
        floor(col("quality") * 10.0).cast(LongType).as("bucket"))
    val agg = b.groupBy(col("bucket"))
      .agg(count(lit(1)).as("docs"), sum(col("n_tok")).as("toks"))
    val thr = s.sql((0 to 10)
      .map(t => s"SELECT CAST($t AS BIGINT) AS thr").mkString(" UNION ALL "))
    val tot = agg.agg(sum(col("toks")).cast(LongType).as("total_tokens"))
    broadcast(thr).crossJoin(agg).crossJoin(broadcast(tot))
      .groupBy(col("thr"), col("total_tokens"))
      .agg(
        coalesce(sum(when(col("bucket") >= col("thr"), col("docs"))), lit(0L))
          .cast(LongType).as("n_docs_kept"),
        coalesce(sum(when(col("bucket") >= col("thr"), col("toks"))), lit(0L))
          .cast(LongType).as("n_tokens_kept"))
      .select(col("thr"),
        (col("thr").cast("double") / 10.0).as("threshold"),
        col("n_docs_kept"), col("n_tokens_kept"), col("total_tokens"),
        (col("n_tokens_kept").cast("double") /
          col("total_tokens").cast("double")).as("token_share"))
      .orderBy(col("thr"))
  }

  private val SeqLens = Seq(128L, 256L, 512L, 1024L, 2048L)

  def truncationSweep(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents").select(
      expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n_tok"))
    val grid = s.sql(SeqLens
      .map(l => s"SELECT CAST($l AS BIGINT) AS max_len").mkString(" UNION ALL "))
    d.crossJoin(broadcast(grid))
      .groupBy(col("max_len"))
      .agg(
        sum(when(col("n_tok") > col("max_len"), 1L).otherwise(0L))
          .cast(LongType).as("docs_truncated"),
        sum(greatest(col("n_tok") - col("max_len"), lit(0L)))
          .cast(LongType).as("tokens_lost"),
        sum(least(col("n_tok"), col("max_len"))).cast(LongType).as("tokens_kept"),
        sum(col("n_tok")).cast(LongType).as("tokens_total"))
      .select(col("max_len"), col("docs_truncated"), col("tokens_lost"),
        col("tokens_kept"),
        (col("tokens_lost").cast("double") /
          col("tokens_total").cast("double")).as("loss_share"),
        expr("(tokens_kept + max_len - 1) DIV max_len").as("n_sequences"))
      .orderBy(col("max_len"))
  }

  /** Percent-of-vocabulary cuts: absolute sizes would not discriminate
    * across corpora (the synthetic corpus has a 31-token vocabulary;
    * a web crawl has millions), percentages always do. */
  private val VocabPcts = Seq(5L, 10L, 25L, 50L, 75L)

  /** q190: OOV share vs vocabulary size — "how big must the tokenizer
    * vocab be" as a measured curve. Keeping the top-V tokens by frequency
    * covers a token mass computable EXACTLY from the frequency-CLASS
    * histogram (freq → how many distinct tokens, how much mass): classes
    * are taken whole in descending frequency order and the boundary class
    * contributes (V − tokens_above) · freq — no vocabulary-wide ranking
    * sort, just a window over the ≤ |distinct frequencies| class frame
    * (O(√corpus) rows by Zipf/Heaps, metadata at any scale). Ties need no
    * tie-break: every token in a class has the same frequency, so the
    * covered mass is tie-order-invariant. All selection math is integer;
    * the only double is the final share. */
  def vocabCoverage(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("freq").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val freqs = Tables(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    val classes = freqs.groupBy(col("freq"))
      .agg(count(lit(1)).as("n_toks"), sum(col("freq")).as("mass"))
      .withColumn("toks_above", coalesce(sum(col("n_toks")).over(w), lit(0L)))
    val grid = s.sql(VocabPcts
      .map(v => s"SELECT CAST($v AS BIGINT) AS vocab_pct").mkString(" UNION ALL "))
    val tot = freqs.agg(sum(col("freq")).cast(LongType).as("total_mass"),
      count(lit(1)).cast(LongType).as("total_toks"))
    broadcast(grid).crossJoin(classes).crossJoin(broadcast(tot))
      .withColumn("vocab_v", expr("(total_toks * vocab_pct + 99) DIV 100"))
      .filter(col("toks_above") < col("vocab_v")) // class reaches the cut
      .withColumn("take", least(col("n_toks"), col("vocab_v") - col("toks_above")))
      .groupBy(col("vocab_pct"), col("vocab_v"), col("total_mass"), col("total_toks"))
      .agg(sum(col("take")).cast(LongType).as("kept_toks"),
        sum(col("take") * col("freq")).cast(LongType).as("kept_mass"))
      .select(col("vocab_pct"), col("vocab_v"), col("kept_toks"), col("total_toks"),
        col("kept_mass"), col("total_mass"),
        (lit(1.0) - col("kept_mass").cast("double") /
          col("total_mass").cast("double")).as("oov_share"))
      .orderBy(col("vocab_pct"))
  }

  private lazy val q190Sql: String = {
    val grid = VocabPcts.map(v => s"SELECT CAST($v AS BIGINT) AS vocab_pct")
      .mkString(" UNION ALL ")
    s"""WITH f AS (
       |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
       |  WHERE tok <> '' GROUP BY 1),
       |cls AS (
       |  SELECT freq, CAST(COUNT(*) AS BIGINT) AS n_toks,
       |    CAST(SUM(freq) AS BIGINT) AS mass
       |  FROM f GROUP BY 1),
       |cum AS (
       |  SELECT freq, n_toks, mass,
       |    CAST(COALESCE(SUM(n_toks) OVER (ORDER BY freq DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS toks_above
       |  FROM cls),
       |tot AS (SELECT CAST(SUM(freq) AS BIGINT) AS total_mass,
       |    CAST(COUNT(*) AS BIGINT) AS total_toks FROM f),
       |grid AS ($grid),
       |cuts AS (SELECT vocab_pct, (total_toks * vocab_pct + 99) // 100 AS vocab_v,
       |    total_mass, total_toks
       |  FROM grid CROSS JOIN tot)
       |SELECT vocab_pct, vocab_v,
       |  CAST(SUM(least(n_toks, vocab_v - toks_above)) AS BIGINT) AS kept_toks,
       |  total_toks,
       |  CAST(SUM(least(n_toks, vocab_v - toks_above) * freq) AS BIGINT) AS kept_mass,
       |  total_mass,
       |  1.0 - CAST(SUM(least(n_toks, vocab_v - toks_above) * freq) AS DOUBLE)
       |    / CAST(total_mass AS DOUBLE) AS oov_share
       |FROM cuts CROSS JOIN cum
       |WHERE toks_above < vocab_v
       |GROUP BY vocab_pct, vocab_v, total_mass, total_toks ORDER BY vocab_pct""".stripMargin
  }

  private lazy val q187Sql: String = {
    val stop = TextOpsImpl.stopwords.map(w => s"'$w'").mkString("(", ", ", ")")
    val thr = (0 to 10).map(t => s"SELECT CAST($t AS BIGINT) AS thr")
      .mkString(" UNION ALL ")
    s"""WITH t AS (
       |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x IN $stop)) AS BIGINT) AS n_stop
       |  FROM documents),
       |b AS (
       |  SELECT n_tok,
       |    CAST(FLOOR((least(CAST(n_tok AS DOUBLE) / 50.0, 1.0) * 0.5
       |      + (1.0 - CAST(n_stop AS DOUBLE) / n_tok) * 0.5) * 10.0) AS BIGINT) AS bucket
       |  FROM t),
       |agg AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS docs,
       |    CAST(SUM(n_tok) AS BIGINT) AS toks FROM b GROUP BY 1),
       |tot AS (SELECT CAST(SUM(toks) AS BIGINT) AS total_tokens FROM agg),
       |thr AS ($thr)
       |SELECT thr, CAST(thr AS DOUBLE) / 10.0 AS threshold,
       |  CAST(COALESCE(SUM(CASE WHEN bucket >= thr THEN docs END), 0) AS BIGINT) AS n_docs_kept,
       |  CAST(COALESCE(SUM(CASE WHEN bucket >= thr THEN toks END), 0) AS BIGINT) AS n_tokens_kept,
       |  total_tokens,
       |  CAST(COALESCE(SUM(CASE WHEN bucket >= thr THEN toks END), 0) AS DOUBLE)
       |    / CAST(total_tokens AS DOUBLE) AS token_share
       |FROM thr CROSS JOIN agg CROSS JOIN tot
       |GROUP BY thr, total_tokens ORDER BY thr""".stripMargin
  }

  private lazy val q188Sql: String = {
    val grid = SeqLens.map(l => s"SELECT CAST($l AS BIGINT) AS max_len")
      .mkString(" UNION ALL ")
    s"""WITH d AS (
       |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
       |  FROM documents),
       |grid AS ($grid),
       |agg AS (
       |  SELECT max_len,
       |    CAST(SUM(CASE WHEN n_tok > max_len THEN 1 ELSE 0 END) AS BIGINT) AS docs_truncated,
       |    CAST(SUM(greatest(n_tok - max_len, 0)) AS BIGINT) AS tokens_lost,
       |    CAST(SUM(least(n_tok, max_len)) AS BIGINT) AS tokens_kept,
       |    CAST(SUM(n_tok) AS BIGINT) AS tokens_total
       |  FROM d CROSS JOIN grid GROUP BY 1)
       |SELECT max_len, docs_truncated, tokens_lost, tokens_kept,
       |  CAST(tokens_lost AS DOUBLE) / CAST(tokens_total AS DOUBLE) AS loss_share,
       |  (tokens_kept + max_len - 1) // max_len AS n_sequences
       |FROM agg ORDER BY max_len""".stripMargin
  }

  /** Candidate context lengths for the PADDING sweep — sized to straddle
    * the fixtures' 10–100-token document lengths (the q188 grid starts at
    * 128, above every doc, so its truncation trade is what varies there;
    * here the PADDING trade is the subject and the grid must cut through
    * the length distribution to show it). In production the grid is the
    * model's candidate max_seq_len values. */
  private val PadLens = Seq(16L, 32L, 64L, 128L)

  /** q204: the PADDING-POLICY sweep — q188 prices truncation assuming
    * PERFECT packing; this prices the batching policies a trainer can
    * actually run, per candidate context length L:
    *
    *  - `pad_fixed`: one doc per sequence, padded to L — the naive
    *    collator; waste = Σ (L − min(n_tok, L)).
    *  - `pad_bucket`: length bucketing — each doc pads only to the next
    *    power-of-two bucket ≤ L (the standard bucketed-batching
    *    compromise: kernel-friendly shapes without per-batch repacking).
    *  - `pad_packed`: q37-style full packing — only the final partial
    *    sequence pads; the floor every policy is measured against.
    *
    * The three waste shares side by side per L are the table that decides
    * whether packing infrastructure is worth building at all (at L=16 on
    * this corpus fixed-pad wastes little; at L=128 it wastes most of the
    * batch — the panel quantifies exactly where the crossover sits).
    *
    * Determinism: every padded length is integer CASE/LEAST arithmetic on
    * BIGINTs (the pow-2 ceiling is a 4-arm CASE chain, no logarithm);
    * waste shares are one double division each with denominators ≥ corpus
    * tokens > 0. Scale shape: identical to q188 — one narrow corpus scan
    * fanned against a broadcast |grid|-row frame, map-side-combined into
    * |grid| rows; no shuffle beyond the grid aggregate. */
  def paddingSweep(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents").select(
      expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n_tok"))
    val grid = s.sql(PadLens
      .map(l => s"SELECT CAST($l AS BIGINT) AS max_len").mkString(" UNION ALL "))
    d.crossJoin(broadcast(grid))
      .withColumn("kept", least(col("n_tok"), col("max_len")))
      .withColumn("bucket_len", expr(
        """LEAST(CASE WHEN kept <= 16 THEN CAST(16 AS BIGINT)
          |           WHEN kept <= 32 THEN CAST(32 AS BIGINT)
          |           WHEN kept <= 64 THEN CAST(64 AS BIGINT)
          |           ELSE CAST(128 AS BIGINT) END, max_len)""".stripMargin))
      .groupBy(col("max_len"))
      .agg(
        sum(col("kept")).cast(LongType).as("tokens_kept"),
        sum(col("max_len") - col("kept")).cast(LongType).as("pad_fixed"),
        sum(col("bucket_len") - col("kept")).cast(LongType).as("pad_bucket"))
      .withColumn("n_packed_seqs",
        expr("(tokens_kept + max_len - 1) DIV max_len"))
      .withColumn("pad_packed", col("n_packed_seqs") * col("max_len") - col("tokens_kept"))
      .select(col("max_len"), col("tokens_kept"),
        col("pad_fixed"), col("pad_bucket"), col("pad_packed"),
        (col("pad_fixed").cast("double") /
          (col("pad_fixed") + col("tokens_kept")).cast("double")).as("waste_fixed"),
        (col("pad_bucket").cast("double") /
          (col("pad_bucket") + col("tokens_kept")).cast("double")).as("waste_bucket"),
        (col("pad_packed").cast("double") /
          (col("pad_packed") + col("tokens_kept")).cast("double")).as("waste_packed"))
      .orderBy(col("max_len"))
  }

  private lazy val q204Sql: String = {
    val grid = PadLens.map(l => s"SELECT CAST($l AS BIGINT) AS max_len")
      .mkString(" UNION ALL ")
    s"""WITH d AS (
       |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
       |  FROM documents),
       |grid AS ($grid),
       |k AS (
       |  SELECT max_len, least(n_tok, max_len) AS kept,
       |    LEAST(CASE WHEN least(n_tok, max_len) <= 16 THEN CAST(16 AS BIGINT)
       |               WHEN least(n_tok, max_len) <= 32 THEN CAST(32 AS BIGINT)
       |               WHEN least(n_tok, max_len) <= 64 THEN CAST(64 AS BIGINT)
       |               ELSE CAST(128 AS BIGINT) END, max_len) AS bucket_len
       |  FROM d CROSS JOIN grid),
       |agg AS (
       |  SELECT max_len,
       |    CAST(SUM(kept) AS BIGINT) AS tokens_kept,
       |    CAST(SUM(max_len - kept) AS BIGINT) AS pad_fixed,
       |    CAST(SUM(bucket_len - kept) AS BIGINT) AS pad_bucket
       |  FROM k GROUP BY 1),
       |p AS (
       |  SELECT *, ((tokens_kept + max_len - 1) // max_len) * max_len - tokens_kept
       |    AS pad_packed
       |  FROM agg)
       |SELECT max_len, tokens_kept, pad_fixed, pad_bucket, pad_packed,
       |  CAST(pad_fixed AS DOUBLE) / CAST(pad_fixed + tokens_kept AS DOUBLE) AS waste_fixed,
       |  CAST(pad_bucket AS DOUBLE) / CAST(pad_bucket + tokens_kept AS DOUBLE) AS waste_bucket,
       |  CAST(pad_packed AS DOUBLE) / CAST(pad_packed + tokens_kept AS DOUBLE) AS waste_packed
       |FROM p ORDER BY max_len""".stripMargin
  }

  lazy val queries: Seq[Q] = Seq(
    Q("q187_quality_sweep", qualitySweep, Some(q187Sql)),
    Q("q188_truncation_sweep", truncationSweep, Some(q188Sql)),
    Q("q190_vocab_coverage", vocabCoverage, Some(q190Sql)),
    Q("q204_padding_sweep", paddingSweep, Some(q204Sql)))
}

object CurationPanelsOps {
  lazy val queries: Seq[Q] = CurationPanelsImpl.queries
}
