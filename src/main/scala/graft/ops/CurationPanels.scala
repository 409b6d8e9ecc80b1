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

  lazy val queries: Seq[Q] = Seq(
    Q("q187_quality_sweep", qualitySweep, Some(q187Sql)),
    Q("q188_truncation_sweep", truncationSweep, Some(q188Sql)))
}

object CurationPanelsOps {
  lazy val queries: Seq[Q] = CurationPanelsImpl.queries
}
