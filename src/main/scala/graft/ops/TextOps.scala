package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting (whitespace + regex), quality scoring, language-ID heuristic,
  * and document fingerprinting. All are per-row narrow transforms — they
  * parallelize embarrassingly at 100 TB (no shuffle; filters/projections
  * push into the parquet scan) and stay inside WholeStageCodegen.
  *
  * Cross-engine determinism: token math is integer-exact; fingerprints use
  * md5 hex strings (identical output in Spark and DuckDB; lexicographic min
  * over fixed-width lowercase hex equals numeric min, so no integer-hash
  * conversion is ever needed).
  */
object TextOpsImpl {

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
  private def inList(xs: Seq[String]) = xs.map(s => s"'$s'").mkString("(", ", ", ")")

  def tokenCounts(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id"),
      length(col("text")).cast(LongType).as("n_chars"),
      expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n_ws_tokens"),
      expr("CAST(size(regexp_extract_all(text, '[a-z0-9]+', 0)) AS BIGINT)").as("n_re_tokens"))
      .orderBy(col("doc_id"))

  /** Quality score from length / token stats / stopword ratio — the usual
    * cheap pre-filter before expensive dedup or embedding stages. */
  def qualityScore(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("toks")).cast(LongType))
      .withColumn("n_stop",
        expr(s"CAST(size(filter(toks, x -> x IN ${inList(stopwords)})) AS BIGINT)"))
      .select(
        col("doc_id"),
        col("n_tok"),
        col("n_stop"),
        (col("n_stop").cast(DoubleType) / col("n_tok")).as("stop_ratio"),
        ((length(col("text")).cast(DoubleType) - (col("n_tok") - lit(1L))) / col("n_tok"))
          .as("avg_tok_len"),
        // score: prefer mid-length docs with moderate stopword density
        (least(col("n_tok").cast(DoubleType) / 50.0, lit(1.0)) * 0.5
          + (lit(1.0) - col("n_stop").cast(DoubleType) / col("n_tok")) * 0.5).as("quality"))
      .orderBy(col("doc_id"))

  /** Marker-token language-ID heuristic (n-gram-family approach: score each
    * candidate language by marker hits, argmax with fixed priority). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "de" -> Seq("der", "die", "das", "und", "ist"))

  def languageId(s: SparkSession, dir: String): DataFrame = {
    val df = Tables(s, dir, "documents").withColumn("toks", split(col("text"), " "))
    val scored = langMarkers.foldLeft(df) { case (d, (lang, markers)) =>
      d.withColumn(s"score_$lang",
        expr(s"CAST(size(filter(toks, x -> x IN ${inList(markers)})) AS BIGINT)"))
    }
    scored.select(
      col("doc_id"),
      col("score_en"), col("score_es"), col("score_de"),
      when(greatest(col("score_en"), col("score_es"), col("score_de")) === 0, "und")
        .when(col("score_en") >= col("score_es") && col("score_en") >= col("score_de"), "en")
        .when(col("score_es") >= col("score_de"), "es")
        .otherwise("de").as("pred_lang"))
      .orderBy(col("doc_id"))
  }

  /** Corpus term statistics: top-5 most frequent tokens per language —
    * explode + two-level aggregation + per-group top-k, the shape of any
    * corpus-frequency report (vocab building, stopword discovery).
    *
    * The top-k runs through the custom TopKPerKey physical operator
    * (graft.plans.TopK), not `row_number().over(Window.partitionBy(lang))`:
    * `lang` has ~3 distinct values, so the window form ships the ENTIRE
    * (lang, tok) frequency table to ≤3 reducers and fully sorts it — a
    * guaranteed straggler at 100 TB. TopKPerKey keeps bounded per-key heaps
    * with a map-side partial, so ≤ 5 rows per lang per partition cross the
    * shuffle regardless of vocabulary size. */
  def topTermsPerLang(s: SparkSession, dir: String): DataFrame = {
    val tf = Tables(s, dir, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("tf"))
    graft.plans.TopK.topKPerKey(tf, 5, Seq("lang"),
        Seq(graft.plans.TopK.desc("tf"), graft.plans.TopK.asc("tok")))
      .select(col("lang"), col("rank").as("rn"), col("tok"), col("tf"))
      .orderBy(col("lang"), col("rn"))
  }

  /** Document fingerprint: minimum md5 over character 5-gram shingles
    * (winnowing-style content signature, stable under reordering of
    * surrounding content). */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id"),
      expr("array_min(transform(sequence(1, length(text) - 4), i -> md5(substr(text, i, 5))))")
        .as("fp"))
      .orderBy(col("doc_id"))
}

object TextOps {
  import TextOpsImpl._

  private val stopSql = stopwords.map(s => s"'$s'").mkString("(", ", ", ")")

  def queries: Seq[Q] = Seq(
    Q("q30_text_tokens", tokenCounts, Some(
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("q31_text_quality", qualityScore, Some(
      s"""WITH t AS (
         |  SELECT doc_id, length(text) AS n_chars,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x IN $stopSql)) AS BIGINT) AS n_stop
         |  FROM documents)
         |SELECT doc_id, n_tok, n_stop,
         |  CAST(n_stop AS DOUBLE) / n_tok AS stop_ratio,
         |  (CAST(n_chars AS DOUBLE) - (n_tok - 1)) / n_tok AS avg_tok_len,
         |  least(CAST(n_tok AS DOUBLE) / 50.0, 1.0) * 0.5
         |    + (1.0 - CAST(n_stop AS DOUBLE) / n_tok) * 0.5 AS quality
         |FROM t ORDER BY doc_id""".stripMargin), headline = true),

    Q("q32_text_langid", languageId, Some {
      val scores = langMarkers.map { case (lang, ms) =>
        s"CAST(len(list_filter(string_split(text, ' '), x -> x IN ${ms.map(m => s"'$m'").mkString("(", ", ", ")")})) AS BIGINT) AS score_$lang"
      }.mkString(",\n    ")
      s"""WITH t AS (SELECT doc_id, $scores FROM documents)
         |SELECT doc_id, score_en, score_es, score_de,
         |  CASE WHEN greatest(score_en, score_es, score_de) = 0 THEN 'und'
         |       WHEN score_en >= score_es AND score_en >= score_de THEN 'en'
         |       WHEN score_es >= score_de THEN 'es'
         |       ELSE 'de' END AS pred_lang
         |FROM t ORDER BY doc_id""".stripMargin
    }),

    Q("q34_text_top_terms", topTermsPerLang, Some(
      """WITH tf AS (
        |  SELECT lang, tok, COUNT(*) AS tf FROM (
        |    SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY lang, tok),
        |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY tf DESC, tok) AS BIGINT) AS rn FROM tf)
        |SELECT lang, rn, tok, tf FROM r WHERE rn <= 5 ORDER BY lang, rn""".stripMargin)),

    Q("q33_text_fingerprint", fingerprint, Some(
      """SELECT doc_id,
        |  list_min(list_transform(generate_series(1, length(text) - 4),
        |    i -> md5(substr(text, i, 5)))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
