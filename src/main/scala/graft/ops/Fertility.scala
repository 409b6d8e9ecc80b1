package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{Q, Tables}

/** Tokenizer FERTILITY panel (q152) — the comparison a tokenizer choice is
  * actually made on: for each trained tokenizer family (whitespace
  * baseline, BPE merges q129/q130, unigram-LM q138/q139) over the SAME
  * corpus, total tokens, fertility (tokens per whitespace word — the
  * sequence-length multiplier that directly prices training FLOPs and
  * context-window budget) and chars-per-token (compression). Every
  * production tokenizer report (SentencePiece, tiktoken, HF tokenizers)
  * leads with exactly these numbers; here they are oracle-gated.
  *
  * Scale shape: the word base is one narrow corpus scan reduced by
  * map-side combine to a single row; the BPE/unigram sides aggregate the
  * already-gated encode frames (whose learned models are memoized —
  * marginal cost is one vocabulary join each); the panel itself is 3 rows.
  * Ratios are single integer→double divisions, bitwise portable.
  */
object FertilityOpsImpl {

  def tokenizerFertility(s: SparkSession, dir: String): DataFrame = {
    val base = Tables(s, dir, "documents").select(
      col("doc_id"),
      expr("CAST(size(filter(split(text, ' '), x -> x <> '')) AS BIGINT)")
        .as("n_words"),
      expr("CAST(aggregate(filter(split(text, ' '), x -> x <> ''), 0L, (a, x) -> a + length(x)) AS BIGINT)")
        .as("word_chars"))
    val tot = base.agg(count(lit(1)).as("n_docs"),
      sum(col("n_words")).cast(LongType).as("n_words"),
      sum(col("word_chars")).cast(LongType).as("word_chars"))
    def encRow(name: String, enc: DataFrame): DataFrame = {
      val t = enc.agg(sum(col("n_tokens")).cast(LongType).as("n_tokens"))
      tot.crossJoin(broadcast(t))
        .select(lit(name).as("tokenizer"), col("n_docs"), col("n_words"),
          col("n_tokens"), col("word_chars"))
    }
    val ws = tot.select(lit("whitespace").as("tokenizer"), col("n_docs"),
      col("n_words"), col("n_words").as("n_tokens"), col("word_chars"))
    ws.union(encRow("bpe", BpeOpsImpl.bpeEncode(s, dir)))
      .union(encRow("unigram", UnigramOpsImpl.unigramEncode(s, dir)))
      .select(col("tokenizer"), col("n_docs"), col("n_words"), col("n_tokens"),
        col("word_chars"),
        (col("n_tokens").cast("double") / col("n_words").cast("double"))
          .as("fertility"),
        (col("word_chars").cast("double") / col("n_tokens").cast("double"))
          .as("chars_per_token"))
      .orderBy(col("tokenizer"))
  }

  private lazy val q152Sql: String = {
    val words = "list_filter(string_split(text, ' '), x -> x <> '')"
    s"""WITH fbase AS (
       |  SELECT doc_id,
       |    CAST(len($words) AS BIGINT) AS n_words,
       |    CAST(list_sum(list_transform($words, x -> length(x))) AS BIGINT) AS word_chars
       |  FROM documents),
       |ftot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_words) AS BIGINT) AS n_words,
       |  CAST(SUM(word_chars) AS BIGINT) AS word_chars FROM fbase),
       |fbpe AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS n_tokens FROM (
       |${BpeOpsImpl.encodeSqlDuck}
       |) b),
       |funi AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS n_tokens FROM (
       |${UnigramOps.encodeSql}
       |) u),
       |fu AS (
       |  SELECT 'whitespace' AS tokenizer, n_docs, n_words, n_words AS n_tokens, word_chars
       |  FROM ftot
       |  UNION ALL
       |  SELECT 'bpe', t.n_docs, t.n_words, b.n_tokens, t.word_chars FROM ftot t, fbpe b
       |  UNION ALL
       |  SELECT 'unigram', t.n_docs, t.n_words, u2.n_tokens, t.word_chars FROM ftot t, funi u2)
       |SELECT tokenizer, n_docs, n_words, n_tokens, word_chars,
       |  CAST(n_tokens AS DOUBLE) / CAST(n_words AS DOUBLE) AS fertility,
       |  CAST(word_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS chars_per_token
       |FROM fu ORDER BY tokenizer""".stripMargin
  }

  lazy val queries: Seq[Q] = Seq(
    Q("q152_text_fertility", tokenizerFertility, Some(q152Sql)))
}

/** Registry hook. */
object FertilityOps {
  lazy val queries: Seq[Q] = FertilityOpsImpl.queries
}
