package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{Q, Tables}

/** BPE tokenizer-merge learning and application — the tokenizer-training
  * and tokenize steps of an LLM data pipeline, expressed declaratively:
  * start from the character-level vocabulary, and for a fixed number of
  * iterations (a) count adjacent symbol pairs across the corpus vocabulary
  * weighted by word frequency, (b) pick the most frequent pair (count
  * desc, pair asc — a total, engine-independent tie-break), (c) merge that
  * pair into one symbol in every word. q129 outputs the learned merge
  * table — the artifact a BPE tokenizer ships; q130 applies it, producing
  * per-document token counts — the signal token-budget planning runs on.
  *
  * Scale shape: everything runs on the VOCABULARY (distinct words ×
  * frequency), not the corpus — one corpus-sized aggregation up front,
  * then iterations over |vocab| rows with an argmax that is a 1-row
  * scalar subquery. At 100 TB the vocab table is millions of rows, still
  * metadata next to the corpus; the iteration count is the (small) merge
  * budget, unrolled into one Catalyst plan here — no driver loop, no
  * collect. Encoding (q130) re-joins the per-word token count to the
  * exploded corpus on the word equi-key — the only corpus-sized work is
  * that narrow explode + join + per-doc sum.
  *
  * Merge application semantics (shared by both engines so the gate is
  * meaningful): the pair pattern is space-padded and applied with TWO
  * leftmost-nonoverlapping `replace` passes per iteration. One padded
  * pass cannot rewrite two adjacent merge sites (the shared boundary
  * space is consumed by the first rewrite); the second pass catches
  * them. This equals reference BPE everywhere except pathological
  * same-symbol runs (aaaa…), where reference BPE's strict left-to-right
  * single-site scan differs — BpeSpec pins both the agreement on the
  * real corpus (vs an independent Scala reimplementation) and the
  * documented deviation case.
  */
object BpeOpsImpl {

  /** Fixed merge budget (unrolled iterations). */
  val Merges = 3

  /** The handful of array/string constructs that differ between the two
    * engines; everything else in the generated SQL is shared text. */
  private final case class Dialect(
      table: String,
      split: String => String,
      size: String => String,
      explode: String => String,
      charsJoined: String => String,
      pairList: String => String)

  private val spark_ = Dialect(
    table = "gdocs_bpe",
    split = e => s"split($e, ' ')",
    size = e => s"size($e)",
    explode = e => s"explode($e)",
    charsJoined = w =>
      s"array_join(transform(sequence(1, length($w)), i -> substr($w, i, 1)), ' ')",
    pairList = sy =>
      s"transform(sequence(1, size($sy) - 1), i -> concat(element_at($sy, i), ' ', element_at($sy, i + 1)))")

  private val duck = Dialect(
    table = "documents",
    split = e => s"string_split($e, ' ')",
    size = e => s"len($e)",
    explode = e => s"unnest($e)",
    charsJoined = w =>
      s"array_to_string(list_transform(generate_series(1, length($w)), i -> substr($w, i, 1)), ' ')",
    pairList = sy =>
      s"list_transform(generate_series(1, len($sy) - 1), i -> $sy[i] || ' ' || $sy[i + 1])")

  /** r0 (char-split vocab) + per-iteration pair-count / argmax / merge
    * CTEs. Learning needs the merged vocab only up to r{Merges-1};
    * encoding also needs the final r{Merges}. */
  private def ctes(d: Dialect, finalApply: Boolean): String = {
    def pairs(i: Int) =
      s"""p$i AS (
         |  SELECT pr AS pair, SUM(freq) AS cnt FROM (
         |    SELECT freq, ${d.explode(d.pairList("sy"))} AS pr
         |    FROM (SELECT freq, ${d.split("repr")} AS sy FROM r${i - 1}
         |          WHERE ${d.size(d.split("repr"))} >= 2) t)
         |  GROUP BY pr)""".stripMargin
    def best(i: Int) =
      s"m$i AS (SELECT pair, cnt FROM p$i ORDER BY cnt DESC, pair ASC LIMIT 1)"
    def apply(i: Int) = {
      val pat = s"' ' || (SELECT pair FROM m$i) || ' '"
      val rep = s"' ' || (SELECT replace(pair, ' ', '') FROM m$i) || ' '"
      s"""r$i AS (
         |  SELECT word, freq, TRIM(replace(replace(' ' || repr || ' ',
         |    $pat, $rep), $pat, $rep)) AS repr
         |  FROM r${i - 1})""".stripMargin
    }
    val stages = (1 to Merges).flatMap(i =>
      Seq(pairs(i), best(i)) ++
        (if (i < Merges || finalApply) Seq(apply(i)) else Nil))
      .mkString(",\n")
    s"""r0 AS (
       |  SELECT word, freq, ${d.charsJoined("word")} AS repr
       |  FROM (
       |    SELECT word, COUNT(*) AS freq FROM (
       |      SELECT ${d.explode(d.split("text"))} AS word FROM ${d.table}) w
       |    WHERE word <> '' GROUP BY word) v),
       |$stages""".stripMargin
  }

  private def learnSql(d: Dialect): String = {
    val out = (1 to Merges).map(i =>
      s"SELECT CAST($i AS BIGINT) AS merge_rank, pair, replace(pair, ' ', '') AS merged, CAST(cnt AS BIGINT) AS cnt FROM m$i")
      .mkString(" UNION ALL ")
    s"""WITH ${ctes(d, finalApply = false)}
       |SELECT merge_rank, pair, merged, cnt FROM ($out) ORDER BY merge_rank""".stripMargin
  }

  /** Per-document token count under the learned merges: tokenize the
    * VOCAB once (|vocab| rows), then equi-join counts back to the
    * exploded corpus. Documents with no non-empty words drop out (no
    * words => nothing to tokenize) — identically in both engines. */
  private def encodeSql(d: Dialect): String =
    s"""WITH ${ctes(d, finalApply = true)},
       |tok AS (SELECT word, CAST(${d.size(d.split("repr"))} AS BIGINT) AS n_tok FROM r$Merges),
       |w AS (SELECT doc_id, word FROM (
       |  SELECT doc_id, ${d.explode(d.split("text"))} AS word FROM ${d.table}) x
       |  WHERE word <> '')
       |SELECT w.doc_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(tok.n_tok) AS BIGINT) AS n_tokens
       |FROM w JOIN tok ON w.word = tok.word
       |GROUP BY w.doc_id ORDER BY doc_id""".stripMargin

  /** q129: the learned merge table over the documents corpus. */
  def bpeMerges(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "documents").createOrReplaceTempView("gdocs_bpe")
    s.sql(learnSql(spark_))
  }

  /** q130: per-document BPE token counts under the learned merges. */
  def bpeEncode(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "documents").createOrReplaceTempView("gdocs_bpe")
    s.sql(encodeSql(spark_))
  }

  def queries: Seq[Q] = Seq(
    Q("q129_text_bpe_merges", bpeMerges, Some(learnSql(duck))),
    Q("q130_text_bpe_encode", bpeEncode, Some(encodeSql(duck))))
}
