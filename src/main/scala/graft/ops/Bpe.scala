package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{Q, Tables}

/** BPE tokenizer-merge learning — the tokenizer-training step of an LLM
  * data pipeline, expressed declaratively: start from the character-level
  * vocabulary, and for a fixed number of iterations (a) count adjacent
  * symbol pairs across the corpus vocabulary weighted by word frequency,
  * (b) pick the most frequent pair (count desc, pair asc — a total,
  * engine-independent tie-break), (c) merge that pair into one symbol in
  * every word. The output is the learned merge table — the artifact a BPE
  * tokenizer ships.
  *
  * Scale shape: everything runs on the VOCABULARY (distinct words ×
  * frequency), not the corpus — one corpus-sized aggregation up front,
  * then iterations over |vocab| rows with an argmax that is a 1-row
  * scalar subquery. At 100 TB the vocab table is millions of rows, still
  * metadata next to the corpus; the iteration count is the (small) merge
  * budget, unrolled into one Catalyst plan here — no driver loop, no
  * collect.
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

  private def sparkSql: String = {
    def pairs(i: Int) =
      s"""p$i AS (
         |  SELECT pr AS pair, SUM(freq) AS cnt FROM (
         |    SELECT freq, explode(transform(sequence(1, size(sy) - 1),
         |      i -> concat(element_at(sy, i), ' ', element_at(sy, i + 1)))) AS pr
         |    FROM (SELECT freq, split(repr, ' ') AS sy FROM r${i - 1}
         |          WHERE size(split(repr, ' ')) >= 2) t)
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
    val stages = (1 to Merges).map(i =>
      Seq(pairs(i), best(i)) ++ (if (i < Merges) Seq(apply(i)) else Nil))
      .flatten.mkString(",\n")
    val out = (1 to Merges).map(i =>
      s"SELECT CAST($i AS BIGINT) AS merge_rank, pair, replace(pair, ' ', '') AS merged, cnt FROM m$i")
      .mkString(" UNION ALL ")
    s"""WITH r0 AS (
       |  SELECT word, freq,
       |    array_join(transform(sequence(1, length(word)), i -> substr(word, i, 1)), ' ') AS repr
       |  FROM (
       |    SELECT word, COUNT(*) AS freq FROM (
       |      SELECT explode(split(text, ' ')) AS word FROM gdocs_bpe) w
       |    WHERE word <> '' GROUP BY word) v),
       |$stages
       |SELECT merge_rank, pair, merged, cnt FROM ($out) ORDER BY merge_rank""".stripMargin
  }

  /** q129: the learned merge table over the documents corpus. */
  def bpeMerges(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "documents").createOrReplaceTempView("gdocs_bpe")
    s.sql(sparkSql)
  }

  private def duckSql: String = {
    def pairs(i: Int) =
      s"""p$i AS (
         |  SELECT pr AS pair, SUM(freq) AS cnt FROM (
         |    SELECT freq, unnest(list_transform(generate_series(1, len(sy) - 1),
         |      i -> sy[i] || ' ' || sy[i + 1])) AS pr
         |    FROM (SELECT freq, string_split(repr, ' ') AS sy FROM r${i - 1}
         |          WHERE len(string_split(repr, ' ')) >= 2) t)
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
    val stages = (1 to Merges).map(i =>
      Seq(pairs(i), best(i)) ++ (if (i < Merges) Seq(apply(i)) else Nil))
      .flatten.mkString(",\n")
    val out = (1 to Merges).map(i =>
      s"SELECT CAST($i AS BIGINT) AS merge_rank, pair, replace(pair, ' ', '') AS merged, CAST(cnt AS BIGINT) AS cnt FROM m$i")
      .mkString(" UNION ALL ")
    s"""WITH r0 AS (
       |  SELECT word, freq,
       |    array_to_string(list_transform(generate_series(1, length(word)),
       |      i -> substr(word, i, 1)), ' ') AS repr
       |  FROM (
       |    SELECT word, COUNT(*) AS freq FROM (
       |      SELECT unnest(string_split(text, ' ')) AS word FROM documents) w
       |    WHERE word <> '' GROUP BY word) v),
       |$stages
       |SELECT merge_rank, pair, merged, cnt FROM ($out) ORDER BY merge_rank""".stripMargin
  }

  def queries: Seq[Q] = Seq(
    Q("q129_text_bpe_merges", bpeMerges, Some(duckSql)))
}
