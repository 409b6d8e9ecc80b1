package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, regexp_replace}

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
    * encoding also needs the final r{Merges}.
    *
    * `r0From`: Spark INLINES WITH-CTEs, so every chain that reaches back to
    * r0 (each p_i, each m_i scalar subquery, tok, …) re-ran the corpus-wide
    * vocabulary aggregation — ~8× for Merges=3 (r4 bench: q130 12.5 s).
    * The Spark side therefore materializes r0 once as a memoized cached
    * temp view and rebases the CTE chain on it; every later stage is
    * vocab-sized. DuckDB (the oracle) keeps the self-contained form. */
  private def ctes(d: Dialect, finalApply: Boolean,
      r0From: Option[String] = None): String = {
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
    val r0 = r0From match {
      case Some(view) => s"r0 AS (SELECT word, freq, repr FROM $view)"
      case None => r0Sql(d)
    }
    s"""$r0,
       |$stages""".stripMargin
  }

  private def r0Sql(d: Dialect): String =
    s"""r0 AS (
       |  SELECT word, freq, ${d.charsJoined("word")} AS repr
       |  FROM (
       |    SELECT word, COUNT(*) AS freq FROM (
       |      SELECT ${d.explode(d.split("text"))} AS word FROM ${d.table}) w
       |    WHERE word <> '' GROUP BY word) v)""".stripMargin

  private def learnSql(d: Dialect, r0From: Option[String] = None): String = {
    val out = (1 to Merges).map(i =>
      s"SELECT CAST($i AS BIGINT) AS merge_rank, pair, replace(pair, ' ', '') AS merged, CAST(cnt AS BIGINT) AS cnt FROM m$i")
      .mkString(" UNION ALL ")
    s"""WITH ${ctes(d, finalApply = false, r0From)}
       |SELECT merge_rank, pair, merged, cnt FROM ($out) ORDER BY merge_rank""".stripMargin
  }

  /** Per-document token count under the learned merges: tokenize the
    * VOCAB once (|vocab| rows), then equi-join counts back to the
    * exploded corpus. Documents with no non-empty words drop out (no
    * words => nothing to tokenize) — identically in both engines. */
  private def encodeSql(d: Dialect, r0From: Option[String] = None): String =
    s"""WITH ${ctes(d, finalApply = true, r0From)},
       |tok AS (SELECT word, CAST(${d.size(d.split("repr"))} AS BIGINT) AS n_tok FROM r$Merges),
       |w AS (SELECT doc_id, word FROM (
       |  SELECT doc_id, ${d.explode(d.split("text"))} AS word FROM ${d.table}) x
       |  WHERE word <> '')
       |SELECT w.doc_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(tok.n_tok) AS BIGINT) AS n_tokens
       |FROM w JOIN tok ON w.word = tok.word
       |GROUP BY w.doc_id ORDER BY doc_id""".stripMargin

  /** Spark-side BPE learning as an ITERATIVE driver loop over the
    * vocabulary — the shape k-means and connected-components already use:
    * one corpus-sized aggregation builds r0 (cached), then each merge
    * iteration is two vocab-scale jobs (pair-count argmax; merge apply)
    * with `localCheckpoint` truncating lineage between rounds. The
    * previous single unrolled plan was semantically identical but Spark
    * INLINES CTEs, so every chain back to r_i re-ran the whole prefix —
    * q129+q130 cost ~12 s at sf0.1 mostly re-deriving the same vocab
    * states. The DuckDB oracle keeps the self-contained unrolled form;
    * both sides share the same dialect SQL fragments, so the semantics
    * pin (BpeSpec) is unchanged.
    *
    * Memoized per (session, dir): q129 (merge table) and q130 (encode)
    * share one learning run. */
  private def learned(s: SparkSession, dir: String): (Seq[DataFrame], DataFrame) = {
    graft.ops.Memo.getOrCacheAny(bpeCache, s, dir, { _ =>
      Tables(s, dir, "documents").createOrReplaceTempView("gdocs_bpe")
      var r = s.sql(s"WITH ${r0Sql(spark_)} SELECT word, freq, repr FROM r0")
        .localCheckpoint()
      val ms = Seq.newBuilder[DataFrame]
      for (_ <- 1 to Merges) {
        r.createOrReplaceTempView("gbpe_r")
        // same pair-count/argmax text as ctes().pairs/best, rebased on the
        // materialized current vocab
        val m = s.sql(
          s"""SELECT pair, cnt FROM (
             |  SELECT pr AS pair, SUM(freq) AS cnt FROM (
             |    SELECT freq, ${spark_.explode(spark_.pairList("sy"))} AS pr
             |    FROM (SELECT freq, ${spark_.split("repr")} AS sy FROM gbpe_r
             |          WHERE ${spark_.size(spark_.split("repr"))} >= 2) t)
             |  GROUP BY pr)
             |ORDER BY cnt DESC, pair ASC LIMIT 1""".stripMargin).localCheckpoint()
        ms += m
        m.createOrReplaceTempView("gbpe_m")
        val pat = "' ' || (SELECT pair FROM gbpe_m) || ' '"
        val rep = "' ' || (SELECT replace(pair, ' ', '') FROM gbpe_m) || ' '"
        // roll: the new vocab state is eager-checkpointed, so the previous
        // round's blocks are freed at once (one round of storage, ever)
        r = graft.ops.Memo.roll(r, s.sql(
          s"""SELECT word, freq, TRIM(replace(replace(' ' || repr || ' ',
             |  $pat, $rep), $pat, $rep)) AS repr
             |FROM gbpe_r""".stripMargin).localCheckpoint())
      }
      (ms.result(), r)
    })
  }

  private val bpeCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (Seq[DataFrame], DataFrame)]()

  def clearCaches(): Unit =
    graft.ops.Memo.clearAny(bpeCache) { case (ms, r) => ms :+ r }

  /** q129: the learned merge table over the documents corpus. */
  def bpeMerges(s: SparkSession, dir: String): DataFrame = {
    val (ms, _) = learned(s, dir)
    ms.zipWithIndex.map { case (m, i) =>
      m.select(lit(i + 1L).as("merge_rank"), col("pair"),
        regexp_replace(col("pair"), " ", "").as("merged"),
        col("cnt").cast("bigint").as("cnt"))
    }.reduce(_ union _).orderBy(col("merge_rank"))
  }

  /** q130: per-document BPE token counts under the learned merges. */
  def bpeEncode(s: SparkSession, dir: String): DataFrame = {
    val (_, rFinal) = learned(s, dir)
    Tables(s, dir, "documents").createOrReplaceTempView("gdocs_bpe")
    rFinal.createOrReplaceTempView("gbpe_rfinal")
    s.sql(
      s"""WITH tok AS (SELECT word, CAST(${spark_.size(spark_.split("repr"))} AS BIGINT) AS n_tok
         |            FROM gbpe_rfinal),
         |w AS (SELECT doc_id, word FROM (
         |  SELECT doc_id, ${spark_.explode(spark_.split("text"))} AS word FROM gdocs_bpe) x
         |  WHERE word <> '')
         |SELECT w.doc_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |  CAST(SUM(tok.n_tok) AS BIGINT) AS n_tokens
         |FROM w JOIN tok ON w.word = tok.word
         |GROUP BY w.doc_id ORDER BY doc_id""".stripMargin)
  }

  /** The DuckDB-dialect encode mirror, for oracles that aggregate over
    * the per-doc encode (q152 fertility). */
  private[graft] lazy val encodeSqlDuck: String = encodeSql(duck)

  def queries: Seq[Q] = Seq(
    Q("q129_text_bpe_merges", bpeMerges, Some(learnSql(duck))),
    Q("q130_text_bpe_encode", bpeEncode, Some(encodeSql(duck))))
}
