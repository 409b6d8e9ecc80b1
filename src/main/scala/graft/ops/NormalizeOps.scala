package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** TEXT NORMALIZATION + PRIVACY-AUDIT curation steps.
  *
  * q210 — canonical text normalization, the step every dedup/tokenize
  * stage assumes has already happened (case-fold → strip non-alnum →
  * collapse whitespace → trim): per doc the normalized hash, token counts
  * before/after, and whether normalization changed the text at all. The
  * changed-fraction is the dial that says whether a corpus needs the pass
  * (a clean corpus skips a full rewrite). Pure per-row projections — one
  * scan, codegen'd, no shuffle before the final ORDER BY; at 100 TB this
  * runs as a narrow map over the corpus partitioning.
  *
  * q211 — K-ANONYMITY audit over quasi-identifier combinations (the
  * privacy sibling of q106's PII scrub): a released/training corpus leaks
  * identity when a combination of innocuous attributes isolates fewer
  * than k individuals. Per (lang, source) cell: docs, the distinct-length
  * proxy for distinct individuals, and the at-risk flag (n < k). One
  * grouped aggregate (map-side combined) over a two-column scan.
  */
object NormalizeOpsImpl {

  private val K = 5L

  def textNormalize(s: SparkSession, dir: String): DataFrame = {
    // one codegen'd pass (see [[graft.expr.NormalizeAscii]]) instead of
    // lower + two regex walks + trim: q210 is a narrow map whose cost
    // should be scan bytes, not regex throughput
    val norm = graft.expr.NormalizeAscii(col("text"))
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"), norm.as("norm"))
      .select(
        col("doc_id"),
        md5(col("norm")).as("norm_hash"),
        size(split(col("text"), " ")).cast("long").as("n_tokens_raw"),
        when(col("norm") === "", 0L)
          .otherwise(size(split(col("norm"), " ")).cast("long")).as("n_tokens_norm"),
        (col("norm") =!= col("text")).as("changed"))
      .orderBy(col("doc_id"))
  }

  private val q210Sql: String =
    """WITH n AS (
      |  SELECT doc_id, text,
      |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
      |         ' +', ' ', 'g')) AS norm
      |  FROM documents)
      |SELECT doc_id, md5(norm) AS norm_hash,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens_raw,
      |  CASE WHEN norm = '' THEN 0
      |       ELSE CAST(len(string_split(norm, ' ')) AS BIGINT) END AS n_tokens_norm,
      |  norm <> text AS changed
      |FROM n ORDER BY doc_id""".stripMargin

  def kAnonymity(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("n_chars")).as("n_distinct_lengths"))
      .withColumn("at_risk", col("n_docs") < K)
      .orderBy(col("lang"), col("source"))

  private val q211Sql: String =
    s"""SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(COUNT(DISTINCT n_chars) AS BIGINT) AS n_distinct_lengths,
       |  COUNT(*) < $K AS at_risk
       |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin

  lazy val queries: Seq[Q] = Seq(
    Q("q210_text_normalize", textNormalize, Some(q210Sql)),
    Q("q211_k_anonymity", kAnonymity, Some(q211Sql)))
}

object NormalizeOps {
  lazy val queries: Seq[Q] = NormalizeOpsImpl.queries
}
