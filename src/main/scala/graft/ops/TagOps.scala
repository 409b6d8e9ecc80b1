package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** DICTIONARY TAGGING (q228) — multi-pattern keyword/phrase matching over
  * the corpus: taxonomy labels, blocklists, compliance terms. The classic
  * single-node answer is an Aho-Corasick automaton per worker; the
  * Spark-FIRST answer needs no custom code at all — terms (unigrams and
  * n-gram phrases alike) are ROWS, so tagging is a broadcast equi-join:
  * explode each document's unigrams + bigrams once, join the
  * (term → tag) dictionary broadcast-side, count hits per (doc, tag).
  *
  * Scale shape: the corpus-side explode is one narrow codegen'd pass
  * (the exact q111/q116 n-gram discipline); the dictionary broadcasts at
  * any realistic size (100k terms ≈ a few MB — far under the broadcast
  * ceiling); the only shuffle is the (doc_id, tag)-keyed count, map-side
  * combined. No UDF, no automaton, no per-row regex — and a dictionary
  * UPDATE is a data change, not a code change. Longer phrases extend the
  * same way (k-gram transform), each a column expression. */
object TagOpsImpl {

  /** (term → tag) dictionary: unigrams and phrases mixed freely. */
  val Dict: Seq[(String, String)] = Seq(
    "join" -> "relational", "hash" -> "relational", "merge" -> "relational",
    "scan" -> "io", "filter" -> "io",
    "slow" -> "quality", "small" -> "quality",
    "hash join" -> "phrase", "merge join" -> "phrase",
    "slow scan" -> "phrase")

  def keywordTags(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = Tables(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val unigrams = t.select(col("doc_id"), explode(col("t")).as("term"))
    val bigrams = t.filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(t) - 1),
          |  i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"""
          .stripMargin)).as("term"))
    unigrams.unionByName(bigrams)
      .join(broadcast(Dict.toDF("term", "tag")), Seq("term"))
      .groupBy(col("doc_id"), col("tag"))
      .agg(count(lit(1)).as("hits"))
      .orderBy(col("doc_id"), col("tag"))
  }

  private[ops] lazy val q228Sql: String = {
    val dictRows = Dict.map { case (term, tag) => s"('$term', '$tag')" }
      .mkString(", ")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |terms AS (
       |  SELECT doc_id, unnest(t) AS term FROM t
       |  UNION ALL
       |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
       |    i -> t[i] || ' ' || t[i + 1])) AS term
       |  FROM t WHERE len(t) >= 2),
       |dict(term, tag) AS (VALUES $dictRows)
       |SELECT doc_id, tag, CAST(COUNT(*) AS BIGINT) AS hits
       |FROM terms JOIN dict USING (term)
       |GROUP BY doc_id, tag ORDER BY doc_id, tag""".stripMargin
  }
}

object TagOps {
  def queries: Seq[Q] = Seq(
    Q("q228_keyword_tags", TagOpsImpl.keywordTags, Some(TagOpsImpl.q228Sql)))
}
