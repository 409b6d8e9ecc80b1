package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** SEMI-STRUCTURED ingestion through Spark 4's VARIANT type — the modern
  * path for the reference's schemaless payloads (its Avro converter
  * re-infers a schema per batch, AbstractAvroConverter.java:339-394; a
  * lakehouse keeps the raw JSON and shreds at read instead): `parse_json`
  * once into a binary VARIANT column, then `variant_get` typed path
  * extraction inside whole-stage codegen — no per-row string re-parse per
  * accessed field, no schema registry for payloads that drift.
  *
  * q208 runs the shape end-to-end on the events table's JSON `props`:
  * parse → typed extraction (long path + a missing path that must
  * null-fill via try semantics) → grouped aggregate. The oracle is
  * DuckDB's native JSON path extraction over the same strings — VARIANT
  * is an encoding, not a semantic: values must match exactly.
  *
  * Scale shape: parse and extraction are per-row projections (one scan,
  * codegen'd); the aggregate is the only shuffle, keyed on event_type.
  * At 100 TB the win over get_json_object is parsing each props string
  * ONCE regardless of how many fields downstream expressions pull.
  */
object VariantOpsImpl {

  def variantShred(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .select(col("event_type"), parse_json(col("props")).as("v"))
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'bigint')").as("k"),
        expr("try_variant_get(v, '$.missing', 'bigint')").as("absent"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        count(col("absent")).as("n_absent"))
      .orderBy(col("event_type"))

  private val q208Sql: String =
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(props->>'$.k' AS BIGINT)) AS min_k,
      |  MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k,
      |  CAST(COUNT(CAST(props->>'$.missing' AS BIGINT)) AS BIGINT) AS n_absent
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  lazy val queries: Seq[Q] = Seq(
    Q("q208_variant_shred", variantShred, Some(q208Sql)))
}

object VariantOps {
  lazy val queries: Seq[Q] = VariantOpsImpl.queries
}
