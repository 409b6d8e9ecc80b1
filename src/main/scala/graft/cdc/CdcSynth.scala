package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Deterministic CDC-envelope synthesis from the driver's `events` table
  * (FIXTURES.md §5: streaming tests wrap events rows into the §1 envelope).
  *
  * Spec (shared verbatim with the DuckDB oracles in CdcQueries): for
  * `m = event_id % 8`:
  *
  * | m | origin      | oldImage | newImage | derived op         |
  * |---|-------------|----------|----------|--------------------|
  * | 0 | USER        | —        | X        | INSERT             |
  * | 1 | USER        | Y        | X        | UPDATE             |
  * | 2 | USER        | Y        | —        | DELETE             |
  * | 3 | REPLICATION | —        | X        | REPLICATED_INSERT  |
  * | 4 | REPLICATION | Y        | X        | REPLICATED_UPDATE  |
  * | 5 | REPLICATION | Y        | —        | REPLICATED_DELETE  |
  * | 6 | TTL         | Y        | —        | TTL                |
  * | 7 | null        | —        | X        | UNKNOWN            |
  *
  * X = (user_id, event_type, value, k); Y = X with value-1.0.
  * arrival = epoch millis of ts; seq = event_id left-padded to 20 (the
  * reference's per-shard sequence numbers are decimal strings that sort
  * lexicographically — AbstractJSONConverter.java:122).
  */
object CdcSynth {

  val imageSchema: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("k", LongType)))

  def fromEvents(spark: SparkSession, dir: String): DataFrame =
    envelope(Tables(spark, dir, "events"))

  /** Pure transform (works on batch AND streaming DataFrames of the events
    * schema). */
  def envelope(events: DataFrame): DataFrame = {
    val ev = events
      .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
      .withColumn("m", pmod(col("event_id"), lit(8L)))
    val origin = when(col("m").isin(0L, 1L, 2L), "USER")
      .when(col("m").isin(3L, 4L, 5L), "REPLICATION")
      .when(col("m") === 6L, "TTL")
    val hasNew = col("m").isin(0L, 1L, 3L, 4L, 7L)
    val hasOld = col("m").isin(1L, 2L, 4L, 5L, 6L)
    val newImg = when(hasNew, struct(
      col("user_id"), col("event_type"), col("value"), col("k")))
    val oldImg = when(hasOld, struct(
      col("user_id"), col("event_type"), (col("value") - 1.0).as("value"), col("k")))
    ev.select(
      col("event_id"),
      origin.as("origin"),
      Cdc.metadataStruct("media", "events", origin, oldImg, newImg,
        unix_millis(col("ts")), lpad(col("event_id").cast(StringType), 20, "0"))
        .as("metadata"),
      newImg.as("image"),
      oldImg.as("oldImage"))
  }

  /** The same spec as flat SQL for the DuckDB oracle side. Columns:
    * event_id, origin, op, ems, seq, has_new, has_old,
    * new_user_id/new_event_type/new_value/new_k, old_* equivalents. */
  val synthSql: String =
    """cdc AS (
      |  SELECT event_id,
      |    CASE WHEN event_id % 8 IN (0,1,2) THEN 'USER'
      |         WHEN event_id % 8 IN (3,4,5) THEN 'REPLICATION'
      |         WHEN event_id % 8 = 6 THEN 'TTL' END AS origin,
      |    CASE WHEN event_id % 8 = 7 THEN 'UNKNOWN'
      |         WHEN event_id % 8 = 6 THEN 'TTL'
      |         WHEN event_id % 8 = 0 THEN 'INSERT'
      |         WHEN event_id % 8 = 1 THEN 'UPDATE'
      |         WHEN event_id % 8 = 2 THEN 'DELETE'
      |         WHEN event_id % 8 = 3 THEN 'REPLICATED_INSERT'
      |         WHEN event_id % 8 = 4 THEN 'REPLICATED_UPDATE'
      |         WHEN event_id % 8 = 5 THEN 'REPLICATED_DELETE' END AS op,
      |    epoch_ms(ts) AS ems,
      |    lpad(CAST(event_id AS VARCHAR), 20, '0') AS seq,
      |    event_id % 8 IN (0,1,3,4,7) AS has_new,
      |    event_id % 8 IN (1,2,4,5,6) AS has_old,
      |    CASE WHEN event_id % 8 IN (0,1,3,4,7) THEN user_id END AS new_user_id,
      |    CASE WHEN event_id % 8 IN (0,1,3,4,7) THEN event_type END AS new_event_type,
      |    CASE WHEN event_id % 8 IN (0,1,3,4,7) THEN value END AS new_value,
      |    CASE WHEN event_id % 8 IN (0,1,3,4,7) THEN CAST(props->>'$.k' AS BIGINT) END AS new_k,
      |    CASE WHEN event_id % 8 IN (1,2,4,5,6) THEN user_id END AS old_user_id,
      |    CASE WHEN event_id % 8 IN (1,2,4,5,6) THEN event_type END AS old_event_type,
      |    CASE WHEN event_id % 8 IN (1,2,4,5,6) THEN value - 1.0 END AS old_value,
      |    CASE WHEN event_id % 8 IN (1,2,4,5,6) THEN CAST(props->>'$.k' AS BIGINT) END AS old_k
      |  FROM events)""".stripMargin
}
