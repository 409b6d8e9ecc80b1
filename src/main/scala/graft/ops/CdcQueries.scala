package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Q
import graft.cdc.{Cdc, CdcSynth}
import graft.expr.Jexl

/** Driver-gate coverage for the reference's CDC operator inventory
  * (SURVEY.md §2): op-type derivation (P5), JEXL filter (F1/F2),
  * fields-to-include (P1), record-format selection (P2), old_ flattening
  * (P3), metadata enrichment (P4), the cast matrix (P6), time partitioning
  * (B4) and message packing (B1). Each query runs the library operator over
  * the deterministic CDC synthesis of `events` and is checked against a
  * DuckDB oracle that re-states the same spec in flat SQL.
  */
object CdcQueriesImpl {

  private val fields = Seq("user_id", "value")

  def opTypeCounts(s: SparkSession, dir: String): DataFrame =
    CdcSynth.fromEvents(s, dir)
      .groupBy(col("metadata.stream_operation_type").as("op"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("op"))

  /** The reference's canonical filter shape (streams-application.conf:32)
    * retargeted at the events image. */
  val jexlExpr: String =
    "newImage != null && (newImage.value ?: 0) > 100.0 && metadata.operation != 'DELETE'"

  def jexlFilter(s: SparkSession, dir: String): DataFrame =
    Jexl.filter(CdcSynth.fromEvents(s, dir), Some(jexlExpr))
      .select(col("event_id"), col("image.value").as("value"))
      .orderBy(col("event_id"))

  def projectDefault(s: SparkSession, dir: String): DataFrame = {
    val env = Cdc.selectImage(CdcSynth.fromEvents(s, dir), "new-image")
    env.select((col("event_id") +:
      fields.map(f => Cdc.includeFields(col("image"), CdcSynth.imageSchema, fields)
        .getField(f).as(f))): _*)
      .orderBy(col("event_id"))
  }

  def flattenFull(s: SparkSession, dir: String): DataFrame =
    Cdc.flattenFull(CdcSynth.fromEvents(s, dir).select("event_id", "image", "oldImage"),
        CdcSynth.imageSchema, fields)
      .orderBy(col("event_id"))

  def metadataEnvelope(s: SparkSession, dir: String): DataFrame =
    CdcSynth.fromEvents(s, dir)
      .select(col("event_id"), col("metadata.*"))
      .orderBy(col("event_id"))

  /** P6 cast matrix: string wire values → typed columns, fail-closed
    * (StreamHelpers.java:76-117; unparseable → NULL via try_cast, mirroring
    * the filter-out-on-error rule instead of failing the job). */
  def castMatrix(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
      .withColumn("ems", unix_millis(col("ts")))
    ev.select(
      col("event_id"),
      expr("CAST(try_cast(CAST(k AS STRING) AS INT) AS BIGINT)").as("c_int"),
      expr("try_cast(CAST(user_id AS STRING) AS BIGINT)").as("c_bigint"),
      expr("try_cast(CASE WHEN value > 100 THEN 'true' ELSE 'false' END AS BOOLEAN)").as("c_bool"),
      expr("try_cast(date_format(ts, 'yyyy-MM-dd') AS DATE)").as("c_date"),
      expr("CAST(try_cast(concat(CAST(k AS STRING), '.', lpad(CAST(user_id AS STRING), 2, '0')) " +
        "AS DECIMAL(38,18)) AS DOUBLE)").as("c_decimal"),
      concat(date_format(timestamp_millis(col("ems")), "yyyy-MM-dd HH:mm:ss"),
        lit("."), lpad(pmod(col("ems"), lit(1000L)).cast(StringType), 3, "0")).as("c_ts_str"),
      expr("try_cast(event_type AS INT)").as("c_fail_closed"))
      .orderBy(col("event_id"))
  }

  def timePartitions(s: SparkSession, dir: String): DataFrame = {
    val env = CdcSynth.fromEvents(s, dir)
      .withColumn("ats", timestamp_millis(col("metadata.stream_arrival_timestamp")))
    // sort FIRST on the narrow (event_id, ats) pair, format AFTER: the
    // five formatted strings quadruple the row, and computing them below
    // the sort would shuffle that width through the range exchange
    env.select(col("event_id"), col("ats"))
      .orderBy(col("event_id"))
      .select((col("event_id") +: Cdc.timePartitionColumns(col("ats"), "hours")) :+
        Cdc.timePartitionPath(col("ats"), "hours").as("path"): _*)
  }

  def packByCount(s: SparkSession, dir: String): DataFrame = {
    val env = CdcSynth.fromEvents(s, dir)
      .withColumn("shard", pmod(col("image.user_id"), lit(4L)))
      .withColumn("shard", coalesce(col("shard"), pmod(col("oldImage.user_id"), lit(4L))))
      .withColumn("seq", col("metadata.stream_sequence_number"))
    Cdc.packByCount(env, col("shard"), col("seq"), 50)
      .groupBy(col("shard"), col("message_bin"))
      .agg(concat(min(col("seq")), lit("-"), max(col("seq"))).as("message_id"),
        count(lit(1)).as("n_records"))
      .orderBy(col("shard"), col("message_bin"))
  }

  /** q29: replay the synthesized CDC log into final per-user state (the
    * batch backfill of the K1 materialized-view sink). Keys whose latest
    * record is a tombstone (DELETE / REPLICATED_DELETE / TTL) are absent. */
  def replayState(s: SparkSession, dir: String): DataFrame =
    Cdc.replayLatest(
        CdcSynth.fromEvents(s, dir),
        coalesce(col("image.user_id"), col("oldImage.user_id")),
        col("metadata.stream_sequence_number"))
      .select(col("key").as("user_id"), col("last.op").as("last_op"),
        col("last_seq"),
        col("last.image.event_type").as("event_type"),
        col("last.image.value").as("value"),
        col("last.image.k").as("k"))
      .orderBy(col("user_id"))

  /** q161: the delta-maintained aggregate view over the synthesized log —
    * per event_type, live row count and quantized value sum from deltas
    * alone ([[Cdc.aggDeltas]]). The synth log is deliberately inconsistent
    * per key (independent envelopes), so this gate pins the DELTA algebra;
    * CdcIvmSpec proves the IVM invariant (maintained == full recompute over
    * the replayed state) on a consistent constructed history. */
  def aggMv(s: SparkSession, dir: String): DataFrame =
    Cdc.aggDeltas(CdcSynth.fromEvents(s, dir),
        img => img.getField("event_type"), img => img.getField("value"))
      .groupBy(col("g").as("event_type"))
      .agg(sum(col("dcount")).as("n_live"), Det.dsum(col("dvalue")).as("sum_value"))
      .orderBy(col("event_type"))

  def packBySize(s: SparkSession, dir: String): DataFrame = {
    val env = CdcSynth.fromEvents(s, dir)
      .withColumn("shard", pmod(coalesce(col("image.user_id"), col("oldImage.user_id")), lit(4L)))
      .withColumn("seq", col("metadata.stream_sequence_number"))
      .withColumn("rec_bytes",
        lit(24L) + length(coalesce(col("image.event_type"), col("oldImage.event_type"))).cast(LongType)
          + pmod(coalesce(col("image.k"), col("oldImage.k")), lit(32L)))
    Cdc.packBySize(env, col("shard"), col("seq"), col("rec_bytes"), 1024L)
      .groupBy(col("shard"), col("message_bin"))
      .agg(concat(min(col("seq")), lit("-"), max(col("seq"))).as("message_id"),
        count(lit(1)).as("n_records"), sum(col("rec_bytes")).as("bytes"))
      .orderBy(col("shard"), col("message_bin"))
  }
}

object CdcQueries {
  import CdcSynth.synthSql

  def queries: Seq[Q] = Seq(
    Q("q20_cdc_optype", CdcQueriesImpl.opTypeCounts, Some(
      s"""WITH $synthSql
         |SELECT op, COUNT(*) AS n FROM cdc GROUP BY op ORDER BY op""".stripMargin)),

    Q("q21_cdc_jexl_filter", CdcQueriesImpl.jexlFilter, Some(
      s"""WITH $synthSql
         |SELECT event_id, new_value AS value FROM cdc
         |WHERE has_new AND COALESCE(new_value, 0) > 100.0 AND op <> 'DELETE'
         |ORDER BY event_id""".stripMargin), headline = true),

    Q("q22_cdc_project_default", CdcQueriesImpl.projectDefault, Some(
      s"""WITH $synthSql
         |SELECT event_id,
         |  CASE WHEN has_new THEN new_user_id ELSE old_user_id END AS user_id,
         |  CASE WHEN has_new THEN new_value ELSE old_value END AS value
         |FROM cdc ORDER BY event_id""".stripMargin)),

    Q("q23_cdc_flatten_full", CdcQueriesImpl.flattenFull, Some(
      s"""WITH $synthSql
         |SELECT event_id, new_user_id AS user_id, new_value AS value,
         |  old_user_id, old_value
         |FROM cdc ORDER BY event_id""".stripMargin)),

    Q("q24_cdc_metadata", CdcQueriesImpl.metadataEnvelope, Some(
      s"""WITH $synthSql
         |SELECT event_id, 'media' AS stream_keyspace_name, 'events' AS stream_table_name,
         |  op AS stream_operation_type, ems AS stream_arrival_timestamp,
         |  seq AS stream_sequence_number
         |FROM cdc ORDER BY event_id""".stripMargin)),

    Q("q25_cdc_cast_matrix", CdcQueriesImpl.castMatrix, Some(
      """SELECT event_id,
        |  CAST(TRY_CAST(CAST(CAST(props->>'$.k' AS BIGINT) AS VARCHAR) AS INT) AS BIGINT) AS c_int,
        |  TRY_CAST(CAST(user_id AS VARCHAR) AS BIGINT) AS c_bigint,
        |  TRY_CAST(CASE WHEN value > 100 THEN 'true' ELSE 'false' END AS BOOLEAN) AS c_bool,
        |  TRY_CAST(strftime(ts, '%Y-%m-%d') AS DATE) AS c_date,
        |  CAST(TRY_CAST(concat(CAST(CAST(props->>'$.k' AS BIGINT) AS VARCHAR), '.',
        |    lpad(CAST(user_id AS VARCHAR), 2, '0')) AS DECIMAL(38,18)) AS DOUBLE) AS c_decimal,
        |  concat(strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S'), '.',
        |    lpad(CAST(epoch_ms(ts) % 1000 AS VARCHAR), 3, '0')) AS c_ts_str,
        |  TRY_CAST(event_type AS INT) AS c_fail_closed
        |FROM events ORDER BY event_id""".stripMargin)),

    Q("q26_cdc_time_partition", CdcQueriesImpl.timePartitions, Some(
      s"""WITH $synthSql
         |SELECT event_id,
         |  strftime(make_timestamp(ems * 1000), '%Y') AS year,
         |  strftime(make_timestamp(ems * 1000), '%m') AS month,
         |  strftime(make_timestamp(ems * 1000), '%d') AS day,
         |  strftime(make_timestamp(ems * 1000), '%H') AS hour,
         |  strftime(make_timestamp(ems * 1000), '%Y/%m/%d/%H') AS path
         |FROM cdc ORDER BY event_id""".stripMargin)),

    Q("q27_cdc_pack_count", CdcQueriesImpl.packByCount, Some(
      s"""WITH $synthSql,
         |p AS (
         |  SELECT COALESCE(new_user_id, old_user_id) % 4 AS shard, seq,
         |    ROW_NUMBER() OVER (PARTITION BY COALESCE(new_user_id, old_user_id) % 4
         |      ORDER BY seq) AS rn
         |  FROM cdc)
         |SELECT shard, CAST((rn_grp) AS BIGINT) AS message_bin,
         |  MIN(seq) || '-' || MAX(seq) AS message_id, COUNT(*) AS n_records
         |FROM (SELECT shard, seq, (rn - 1) // 50 AS rn_grp FROM p) t
         |GROUP BY shard, rn_grp ORDER BY shard, message_bin""".stripMargin)),

    Q("q28_cdc_pack_size", CdcQueriesImpl.packBySize, Some(
      s"""WITH $synthSql,
         |p AS (
         |  SELECT COALESCE(new_user_id, old_user_id) % 4 AS shard, seq,
         |    24 + length(COALESCE(new_event_type, old_event_type))
         |      + COALESCE(new_k, old_k) % 32 AS rec_bytes
         |  FROM cdc),
         |c AS (
         |  SELECT shard, seq, rec_bytes,
         |    SUM(rec_bytes) OVER (PARTITION BY shard ORDER BY seq
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM p)
         |SELECT shard, CAST(FLOOR((cum - rec_bytes) / 1024.0) AS BIGINT) AS message_bin,
         |  MIN(seq) || '-' || MAX(seq) AS message_id, COUNT(*) AS n_records,
         |  CAST(SUM(rec_bytes) AS BIGINT) AS bytes
         |FROM c GROUP BY shard, message_bin ORDER BY shard, message_bin""".stripMargin)),

    Q("q161_cdc_agg_mv", CdcQueriesImpl.aggMv, Some(
      s"""WITH $synthSql,
         |d AS (
         |  SELECT new_event_type AS g,
         |    CASE WHEN has_new THEN 1 ELSE 0 END AS dcount,
         |    new_value AS dvalue
         |  FROM cdc
         |  UNION ALL
         |  SELECT old_event_type,
         |    CASE WHEN has_old THEN -1 ELSE 0 END,
         |    -old_value
         |  FROM cdc)
         |SELECT g AS event_type, CAST(SUM(dcount) AS BIGINT) AS n_live,
         |  CAST(SUM(CAST(dvalue AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
         |FROM d WHERE dcount <> 0
         |GROUP BY g ORDER BY g""".stripMargin)),

    Q("q29_cdc_replay_state", CdcQueriesImpl.replayState, Some(
      s"""WITH $synthSql,
         |latest AS (
         |  SELECT COALESCE(new_user_id, old_user_id) AS user_id,
         |    max_by(op, seq) AS last_op,
         |    max(seq) AS last_seq,
         |    max_by(has_new, seq) AS has_new,
         |    max_by(new_event_type, seq) AS event_type,
         |    max_by(new_value, seq) AS value,
         |    max_by(new_k, seq) AS k
         |  FROM cdc GROUP BY 1)
         |SELECT user_id, last_op, last_seq, event_type, value, k
         |FROM latest WHERE has_new ORDER BY user_id""".stripMargin))
  )
}
