package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core CDC-envelope operators, Spark-first re-expressions of the reference's
  * record pipeline (see SURVEY.md §1-2; citations are /root/reference paths).
  *
  * The envelope mirrors the JSON shape built by
  * `AbstractJSONConverter.createRecordNode` (AbstractJSONConverter.java:197-234):
  *
  * {{{
  * origin:   string                  // USER | REPLICATION | TTL | null
  * metadata: struct(stream_keyspace_name, stream_table_name,
  *                  stream_operation_type, stream_arrival_timestamp,
  *                  stream_sequence_number)
  * image:    struct(<table columns>)  // newImage; null on DELETE/TTL
  * oldImage: struct(<table columns>)  // null on INSERT
  * }}}
  *
  * Everything here is a `Column`/`DataFrame` transform so Catalyst gets a
  * declarative plan: filters and column prunes push into the scan, the whole
  * pipeline stays in one WholeStageCodegen span, and no shuffle is introduced
  * (source → filter → project → sink is a narrow pipeline at any scale).
  */
object Cdc {

  /** Operation-type derivation — the 8-outcome truth table of
    * `StreamHelpers.getOperationType` (StreamHelpers.java:26-63): TTL origin
    * wins, null origin → UNKNOWN, else (oldImage?, newImage?) × origin.
    * Both-present AND both-absent land in the reference's else-branch, i.e.
    * UPDATE / REPLICATED_UPDATE.
    */
  def operationType(origin: Column, oldImage: Column, newImage: Column): Column =
    when(origin.isNull, "UNKNOWN")
      .when(origin === "TTL", "TTL")
      .when(oldImage.isNotNull && newImage.isNull,
        when(origin === "REPLICATION", "REPLICATED_DELETE").otherwise("DELETE"))
      .when(oldImage.isNull && newImage.isNotNull,
        when(origin === "REPLICATION", "REPLICATED_INSERT").otherwise("INSERT"))
      .otherwise(when(origin === "REPLICATION", "REPLICATED_UPDATE").otherwise("UPDATE"))

  /** Metadata enrichment (P4) — the 5 stream_* fields of
    * AbstractJSONConverter.java:207-215, from source-provided columns.
    */
  def metadataStruct(keyspace: String, table: String, origin: Column,
      oldImage: Column, newImage: Column, arrivalMillis: Column,
      sequenceNumber: Column): Column =
    struct(
      lit(keyspace).as("stream_keyspace_name"),
      lit(table).as("stream_table_name"),
      operationType(origin, oldImage, newImage).as("stream_operation_type"),
      arrivalMillis.as("stream_arrival_timestamp"),
      sequenceNumber.as("stream_sequence_number"))

  /** record-format image selection (P2): `full` keeps both images; default
    * picks newImage with oldImage fallback for DELETE/TTL
    * (AbstractJSONConverter.java:218-231).
    */
  def selectImage(df: DataFrame, recordFormat: String): DataFrame =
    recordFormat match {
      case "full" => df
      case _ => df.withColumn("image", coalesce(col("image"), col("oldImage")))
        .drop("oldImage")
    }

  /** fields-to-include pruning (P1): empty list = all columns
    * (AbstractJSONConverter.java:249-263). Nested-schema pruning makes the
    * physical scan read only these fields.
    */
  def includeFields(image: Column, imageSchema: StructType, fields: Seq[String]): Column = {
    val keep = if (fields.isEmpty) imageSchema.fieldNames.toSeq
    else imageSchema.fieldNames.toSeq.filter(fields.contains)
    // preserve image-level nullness: a NULL image (DELETE/TTL) must stay
    // NULL, not become a struct of null fields (the reference emits no
    // image node at all in that case — AbstractJSONConverter.java:218-231)
    when(image.isNotNull, struct(keep.map(f => image.getField(f).as(f)): _*))
  }

  /** `old_`-prefixed flattening for full format (P3,
    * AbstractAvroConverter.java:125-134, :176-191): new columns beside
    * `old_<name>` columns in one flat record.
    */
  def flattenFull(df: DataFrame, imageSchema: StructType, fields: Seq[String]): DataFrame = {
    val keep = if (fields.isEmpty) imageSchema.fieldNames.toSeq
    else imageSchema.fieldNames.toSeq.filter(fields.contains)
    val newCols = keep.map(f => col("image").getField(f).as(f))
    val oldCols = keep.map(f => col("oldImage").getField(f).as(s"old_$f"))
    df.select((df.columns.filterNot(c => c == "image" || c == "oldImage").map(col).toSeq
      ++ newCols ++ oldCols): _*)
  }

  /** Time-based partition columns (B4, S3TargetMapper.java:84-110).
    * The reference uses wall-clock `LocalDateTime.now()`; we default to the
    * event-time variant (arrival timestamp) so output partitioning is
    * deterministic and reprocessing lands records in the same partitions —
    * pass `current_timestamp()` for strict processing-time parity.
    * Granularities mirror the fall-through switch: finer includes coarser.
    */
  private val granularityOrder = Seq("years", "months", "days", "hours", "minutes", "seconds")

  def timePartitionColumns(ts: Column, granularity: String): Seq[Column] = {
    val n = granularityOrder.indexOf(granularity) match {
      case -1 => granularityOrder.indexOf("hours")
      case i => i
    }
    val all = Seq(
      date_format(ts, "yyyy").as("year"),
      date_format(ts, "MM").as("month"),
      date_format(ts, "dd").as("day"),
      date_format(ts, "HH").as("hour"),
      date_format(ts, "mm").as("minute"),
      date_format(ts, "ss").as("second"))
    all.take(n + 1)
  }

  /** The `YYYY/MM/DD/HH` S3 prefix path (S3TargetMapper.java:126-129). */
  def timePartitionPath(ts: Column, granularity: String): Column = {
    val fmt = granularityOrder.indexOf(granularity) match {
      case -1 => "yyyy/MM/dd/HH"
      case i => Seq("yyyy", "yyyy/MM", "yyyy/MM/dd", "yyyy/MM/dd/HH",
        "yyyy/MM/dd/HH/mm", "yyyy/MM/dd/HH/mm/ss")(i)
    }
    date_format(ts, fmt)
  }

  /** Count-bounded message packing (B1 `max-records-per-message`,
    * AbstractJSONConverter.java:137-161): records in sequence order are
    * grouped into messages of at most `maxRecords`, keyed
    * `firstSeq-lastSeq` (AbstractJSONConverter.java:152).
    *
    * Closed-form over a window — one shuffle on the shard key, no driver
    * loop, scales with partition count. `shardCol` is the per-shard stream
    * identity (packing is per-shard in the reference: one processor per
    * shard).
    */
  def packByCount(df: DataFrame, shardCol: Column, seqCol: Column,
      maxRecords: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shardCol).orderBy(seqCol)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("message_bin", ((col("__rn") - 1) / maxRecords).cast(LongType))
      .drop("__rn")
  }

  /** Size-bounded packing (B1 `max-message-size`): deterministic closed-form
    * variant — a record starts a new message when the exclusive running byte
    * total crosses a `maxBytes` boundary. (The reference's greedy packer is
    * stateful-sequential; the streaming sink implements exact greedy per
    * shard — see graft.streaming.Packing — while this closed form is the
    * scale-friendly declarative equivalent used for batch backfills.)
    */
  def packBySize(df: DataFrame, shardCol: Column, seqCol: Column,
      sizeCol: Column, maxBytes: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shardCol).orderBy(seqCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("__cum", sum(sizeCol).over(w))
      .withColumn("message_bin", ((col("__cum") - sizeCol) / maxBytes).cast(LongType))
      .drop("__cum")
  }

  /** Log replay / compaction: materialize the final table state a CDC log
    * describes — the batch-backfill twin of the streaming MV sink
    * (KeyspacesViewTargetMapper.java:60-78 upserts newImage rows and deletes
    * on DELETE/TTL; replaying the whole log through that sink yields exactly
    * this frame). Per key: the record with the highest sequence number wins;
    * if its `image` is NULL (DELETE / REPLICATED_DELETE / TTL) the key is
    * absent from the final state.
    *
    * Scale shape: one hash shuffle on the key via `max_by` aggregation —
    * partial (map-side) aggregation keeps only one record per key per
    * partition in flight, so reducer memory is O(distinct keys / partitions)
    * regardless of log depth. A window/row_number formulation would sort
    * whole key groups instead; at 100 TB of log that difference is the job.
    * Requires sequence numbers unique per key (the reference's per-shard
    * ordering guarantee — AbstractJSONConverter.java:122).
    */
  def replayLatest(envelopes: DataFrame, keyCol: Column, seqCol: Column): DataFrame =
    envelopes
      .groupBy(keyCol.as("key"))
      .agg(
        max_by(struct(col("metadata.stream_operation_type").as("op"), col("image")),
          seqCol).as("last"),
        max(seqCol).as("last_seq"))
      .filter(col("last.image").isNotNull)

  /** Incremental AGGREGATE view maintenance (IVM) — the grouped-aggregate
    * sibling of the K1 latest-per-key sink: each CDC envelope carries its
    * own delta against any COUNT/SUM-family aggregate, so a materialized
    * `GROUP BY g → (count, sum v)` view updates from the log alone, never
    * re-reading the base table:
    *
    *  - a present newImage contributes (+1, +v) to ITS group,
    *  - a present oldImage contributes (−1, −v) to ITS group
    *    (an UPDATE thus moves mass between groups when g changed — both
    *    rows appear, which is exactly the algebra of the view delta).
    *
    * Emits one (group, dcount, dvalue) row per present image. Works on
    * batch and streaming frames alike — a streaming `groupBy(group).sum`
    * over this stream IS the live view, and because the delta is a pure
    * per-row function, a live view and a batch backfill agree bitwise
    * (CdcIvmSpec; it also proves the invariant that on a CONSISTENT log —
    * old image = previous new image — the maintained view equals a full
    * recompute over the replayed final state).
    *
    * Scale shape: one narrow pass over the log (the 2-way explode is per
    * envelope, before any shuffle), then a partial-aggregated shuffle of
    * group-keyed delta rows — the view update never touches the base
    * table, which at 100 TB is the entire point of IVM. */
  def aggDeltas(envelopes: DataFrame, groupOf: Column => Column,
      valueOf: Column => Column): DataFrame =
    envelopes
      .select(explode(array(
        struct(groupOf(col("image")).as("g"),
          when(col("image").isNotNull, 1L).otherwise(0L).as("dcount"),
          valueOf(col("image")).as("dvalue")),
        struct(groupOf(col("oldImage")).as("g"),
          when(col("oldImage").isNotNull, -1L).otherwise(0L).as("dcount"),
          (-valueOf(col("oldImage"))).as("dvalue")))).as("d"))
      .select(col("d.*"))
      // keep every PRESENT image's delta (dcount ≠ 0), including ones whose
      // group value is genuinely NULL — filtering on g IS NOT NULL would
      // silently drop the NULL group and diverge from a full recompute,
      // which keeps it. Absent images (dcount = 0) carry no delta.
      .filter(col("dcount") =!= 0L)
}
