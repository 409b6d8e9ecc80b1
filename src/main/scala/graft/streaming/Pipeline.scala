package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

import graft.cdc.Cdc
import graft.config.GraftConfig
import graft.expr.Jexl

/** Pipeline assembly — the Spark analogue of `KCLMainRunner.main`
  * (KCLMainRunner.java:25-102): config → source → JEXL filter → projection →
  * sink, with checkpointing.
  *
  * Execution shape vs the reference (SURVEY.md §3.1): KCL per-shard threads
  * become Spark tasks; the DynamoDB lease table becomes the checkpoint
  * location (offsets + WAL); at-least-once `foreachBatch` delivery replaces
  * the reference's checkpoint-after-write (which can silently skip poison
  * batches — KeyspacesRecordProcessor.java:57-59; ours replays them).
  * The plan is narrow end to end: no shuffle for file/SQS/vector paths, one
  * key shuffle for the MV path — identical at 1 shard or 10,000.
  */
object Pipeline {

  /** Filter (F1) + record-format (P2) + fields-to-include (P1) over the CDC
    * envelope — the per-batch dataflow of KeyspacesRecordProcessor.processRecords. */
  def transform(env: DataFrame, settings: GraftConfig.ConnectorSettings,
      imageSchema: org.apache.spark.sql.types.StructType): DataFrame = {
    val filtered = Jexl.filter(env, settings.filterExpression)
    val shaped = Cdc.selectImage(filtered, settings.recordFormat)
    val pruned =
      if (settings.fieldsToInclude.isEmpty) shaped
      else if (settings.recordFormat == "full")
        shaped
          .withColumn("image", Cdc.includeFields(col("image"), imageSchema, settings.fieldsToInclude))
          .withColumn("oldImage", Cdc.includeFields(col("oldImage"), imageSchema, settings.fieldsToInclude))
      else shaped.withColumn("image",
        Cdc.includeFields(col("image"), imageSchema, settings.fieldsToInclude))
    // include-metadata=false only omits metadata from the SERIALIZED payload
    // (the reference skips the metadata node in the converter output but
    // keeps sequence numbers available for routing and message ids) — so
    // rename to an internal column rather than dropping; sinks read routing
    // fields via Sinks.metaCol and exclude internal columns at
    // serialization time via Sinks.payloadColumns.
    if (settings.includeMetadata) pruned
    else pruned.withColumnRenamed("metadata", Sinks.RoutingMeta)
  }

  /** Wire a streaming envelope source into a sink with checkpointing.
    *
    * With `filter-action = quarantine` (and a dead-letter dir), records
    * failing the JEXL filter are ROUTED instead of dropped: the split runs
    * on the RAW envelope inside each micro-batch (dead letters keep full
    * envelope fidelity regardless of record-format), failures land under
    * `deadLetterDir/epoch=N` (overwrite — replay-idempotent), and only
    * passing records flow through the normal transform into the sink. */
  def run(env: DataFrame, settings: GraftConfig.ConnectorSettings,
      imageSchema: org.apache.spark.sql.types.StructType,
      sink: Sinks.BatchSink, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      deadLetterDir: Option[String] = None): DataStreamWriter[Row] = {
    // FAIL CLOSED on misconfiguration: quarantine exists to preserve
    // records, so silently degrading to hard-drop (typo'd action value,
    // or quarantine requested with nowhere to put the dead letters) would
    // discard exactly what the user configured to keep
    require(Set("drop", "quarantine").contains(settings.filterAction),
      s"unknown filter-action '${settings.filterAction}' (drop | quarantine)")
    require(settings.filterAction != "quarantine" || deadLetterDir.nonEmpty,
      "filter-action = quarantine requires a dead-letter dir")
    val quarantine = deadLetterDir.filter(_ =>
      settings.filterAction == "quarantine" && settings.filterExpression.exists(_.nonEmpty))
    val body: (DataFrame, Long) => Unit = quarantine match {
      case Some(dlq) =>
        val rule = "filter-expression" -> Jexl.compile(settings.filterExpression.get)
        val noFilter = settings.copy(filterExpression = None)
        (batch, id) => {
          val (ok, bad) = Quarantine.split(batch, Seq(rule))
          bad.write.mode("overwrite").parquet(s"$dlq/epoch=$id")
          sink(transform(ok, noFilter, imageSchema), id)
        }
      case None => (batch, id) => sink(transform(batch, settings, imageSchema), id)
    }
    // the transform moved INSIDE foreachBatch (it is a pure DataFrame
    // function, so batch-side application is identical) to let the
    // quarantine path split the raw envelope first
    env.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(body)
  }
}

/** Exact greedy message packing — reference semantics
  * (AbstractJSONConverter.java:93-183): walk records in sequence order,
  * roll a message when adding the next record would cross max-message-size
  * OR max-records-per-message. Inherently sequential per shard, so it runs
  * as a sorted per-shard group traversal (one shuffle on the shard key,
  * shards process in parallel — exactly the reference's per-shard
  * parallelism). The closed-form declarative variant for huge batch
  * backfills is [[graft.cdc.Cdc.packBySize]].
  */
object Packing {

  final case class PackedRecord(shard: String, seq: String, bytes: Long, messageBin: Long)

  /** Message id scheme of the reference (AbstractJSONConverter.java:152,
    * :175): `firstSeq-lastSeq`, with a `-epochMillis` suffix on the final
    * (possibly still-open) message of a batch. The clock is injected —
    * SURVEY.md §7.4 risk 4: wall-clock-derived ids are untestable otherwise.
    */
  def messageId(firstSeq: String, lastSeq: String, isFinal: Boolean,
      clock: () => Long = () => System.currentTimeMillis()): String =
    if (isFinal) s"$firstSeq-$lastSeq-${clock()}" else s"$firstSeq-$lastSeq"

  /** Constant-memory greedy message assembler shared by the packing sinks
    * (SQS bodies, JSON object files): feed `add` with (seq, serialized
    * record) in sequence order; `emit` receives each closed message as
    * (messageId, record bodies, isFinal). Reference roll semantics
    * (AbstractJSONConverter.java:126-170): roll BEFORE adding when the sum
    * of record sizes would cross `maxBytes` or the count would cross
    * `maxRecords`; a single oversized record still forms a message. */
  final class GreedyPacker(maxBytes: Long, maxRecords: Int, clock: () => Long,
      emit: (String, Seq[String], Boolean) => Unit) {
    private val bodies = scala.collection.mutable.Buffer[String]()
    private var first: String = null
    private var last: String = null
    private var size = 0L
    private var count = 0
    def add(seq: String, body: String): Unit = {
      val recSize = body.getBytes("UTF-8").length.toLong
      val needNew = count > 0 &&
        ((maxBytes != -1 && size + recSize > maxBytes) ||
          (maxRecords != -1 && count >= maxRecords))
      if (needNew) close(isFinal = false)
      if (first == null) first = seq
      last = seq
      bodies += body; size += recSize; count += 1
    }
    /** Close the open message (if any); `isFinal` marks the last message of
      * a shard's run and appends the reference's `-now` id suffix. */
    def close(isFinal: Boolean): Unit = if (count > 0) {
      emit(messageId(first, last, isFinal, clock), bodies.toVector, isFinal)
      bodies.clear(); first = null; last = null; size = 0L; count = 0
    }
  }

  /** Streaming shape: one shuffle on the shard key, Spark's external sort
    * within partitions (spillable), then a CONSTANT-memory iterator
    * traversal — the packer state is three counters, never a materialized
    * shard (the r1/r2 `it.toVector.sortBy` form OOMed a task on one giant
    * shard at scale; same pattern as AvroSink.sink). A partition can hold
    * several shards (hash collisions), so packer state resets on every
    * shard boundary. */
  def greedyPack(df: DataFrame, shardCol: String, seqCol: String, sizeCol: String,
      maxBytes: Long, maxRecords: Int): Dataset[PackedRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(shardCol).cast("string").as("_1"),
        col(seqCol).cast("string").as("_2"), col(sizeCol).cast("long").as("_3"))
      .repartition(col("_1"))
      .sortWithinPartitions(col("_1"), col("_2"))
      .as[(String, String, Long)]
      .mapPartitions { it =>
        var shard: String = null
        var bin = 0L
        var bytes = 0L
        var count = 0
        it.map { case (sh, seq, size) =>
          if (sh != shard) { shard = sh; bin = 0L; bytes = 0L; count = 0 }
          val wouldOverflow = count > 0 &&
            (bytes + size > maxBytes || (maxRecords > 0 && count + 1 > maxRecords))
          if (wouldOverflow) { bin += 1; bytes = 0L; count = 0 }
          bytes += size; count += 1
          PackedRecord(sh, seq, size, bin)
        }
      }
  }
}
