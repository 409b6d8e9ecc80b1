package graft.streaming

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming sink layer: each sink is a `foreachBatch` body
  * (`(DataFrame, Long) => Unit`), the Spark shape of the reference's
  * `ITargetMapper.handleRecords` (ITargetMapper.java:8-15). Structured
  * Streaming's checkpointed micro-batches give at-least-once delivery for
  * these sinks — strictly stronger than the reference, whose poison batches
  * can skip checkpoints entirely (KeyspacesRecordProcessor.java:41-60).
  */
object Sinks {

  type BatchSink = (DataFrame, Long) => Unit

  /** `include-metadata = false` renames `metadata` to this internal column
    * (Pipeline.transform): the reference omits metadata only from serialized
    * payloads — sequence numbers / arrival timestamps stay available for
    * routing, partitioning and message ids. Sinks read routing fields via
    * [[metaCol]] and build payloads via [[payloadColumns]]. */
  val RoutingMeta = "__routing_metadata"

  def metaCol(df: DataFrame): Column =
    if (df.columns.contains("metadata")) col("metadata") else col(RoutingMeta)

  /** Columns that belong in a serialized payload (internal routing columns
    * excluded). */
  def payloadColumns(df: DataFrame): Seq[Column] =
    df.columns.filterNot(_ == RoutingMeta).map(col).toSeq

  /** EXACTLY-ONCE epoch ledger for side-effecting sinks: Structured
    * Streaming replays a micro-batch whose foreachBatch ran but whose
    * checkpoint commit did not land (at-least-once — the reference has
    * the same window, KeyspacesRecordProcessor.java:41-60, and answers it
    * with "consumers must be idempotent", sqs-connector README). The
    * ledger upgrades a non-idempotent sink (SQS send, vector put): a
    * marker file per epoch id is written AFTER the sink body, so a
    * replayed epoch whose marker exists is a no-op — the same trick the
    * versioned lakehouse sink uses for its history. The residual window
    * is a crash BETWEEN the send and the marker write: that one epoch
    * re-sends once (at-most-one duplicate burst per crash, vs one per
    * replayed epoch without the ledger); closing it entirely needs a
    * transactional target, which SQS/vector stores don't offer.
    *
    * Scale shape: one `exists` + one empty-file create per epoch against
    * the checkpoint filesystem — the same metadata cadence as the
    * checkpoint itself. */
  def idempotent(ledgerDir: String)(inner: BatchSink): BatchSink = (batch, id) => {
    val path = new org.apache.hadoop.fs.Path(ledgerDir, s"epoch-$id")
    val fs = path.getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) {
      inner(batch, id)
      fs.mkdirs(path.getParent)
      fs.create(path, false).close()
    }
  }

  /** Registry keyed by sink name — the Spark analogue of the reference's
    * reflective `getTargetMapper` instantiation (KeyspacesConfig.java:407-420). */
  final class SinkRegistry {
    private val sinks = mutable.Map[String, BatchSink]()
    def register(name: String, sink: BatchSink): this.type = { sinks(name) = sink; this }
    def apply(name: String): BatchSink = sinks.getOrElse(name,
      throw new IllegalArgumentException(s"unknown sink '$name'; known: ${sinks.keys.mkString(",")}"))
  }

  // ------------------------------------------------------------------ S3/file
  /** Partitioned file sink (B3/B4): JSON (or any Spark format) under
    * `prefix/yyyy/MM/dd/HH/...`, event-time partitions from the arrival
    * timestamp. File naming parity (`firstSeq-lastSeq-ts`) lives in message
    * ids inside the payload; Spark's commit protocol owns physical names —
    * that's what makes the write exactly-once at 1000-executor scale,
    * unlike the reference's hand-rolled puts. */
  def fileSink(path: String, format: String = "json",
      granularity: String = "hours"): BatchSink = (batch, _) => {
    val ts = timestamp_millis(metaCol(batch).getField("stream_arrival_timestamp"))
    val parts = graft.cdc.Cdc.timePartitionColumns(ts, granularity)
    val names = Seq("year", "month", "day", "hour", "minute", "second").take(parts.size)
    batch.select((payloadColumns(batch) ++ parts): _*)
      .write.mode("append").format(format)
      .partitionBy(names: _*)
      .save(path)
  }

  // ------------------------------------------------------------------ SQS
  /** Failure semantics of the reference's SQS sink
    * (SQSTargetMapper.java:111-155). */
  final class PartialFailureException(val failed: Int, val total: Int)
    extends RuntimeException(s"$failed of $total entries failed")
  final class AllItemsFailureException(val total: Int)
    extends RuntimeException(s"all $total entries failed")

  final case class SqsEntry(id: String, body: String, delaySeconds: Int)
  final case class SqsBatchResult(successful: Seq[String], failed: Seq[String])

  /** Queue client contract; production impl wraps the AWS SDK, tests use
    * [[InMemorySqsClient]] (zero-egress environment — SURVEY.md §7 risk 6). */
  trait SqsClient extends Serializable {
    def sendBatch(entries: Seq[SqsEntry]): SqsBatchResult
  }

  /** In-memory fakes route state through a JVM-static store keyed by
    * instance id: task closures are serialized even in local mode, so a
    * plain field would be mutated on a deserialized COPY and the test/driver
    * instance would never see the writes. */
  object LocalStore {
    val sqs = mutable.Map[String, mutable.Buffer[Seq[SqsEntry]]]()
    val tables = mutable.Map[String, mutable.Map[Seq[Any], Map[String, Any]]]()
    val indexes = mutable.Map[String, mutable.Map[String, PutVector]]()
  }

  final class InMemorySqsClient(failIds: Set[String] = Set.empty) extends SqsClient {
    private val id = java.util.UUID.randomUUID().toString
    LocalStore.sqs.synchronized { LocalStore.sqs(id) = mutable.Buffer() }
    def sent: Seq[Seq[SqsEntry]] = LocalStore.sqs.synchronized { LocalStore.sqs(id).toSeq }
    def sendBatch(entries: Seq[SqsEntry]): SqsBatchResult = LocalStore.sqs.synchronized {
      LocalStore.sqs(id) += entries
      val (bad, good) = entries.partition(e => failIds.contains(e.id))
      SqsBatchResult(good.map(_.id), bad.map(_.id))
    }
  }

  /** SQS sink (Q1): records are PACKED into multi-record JSON-array message
    * bodies first (AbstractJSONConverter.java:93-183 — roll when the sum of
    * individual record sizes would cross `maxMessageSize` or the record
    * count would cross `maxRecordsPerMessage`; message id =
    * `firstSeq-lastSeq`, final message of a shard `firstSeq-lastSeq-now`),
    * then sent in SendMessageBatch chunks of ≤`maxBatch`=10
    * (SQSTargetMapper.java:90-101); all-failed → AllItemsFailure,
    * some-failed → PartialFailure (:119-150).
    *
    * Scale shape: one shuffle on the shard key, spillable
    * sortWithinPartitions, then a constant-memory iterator pack-and-send
    * from the executors — a message buffer never exceeds `maxMessageSize`
    * and a send buffer never exceeds `maxBatch` entries, regardless of
    * shard size. `shard` defaults to a single logical shard (the reference
    * processes one shard per processRecords call); pass a shard column for
    * multi-shard parallel packing. */
  def sqsSink(client: SqsClient, delaySeconds: Int = 0, maxBatch: Int = 10,
      maxMessageSize: Long = 256 * 1024, maxRecordsPerMessage: Int = -1,
      shard: Option[Column] = None,
      clock: () => Long = () => System.currentTimeMillis()): BatchSink = (batch, _) => {
    val rows = batch.select(
      shard.getOrElse(lit("0")).cast("string").as("__shard"),
      metaCol(batch).getField("stream_sequence_number").cast("string").as("__seq"),
      to_json(struct(payloadColumns(batch): _*)).as("__body"))
    rows.repartition(col("__shard"))
      .sortWithinPartitions("__shard", "__seq")
      .foreachPartition { (it: Iterator[Row]) =>
        val chunk = mutable.Buffer[SqsEntry]()
        def sendChunk(): Unit = if (chunk.nonEmpty) {
          val res = client.sendBatch(chunk.toVector)
          if (res.failed.nonEmpty) {
            if (res.successful.isEmpty) throw new AllItemsFailureException(chunk.size)
            else throw new PartialFailureException(res.failed.size, chunk.size)
          }
          chunk.clear()
        }
        val packer = new Packing.GreedyPacker(maxMessageSize, maxRecordsPerMessage,
          clock, (id, bodies, _) => {
            chunk += SqsEntry(id, bodies.mkString("[", ",", "]"), delaySeconds)
            if (chunk.size >= maxBatch) sendChunk()
          })
        var curShard: String = null
        it.foreach { r =>
          val sh = r.getString(0)
          // shard boundary = end of that shard's record run: close its final
          // message and flush the send buffer (the reference sends per shard)
          if (sh != curShard) { packer.close(isFinal = true); sendChunk(); curShard = sh }
          packer.add(r.getString(1), r.getString(2))
        }
        packer.close(isFinal = true)
        sendChunk()
      }
  }

  /** JSON object-file sink with the reference's S3 key scheme
    * (S3TargetMapper.java:119-176): each packed message becomes ONE object
    * `baseDir/<time-partition>/<firstSeq-lastSeq[-now]>-<epochMillis>.json`
    * whose body is the JSON array of records — byte-level output parity with
    * the hand-rolled putObject path, as an opt-in alternative to [[fileSink]]
    * (whose Spark commit protocol gives exactly-once at the cost of Spark
    * file naming). Same executor-side constant-memory packing as [[sqsSink]];
    * time partitions default to event time (Cdc.timePartitionColumns doc). */
  def jsonObjectSink(baseDir: String, granularity: String = "hours",
      maxMessageSize: Long = 256 * 1024, maxRecordsPerMessage: Int = -1,
      shard: Option[Column] = None,
      clock: () => Long = () => System.currentTimeMillis()): BatchSink = (batch, _) => {
    val meta = metaCol(batch)
    val rows = batch.select(
      shard.getOrElse(lit("0")).cast("string").as("__shard"),
      meta.getField("stream_sequence_number").cast("string").as("__seq"),
      graft.cdc.Cdc.timePartitionPath(
        timestamp_millis(meta.getField("stream_arrival_timestamp")), granularity)
        .as("__path"),
      to_json(struct(payloadColumns(batch): _*)).as("__body"))
    rows.repartition(col("__shard"))
      .sortWithinPartitions("__shard", "__path", "__seq")
      .foreachPartition { (it: Iterator[Row]) =>
        val conf = new org.apache.hadoop.conf.Configuration()
        var curPath: String = null
        var packer: Packing.GreedyPacker = null
        def boundary(path: String): Unit = {
          if (packer != null) packer.close(isFinal = true)
          curPath = path
          packer = new Packing.GreedyPacker(maxMessageSize, maxRecordsPerMessage,
            clock, (id, bodies, _) => {
              // NOTE: no fs.setWriteChecksum here — FileSystem instances are
              // JVM-cached per scheme, so flipping checksums would leak into
              // every other writer in the process
              val dir = new org.apache.hadoop.fs.Path(baseDir, curPath)
              val fs = dir.getFileSystem(conf)
              fs.mkdirs(dir)
              val f = new org.apache.hadoop.fs.Path(dir, s"$id-${clock()}.json")
              val out = fs.create(f, true)
              try out.write(bodies.mkString("[", ",", "]")
                .getBytes(java.nio.charset.StandardCharsets.UTF_8))
              finally out.close()
            })
        }
        var curShard: String = null
        it.foreach { r =>
          val (sh, path) = (r.getString(0), r.getString(2))
          // new shard OR new time partition closes the open message — a
          // message never spans shards or partition prefixes
          if (sh != curShard || path != curPath) { boundary(path); curShard = sh }
          packer.add(r.getString(1), r.getString(3))
        }
        if (packer != null) packer.close(isFinal = true)
      }
  }

  // ------------------------------------------------------------------ MV
  /** Keyed table client for the materialized-view sink; tests use
    * [[InMemoryKeyedTable]], production wraps a CQL session. */
  trait KeyedTable extends Serializable {
    def upsert(key: Seq[Any], row: Map[String, Any]): Unit
    def delete(key: Seq[Any]): Unit
  }

  final class InMemoryKeyedTable extends KeyedTable {
    private val id = java.util.UUID.randomUUID().toString
    LocalStore.tables.synchronized { LocalStore.tables(id) = mutable.Map() }
    def data: Map[Seq[Any], Map[String, Any]] =
      LocalStore.tables.synchronized { LocalStore.tables(id).toMap }
    def upsert(key: Seq[Any], row: Map[String, Any]): Unit =
      LocalStore.tables.synchronized { LocalStore.tables(id)(key) = row }
    def delete(key: Seq[Any]): Unit =
      LocalStore.tables.synchronized { LocalStore.tables(id).remove(key) }
  }

  private val DeleteOps = Set("DELETE", "REPLICATED_DELETE", "TTL")
  private val UpsertOps = Set("INSERT", "UPDATE", "REPLICATED_INSERT", "REPLICATED_UPDATE")

  /** Materialized-view sink (K1, KeyspacesViewTargetMapper.java:81-154):
    * upsert from newImage on INSERT/UPDATE, delete by PK from oldImage on
    * DELETE/TTL. Correctness under parallelism (SURVEY.md §7.4 risk 3): the
    * batch is first reduced to the LATEST change per key by sequence number
    * — the reference relies on per-shard sequential apply, which Spark's
    * parallel tasks would otherwise violate. One shuffle on the key, then
    * partition-local writes. */
  /** Fan one micro-batch out to several sinks from a single source read.
    * The batch is persisted so each sink reads the materialized rows
    * instead of re-running the source/filter/projection plan N times —
    * the multi-target deployment shape (`connector.sink = "a,b,c"`). */
  def fanout(sinks: Seq[BatchSink]): BatchSink = (batch, id) => {
    batch.persist()
    try sinks.foreach(s => s(batch, id))
    finally batch.unpersist()
  }

  def mvSink(table: KeyedTable, keyFields: Seq[String],
      valueFields: Seq[String]): BatchSink = {
    // fail at registration, not first batch: with no key fields every upsert
    // would collapse onto the single key Seq() and the view would silently
    // retain one row
    require(keyFields.nonEmpty,
      "mv sink requires partition-keys and/or clustering-keys in config")
    mvApply(table, keyFields, valueFields)
  }

  private def mvApply(table: KeyedTable, keyFields: Seq[String],
      valueFields: Seq[String]): BatchSink = (batch, _) => {
    val keyCols = keyFields.map(f =>
      coalesce(col(s"image.$f"), col(s"oldImage.$f")).as(s"k_$f"))
    val meta = metaCol(batch)
    val w = Window.partitionBy(keyFields.map(f => col(s"k_$f")): _*)
      .orderBy(meta.getField("stream_sequence_number").desc)
    val latest = batch
      .select((col("*") +: keyCols): _*)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(
        (keyFields.map(f => col(s"k_$f")) :+
          meta.getField("stream_operation_type").as("__op")) ++
          valueFields.map(f => col(s"image.$f").as(s"v_$f")): _*)
    latest.foreachPartition { (rows: Iterator[Row]) =>
      rows.foreach { r =>
        val key = keyFields.indices.map(i => r.get(i))
        val op = r.getString(keyFields.size)
        if (DeleteOps.contains(op)) table.delete(key)
        else if (UpsertOps.contains(op))
          table.upsert(key, valueFields.zipWithIndex
            .map { case (f, i) => f -> r.get(keyFields.size + 1 + i) }.toMap)
        else throw new IllegalArgumentException(s"unsupported operation $op")
      }
    }
  }

  // ------------------------------------------------------------------ Vector
  /** Embedding provider (V1): production wraps a model endpoint with
    * [[Retry]]; tests use [[HashEmbedder]] — deterministic, offline. */
  trait Embedder extends Serializable {
    def embed(text: String, dims: Int): Array[Float]
  }

  object HashEmbedder extends Embedder {
    def embed(text: String, dims: Int): Array[Float] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(dims) { i =>
        val h = md.digest(s"$i:$text".getBytes("UTF-8"))
        ((h(0) & 0xFF) - 128) / 128.0f
      }
    }
  }

  final case class PutVector(key: String, data: Array[Float], metadata: Map[String, Any])

  trait VectorIndex extends Serializable {
    def putVectors(vectors: Seq[PutVector]): Unit
  }

  final class InMemoryVectorIndex extends VectorIndex {
    private val id = java.util.UUID.randomUUID().toString
    LocalStore.indexes.synchronized { LocalStore.indexes(id) = mutable.Map() }
    def vectors: Map[String, PutVector] =
      LocalStore.indexes.synchronized { LocalStore.indexes(id).toMap }
    def putVectors(vs: Seq[PutVector]): Unit = LocalStore.indexes.synchronized {
      vs.foreach(v => LocalStore.indexes(id)(v.key) = v)
    }
  }

  /** Vector sink (V1+V2, S3VectorTargetMapper.java:81-181): embeds the
    * configured text field of the NEW image (empty → fall back to the key
    * field's text; both empty → error, :100-118), attaches scalar metadata,
    * puts per partition. The embedder is a per-executor lazy singleton in
    * production (VectorHelper.java:47-54 parity). */
  def vectorSink(index: VectorIndex, embedder: Embedder, keyField: String,
      embeddingField: String, dims: Int,
      metadataFields: Seq[String]): BatchSink = (batch, _) => {
    val projected = batch
      .filter(col("image").isNotNull)
      .select(
        (col(s"image.$keyField").cast("string").as("__key") +:
          col(s"image.$embeddingField").cast("string").as("__text") +:
          metadataFields.map(f => col(s"image.$f").as(s"m_$f"))): _*)
    projected.foreachPartition { (rows: Iterator[Row]) =>
      val puts = rows.map { r =>
        val key = r.getString(0)
        val text = Option(r.getString(1)).filter(_.nonEmpty)
          .orElse(Option(key).filter(_.nonEmpty))
          .getOrElse(throw new IllegalArgumentException(
            s"both embedding field '$embeddingField' and key field '$keyField' are empty"))
        PutVector(key, embedder.embed(text, dims),
          metadataFields.zipWithIndex.map { case (f, i) => f -> r.get(2 + i) }
            .filter(_._2 != null).toMap)
      }.toSeq
      if (puts.nonEmpty) index.putVectors(puts)
    }
  }

  // ------------------------------------------------------------------ Retry
  /** Exponential backoff with jitter — reference parity: base 1000 ms, ×2,
    * cap 10000 ms, ±10% jitter, default 3 retries (VectorHelper.java:27-31,
    * :61-74). Sink-layer retries are finer than Spark's whole-task retry. */
  object Retry {
    def apply[T](maxRetries: Int = 3, baseDelayMs: Long = 1000,
        maxDelayMs: Long = 10000, multiplier: Double = 2.0,
        jitter: Double = 0.1, sleep: Long => Unit = Thread.sleep,
        rng: Random = new Random())(
        isRetryable: Throwable => Boolean)(body: => T): T = {
      var attempt = 0
      while (true) {
        try return body
        catch {
          case t: Throwable if attempt < maxRetries && isRetryable(t) =>
            val exp = math.min(maxDelayMs,
              (baseDelayMs * math.pow(multiplier, attempt)).toLong)
            val jittered = (exp * (1.0 + (rng.nextDouble() * 2 - 1) * jitter)).toLong
            sleep(math.max(0L, jittered))
            attempt += 1
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }
}
