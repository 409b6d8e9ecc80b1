package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.{Map => JMap}

import scala.collection.JavaConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.NullNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Recorded-shard-log CDC source (S1) — a real DataSource V2
  * `MicroBatchStream` with the semantics of the reference's KCL consumption
  * (KCLScheduler.java:101-168):
  *
  *   - one append-only log file per shard (`<shard>.jsonl`, one JSON change
  *     record per line, written in sequence-number order — the per-shard
  *     total order Kinesis guarantees and KCL preserves);
  *   - `TRIM_HORIZON` start semantics: the initial offset is position 0 of
  *     every shard (KCLScheduler.java:162-168);
  *   - per-shard checkpointed offsets: a streaming offset is the map
  *     shard → records-consumed, persisted by Spark's offset log exactly as
  *     KCL checkpoints per-shard sequence positions to its DynamoDB lease
  *     table — kill the query and restart with the same checkpoint dir and
  *     it resumes MID-SHARD with no re-reads and no gaps;
  *   - shard discovery between batches: new `.jsonl` files join the stream
  *     at position 0 (KCL shard-sync);
  *   - optional admission control (`maxRecordsPerBatch`) standing in for the
  *     KCL polling/throughput knobs (KeyspacesConfig.java:393-403).
  *
  * A live Kinesis-backed source is this class with `listShards`/`getRecords`
  * in place of the directory listing and line reads (zero-egress here); the
  * rest — offsets, restart, planInputPartitions — is identical, which is the
  * swap-in point SURVEY §2.1 promises. Each micro-batch plans ONE partition
  * per shard with nonempty news, so executor parallelism = shard count,
  * exactly the reference's per-shard consumer threads.
  *
  * Wire format per line (string-typed cell values arrive inside the image
  * JSON — parsed downstream by [[ShardLog.envelope]], P6 cast parity):
  * {{{
  * {"sequenceNumber":"…","arrivalTimestamp":1700000000000,
  *  "origin":"USER","image":{…},"oldImage":{…}}
  * }}}
  */
object ShardLog {

  val schema: StructType = StructType(Seq(
    StructField("shard", StringType, nullable = false),
    StructField("sequenceNumber", StringType, nullable = false),
    StructField("arrivalTimestamp", LongType),
    StructField("origin", StringType),
    StructField("image", StringType), // raw JSON object, null when absent
    StructField("oldImage", StringType)))

  /** List `<shard>.jsonl` files under `dir` with their record counts —
    * the source's `listShards` + latest-sequence probe. */
  def shardCounts(dir: String): Map[String, Long] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    if (!fs.exists(p)) Map.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".jsonl"))
      .map { s =>
        val name = s.getPath.getName.stripSuffix(".jsonl")
        val in = new BufferedReader(new InputStreamReader(
          fs.open(s.getPath), StandardCharsets.UTF_8))
        try {
          var n = 0L
          while (in.readLine() != null) n += 1
          name -> n
        } finally in.close()
      }.toMap
  }

  /** Raw source rows → the CDC envelope (origin/metadata/image/oldImage),
    * deriving the operation type from (origin, image nullity) exactly like
    * StreamHelpers.getOperationType — the recorded log carries no derived
    * fields, matching the wire. */
  def envelope(raw: org.apache.spark.sql.DataFrame, keyspace: String,
      table: String, imageSchema: StructType): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val img = from_json(col("image"), imageSchema)
    val old = from_json(col("oldImage"), imageSchema)
    raw.select(
      col("origin"),
      graft.cdc.Cdc.metadataStruct(keyspace, table, col("origin"), old, img,
        col("arrivalTimestamp"), col("sequenceNumber")).as("metadata"),
      img.as("image"),
      old.as("oldImage"))
  }

  /** Record an envelope-shaped DataFrame into a shard log directory — the
    * test/replay harness's "stream recorder" (the inverse of the source; a
    * live deployment records from Kinesis instead). Appends, preserving
    * sequence order per shard. Driver-side by design: recording fixtures is
    * a tooling path, not a scale path. */
  def record(env: org.apache.spark.sql.DataFrame, dir: String,
      shard: org.apache.spark.sql.Column): Unit = {
    import org.apache.spark.sql.functions._
    val rows = env.select(
        shard.cast("string").as("shard"),
        col("metadata.stream_sequence_number").as("seq"),
        to_json(struct(
          col("metadata.stream_sequence_number").as("sequenceNumber"),
          col("metadata.stream_arrival_timestamp").as("arrivalTimestamp"),
          col("origin"), col("image"), col("oldImage"))).as("line"))
      .orderBy("shard", "seq")
      .collect()
    val base = new Path(dir)
    val fs = base.getFileSystem(new Configuration())
    fs.mkdirs(base)
    rows.groupBy(_.getString(0)).foreach { case (sh, rs) =>
      val f = new Path(base, s"$sh.jsonl")
      // read-then-rewrite append: the local ChecksumFileSystem does not
      // support FileSystem.append, and a recorder tool's files are small.
      // The merged file is re-sorted by sequence number so recording order
      // never breaks the per-shard total order the source contract promises
      // (a backfill recorded after newer data would otherwise interleave).
      val existing = if (fs.exists(f)) {
        val in = new BufferedReader(new InputStreamReader(fs.open(f), StandardCharsets.UTF_8))
        try Iterator.continually(in.readLine()).takeWhile(_ != null).toVector
        finally in.close()
      } else Vector.empty
      val mapper = new ObjectMapper()
      def seqOf(line: String): String = mapper.readTree(line).get("sequenceNumber").asText()
      // dedupe by sequence number (first occurrence wins) so re-running the
      // recorder over the same events is idempotent instead of silently
      // doubling every record in the log
      val merged = (existing ++ rs.map(_.getString(2)))
        .groupBy(seqOf).toSeq.sortBy(_._1).map(_._2.head)
      val out = fs.create(f, true)
      try merged.foreach { line =>
        out.write((line + "\n").getBytes(StandardCharsets.UTF_8))
      } finally out.close()
    }
  }
}

/** `spark.readStream.format("shardlog").option("path", dir)` (also batch
  * `spark.read` for full-log backfills — TRIM_HORIZON replay as a batch
  * job). `option("client", key)` swaps the recorded-log client for a
  * registered [[StreamClient]] (the live-Kinesis seam; tests register
  * [[InMemoryStreamClient]] fakes). Registered via META-INF/services as
  * `shardlog`. */
class ShardLogProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "shardlog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = ShardLog.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val factory: StreamClientFactory =
      Option(opts.get("path")).map(d => FileShardLogClientFactory(d): StreamClientFactory)
        .orElse(Option(opts.get("client")).map(RegisteredClientFactory(_)))
        .getOrElse(throw new IllegalArgumentException(
          "shardlog source requires option 'path' or 'client'"))
    new ShardLogTable(factory)
  }
}

class ShardLogTable(factory: StreamClientFactory) extends Table with SupportsRead {
  def this(dir: String) = this(FileShardLogClientFactory(dir))
  override def name(): String = s"shardlog($factory)"
  override def schema(): StructType = ShardLog.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val maxRecordsPerBatch = Option(options.get("maxRecordsPerBatch")).map(_.toLong)
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = ShardLog.schema
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            factory.open().shardEnds().toSeq.sortBy(_._1).collect {
              case (sh, n) if n > 0 =>
                ShardLogPartition(factory, sh, 0L, n): InputPartition
            }.toArray
          override def createReaderFactory(): PartitionReaderFactory =
            new ShardLogReaderFactory()
        }
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new ShardLogMicroBatchStream(factory, maxRecordsPerBatch)
      }
    }
  }
}

/** Offset = per-shard consumed-record counts; JSON with sorted keys so
  * offset equality (and therefore "no new data") is deterministic. */
case class ShardLogOffset(counts: Map[String, Long]) extends Offset {
  override def json(): String = {
    val m = new java.util.TreeMap[String, Long]()
    counts.foreach { case (k, v) => m.put(k, v) }
    new ObjectMapper().writeValueAsString(m)
  }
}

object ShardLogOffset {
  def parse(json: String): ShardLogOffset = {
    val node = new ObjectMapper().readTree(json)
    ShardLogOffset(node.fields().asScala
      .map(e => e.getKey -> e.getValue.asLong()).toMap)
  }
}

class ShardLogMicroBatchStream(factory: StreamClientFactory,
    maxRecordsPerBatch: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  def this(dir: String, maxRecordsPerBatch: Option[Long]) =
    this(FileShardLogClientFactory(dir), maxRecordsPerBatch)

  private lazy val client: StreamClient = factory.open()

  private def ends(): Map[String, Long] = client.shardEnds()

  // Trigger.AvailableNow: snapshot the log's end positions once, then drain
  // up to exactly that point in (possibly rate-limited) batches — late
  // appends wait for the next run, matching the trigger contract.
  @volatile private var availableNowTarget: Option[Map[String, Long]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(ends())

  override def getDefaultReadLimit: ReadLimit =
    maxRecordsPerBatch.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def initialOffset(): Offset = ShardLogOffset(Map.empty) // TRIM_HORIZON

  override def deserializeOffset(json: String): Offset = ShardLogOffset.parse(json)

  override def latestOffset(): Offset =
    latestOffset(ShardLogOffset(Map.empty), ReadLimit.allAvailable())

  private def maxRowsOf(limit: ReadLimit): Option[Long] = limit match {
    case r: ReadMaxRows => Some(r.maxRows())
    case c: CompositeReadLimit =>
      c.getReadLimits.flatMap(maxRowsOf).reduceOption(_ min _)
    case _: ReadAllAvailable => None
    case _ => None
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[ShardLogOffset].counts
    // ONE client snapshot per planning call serves lineage, the drain
    // target and the parent gating (the recorded log pays one dir pass)
    val (shardList, endsNow) = client.shardSnapshot()
    val shardInfo = shardList.map(s => s.shardId -> s).toMap
    val target = availableNowTarget.getOrElse(endsNow)
    // KCL SPLIT/MERGE SEQUENCING (ShardSyncer's parents-first rule): a
    // child shard starts consuming only after EVERY parent is closed and
    // fully drained as of this batch's START offsets — per-key order
    // spans the split boundary exactly like the reference's consumer.
    // A parent absent from the listing (expired past retention) counts
    // as drained: its data is gone regardless. (A closed parent's end is
    // frozen, so the current snapshot is exact for gating even when the
    // AvailableNow target is an older pin.)
    def parentsDrained(sh: String): Boolean =
      shardInfo.get(sh).map(_.parentShardIds).getOrElse(Nil).forall { p =>
        shardInfo.get(p).forall(info =>
          info.closed && from.getOrElse(p, 0L) >= endsNow.getOrElse(p, 0L))
      }
    var budget = maxRowsOf(limit).getOrElse(Long.MaxValue)
    // deterministic per-shard budget allocation in shard order — parallelism
    // is per batch (one partition per advanced shard), throughput is capped
    // across shards like the KCL polling limits cap the whole worker
    val next = target.toSeq.sortBy(_._1).map { case (sh, end) =>
      val cur = from.getOrElse(sh, 0L)
      val cap = if (parentsDrained(sh)) end else cur // gated child: no advance
      // clamp BEFORE spending budget: a shrunken file (end < cur) must not
      // refund rows to other shards' admission budget
      val advance = math.max(0L, math.min(cap - cur, budget))
      budget -= advance
      sh -> (cur + advance)
    }.toMap
    // keep already-consumed shards (e.g. file deleted between runs) and add
    // only shards that actually advanced — a caught-up call must return an
    // offset EQUAL to start so the engine sees "no new data"
    ShardLogOffset(from ++ next.filter { case (sh, n) => n > from.getOrElse(sh, 0L) })
  }

  override def reportLatestOffset(): Offset = ShardLogOffset(ends())

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ShardLogOffset].counts
    val e = end.asInstanceOf[ShardLogOffset].counts
    e.toSeq.sortBy(_._1).collect {
      case (sh, to) if to > s.getOrElse(sh, 0L) =>
        ShardLogPartition(factory, sh, s.getOrElse(sh, 0L), to): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new ShardLogReaderFactory()

  override def commit(end: Offset): Unit = () // offset log is the checkpoint
  override def stop(): Unit = ()
}

/** One shard's [from, to) record range — the unit of executor parallelism.
  * Carries the client RECIPE, never a connection; the reader opens its own
  * client on the executor. */
case class ShardLogPartition(factory: StreamClientFactory, shard: String,
    from: Long, to: Long) extends InputPartition

class ShardLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ShardLogPartition]
    new PartitionReader[InternalRow] {
      private val it = p.factory.open().read(p.shard, p.from, p.to)
      private var row: InternalRow = _
      private def utf8(s: String): UTF8String =
        if (s == null) null else UTF8String.fromString(s)

      override def next(): Boolean = {
        if (!it.hasNext) return false
        val r = it.next()
        row = new GenericInternalRow(Array[Any](
          UTF8String.fromString(p.shard),
          utf8(r.sequenceNumber),
          r.arrivalTimestamp match {
            case null => null
            case l => l.longValue()
          },
          utf8(r.origin),
          utf8(r.image),
          utf8(r.oldImage)))
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = it.close() // LIMIT stops before exhaustion
    }
  }
}
