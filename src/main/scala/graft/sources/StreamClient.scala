package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.NullNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** The GETRECORDS-SHAPED CLIENT SEAM of the S1 source — the concrete
  * swap-in surface a live Kinesis deployment implements with the AWS SDK
  * (the reference consumes through KCL, KCLScheduler.java:101-168; the
  * data-plane shapes below mirror the public Kinesis API the KCL itself
  * calls: ListShards with parent lineage, a latest-position probe, and
  * paginated GetRecords). [[ShardLogMicroBatchStream]] plans offsets
  * against this trait only, so swapping the recorded-log client for a live
  * one changes NO streaming logic — offsets, restart, admission control
  * and split/merge sequencing are already the stream's, not the client's.
  */
trait StreamClient {

  /** All shards with their parent lineage (ListShards): a child created by
    * a split/merge carries its parents' ids, and a `closed` shard will
    * never grow again. */
  def listShards(): Seq[ShardInfo]

  /** Records currently available in the shard (latest-sequence probe). */
  def shardEnd(shard: String): Long

  /** End positions of EVERY shard in one call — the per-batch snapshot
    * the planner takes. Default composes the per-shard probe; clients
    * with a cheaper bulk form (the recorded log counts every file in one
    * directory pass) override, or each micro-batch pays
    * O(shards x probe). */
  def shardEnds(): Map[String, Long] =
    listShards().map(s => s.shardId -> shardEnd(s.shardId)).toMap

  /** Lineage AND end positions in one call — what [[latestOffset]] needs
    * per micro-batch. Clients whose listing and end probe share one
    * underlying pass (the recorded log) override to pay it once. */
  def shardSnapshot(): (Seq[ShardInfo], Map[String, Long]) =
    (listShards(), shardEnds())

  /** One GetRecords page: up to `limit` records of `shard` starting at
    * 0-based position `from`. A client may return FEWER than `limit`
    * (Kinesis pages are size/byte-bounded) — callers must paginate. */
  def getRecords(shard: String, from: Long, limit: Int): GetRecordsResult

  /** Drain `[from, to)` of one shard — the partition-reader loop. The
    * default paginates through [[getRecords]] exactly like a live consumer
    * (no held resource — close is a no-op); clients with a cheaper
    * sequential form (the recorded log holds an open file) override and
    * MUST release their resource in `close()`: Spark closes the partition
    * reader without exhausting it when a LIMIT is satisfied early. */
  def read(shard: String, from: Long, to: Long): RecordIterator = {
    val end = to // `to` would be shadowed by Iterator.to inside the class
    new RecordIterator {
      private var pos = from
      private var page: Iterator[StreamRecord] = Iterator.empty
      override def hasNext: Boolean = {
        while (!page.hasNext && pos < end) {
          val r = getRecords(shard, pos, math.min(end - pos, 1000L).toInt)
          // An EMPTY page is not end-of-shard: the live GetRecords API
          // routinely returns zero records mid-stream with an ADVANCED
          // position (sparse pages, throttling). Treating it as the end
          // would silently drop the remainder of an already-committed
          // [from, to) range — keep paging while the position advances;
          // only a STUCK position means the shard really shrank below the
          // planned end (stop at reality rather than spin forever).
          if (r.nextPosition <= pos) return page.hasNext
          page = r.records.iterator
          pos = r.nextPosition
        }
        page.hasNext
      }
      override def next(): StreamRecord = page.next()
      override def close(): Unit = ()
    }
  }
}

/** A record iterator that may own a resource (open log file, network
  * connection); consumers close it on early termination. */
trait RecordIterator extends Iterator[StreamRecord] with java.io.Closeable

/** Shard descriptor: `parentShardIds` convey split/merge lineage (a split
  * parent has two children; a merge child has two parents), `closed` means
  * no record will ever be appended again — together they let the planner
  * enforce KCL's parents-before-children consumption order. */
final case class ShardInfo(shardId: String,
    parentShardIds: Seq[String] = Nil, closed: Boolean = false)

/** One wire record (nullable fields null, matching the jsonl encoding). */
final case class StreamRecord(sequenceNumber: String,
    arrivalTimestamp: java.lang.Long, origin: String,
    image: String, oldImage: String)

final case class GetRecordsResult(records: Seq[StreamRecord], nextPosition: Long)

/** Serializable recipe for (re)opening a client on an executor — the
  * partition carries this, never a live connection. */
trait StreamClientFactory extends Serializable { def open(): StreamClient }

final case class FileShardLogClientFactory(dir: String) extends StreamClientFactory {
  override def open(): StreamClient = new FileShardLogClient(dir)
}

/** Test/fake clients live in a JVM-local registry (local-mode executors
  * share the JVM); a live SDK-backed factory would instead carry region +
  * stream name and build its connection in `open()`. */
final case class RegisteredClientFactory(key: String) extends StreamClientFactory {
  override def open(): StreamClient = {
    val c = InMemoryStreamClient.registry.get(key)
    require(c != null, s"no stream client registered under '$key'")
    c
  }
}

/** The recorded-shard-log client: one `<shard>.jsonl` file per shard (flat
  * lineage — a recorder writes post-split streams as already-separate
  * logs). `read` streams the file once; `getRecords` serves the paged wire
  * shape for parity with remote clients. */
class FileShardLogClient(dir: String) extends StreamClient {
  private def parse(mapper: ObjectMapper, line: String): StreamRecord = {
    val node = mapper.readTree(line)
    def str(f: String): String = node.get(f) match {
      case null | _: NullNode => null
      case n if n.isTextual => n.asText()
      case n => n.toString // raw JSON for images
    }
    StreamRecord(str("sequenceNumber"),
      node.get("arrivalTimestamp") match {
        case null | _: NullNode => null
        case n => java.lang.Long.valueOf(n.asLong())
      },
      str("origin"), str("image"), str("oldImage"))
  }

  override def listShards(): Seq[ShardInfo] =
    ShardLog.shardCounts(dir).keys.toSeq.sorted.map(ShardInfo(_))

  override def shardEnd(shard: String): Long =
    ShardLog.shardCounts(dir).getOrElse(shard, 0L)

  override def shardEnds(): Map[String, Long] = ShardLog.shardCounts(dir)

  override def shardSnapshot(): (Seq[ShardInfo], Map[String, Long]) = {
    val counts = ShardLog.shardCounts(dir) // ONE directory pass for both
    (counts.keys.toSeq.sorted.map(ShardInfo(_)), counts)
  }

  override def getRecords(shard: String, from: Long, limit: Int): GetRecordsResult = {
    val recs = read(shard, from, from + limit).toVector
    GetRecordsResult(recs, from + recs.size)
  }

  override def read(shard: String, from: Long, to: Long): RecordIterator = {
    val path = new Path(dir, s"$shard.jsonl")
    val fs = path.getFileSystem(new Configuration())
    if (!fs.exists(path))
      return new RecordIterator {
        override def hasNext: Boolean = false
        override def next(): StreamRecord = Iterator.empty.next()
        override def close(): Unit = ()
      }
    val in = new BufferedReader(new InputStreamReader(
      fs.open(path), StandardCharsets.UTF_8))
    val mapper = new ObjectMapper()
    val end = to // `to` would be shadowed by Iterator.to inside the class
    var pos = 0L
    while (pos < from && in.readLine() != null) pos += 1
    new RecordIterator {
      private var line: String = if (pos < end) in.readLine() else null
      override def hasNext: Boolean = {
        val h = line != null && pos < end
        if (!h) in.close()
        h
      }
      override def next(): StreamRecord = {
        val r = parse(mapper, line)
        pos += 1
        line = if (pos < end) in.readLine() else null
        r
      }
      override def close(): Unit = in.close() // early termination (LIMIT)
    }
  }
}

/** In-memory paginating fake — drives the SAME `ShardLogMicroBatchStream`
  * offset/admission/sequencing logic the file client does, plus the
  * split/merge lineage a flat directory cannot express. `pageCap` bounds
  * every GetRecords page below the caller's limit, so consumers that fail
  * to paginate lose data loudly in tests. */
class InMemoryStreamClient(pageCap: Int = 3) extends StreamClient {
  private case class S(records: Vector[StreamRecord],
      parents: Seq[String], closed: Boolean)
  private val shards =
    new java.util.concurrent.ConcurrentHashMap[String, S]()

  def createShard(id: String, parents: Seq[String] = Nil): Unit =
    shards.put(id, S(Vector.empty, parents, closed = false))

  def append(id: String, recs: Seq[StreamRecord]): Unit =
    shards.compute(id, (_, s) => {
      require(s != null && !s.closed, s"append to missing/closed shard $id")
      s.copy(records = s.records ++ recs)
    })

  def close(id: String): Unit =
    shards.computeIfPresent(id, (_, s) => s.copy(closed = true))

  /** Kinesis SplitShard: the parent closes, two children open with the
    * parent in their lineage. */
  def splitShard(parent: String, child1: String, child2: String): Unit = {
    close(parent)
    createShard(child1, Seq(parent))
    createShard(child2, Seq(parent))
  }

  /** Kinesis MergeShards: both parents close, one child carries both. */
  def mergeShards(parent1: String, parent2: String, child: String): Unit = {
    close(parent1); close(parent2)
    createShard(child, Seq(parent1, parent2))
  }

  override def listShards(): Seq[ShardInfo] = {
    import scala.collection.JavaConverters._
    shards.asScala.toSeq.sortBy(_._1)
      .map { case (id, s) => ShardInfo(id, s.parents, s.closed) }
  }

  override def shardEnd(shard: String): Long =
    Option(shards.get(shard)).map(_.records.size.toLong).getOrElse(0L)

  override def getRecords(shard: String, from: Long, limit: Int): GetRecordsResult = {
    val recs = Option(shards.get(shard)).map(_.records).getOrElse(Vector.empty)
    val page = recs.slice(from.toInt, from.toInt + math.min(limit, pageCap))
    GetRecordsResult(page, from + page.size)
  }
}

object InMemoryStreamClient {
  val registry =
    new java.util.concurrent.ConcurrentHashMap[String, InMemoryStreamClient]()
  def register(key: String, c: InMemoryStreamClient): Unit = registry.put(key, c)
}
