package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.concurrent.Eventually.{eventually, interval, timeout}
import org.scalatest.time.{Seconds, Span}

import graft.SparkSpec
import graft.streaming.{TestCdc, TestImage, TestMeta}

/** S1 closure: the recorded-shard-log MicroBatchStream behaves like the
  * reference's KCL consumption — TRIM_HORIZON start, per-shard order,
  * checkpointed per-shard offsets, mid-shard restart with no duplicates. */
class ShardLogSourceSpec extends SparkSpec {
  import spark.implicits._

  private val imageSchema = StructType(Seq(
    StructField("title", StringType), StructField("vote_average", DoubleType),
    StructField("vote_count", IntegerType)))

  private def rec(seq: Int, op: String, img: TestImage, old: TestImage = null): TestCdc =
    TestCdc(if (op == "TTL") "TTL" else if (op.startsWith("REPLICATED")) "REPLICATION" else "USER",
      TestMeta("media", "movies", op, 1700000000000L + seq, f"$seq%020d"), img, old)

  /** n records across `shards` shards (shard = seq % shards). */
  private def writeLog(dir: String, seqs: Range, shards: Int): Unit =
    ShardLog.record(
      spark.createDataset(seqs.map(i =>
        rec(i, if (i % 3 == 0) "DELETE" else "INSERT",
          if (i % 3 == 0) null else TestImage(s"t$i", i / 10.0, i),
          if (i % 3 == 0) TestImage(s"t$i", i / 10.0, i) else null))).toDF(),
      dir, pmod(col("metadata.stream_sequence_number").cast("long"), lit(shards)))

  test("batch read: whole log, per-shard files, raw wire schema") {
    val dir = Files.createTempDirectory("shardlog-batch").toString
    writeLog(dir, 1 to 30, 3)
    val df = spark.read.format("shardlog").option("path", dir).load()
    assert(df.schema.fieldNames.toSeq ==
      Seq("shard", "sequenceNumber", "arrivalTimestamp", "origin", "image", "oldImage"))
    assert(df.count() == 30)
    assert(df.select("shard").distinct().count() == 3)
    // DELETE records carry only oldImage on the wire; INSERTs only image
    assert(df.filter(col("image").isNull && col("oldImage").isNull).count() == 0)
    assert(df.filter(col("image").isNotNull).count() == 20)
    // executor parallelism = shard count: one input partition per shard
    assert(df.rdd.getNumPartitions == 3)
  }

  test("envelope adapter derives op types and parses images from the wire") {
    val dir = Files.createTempDirectory("shardlog-env").toString
    writeLog(dir, 1 to 12, 2)
    val raw = spark.read.format("shardlog").option("path", dir).load()
    val env = ShardLog.envelope(raw, "media", "movies", imageSchema)
    assert(env.columns.toSeq == Seq("origin", "metadata", "image", "oldImage"))
    val ops = env.groupBy(col("metadata.stream_operation_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ops == Map("INSERT" -> 8L, "DELETE" -> 4L)) // 3,6,9,12 are deletes
    val r5 = env.filter(col("metadata.stream_sequence_number") === f"${5}%020d").head()
    assert(r5.getStruct(2).getAs[String]("title") == "t5")
    assert(r5.getStruct(2).getAs[Double]("vote_average") == 0.5)
    assert(r5.isNullAt(3)) // oldImage null on INSERT
  }

  test("availableNow with admission control drains in multiple rate-limited batches") {
    val dir = Files.createTempDirectory("shardlog-adm").toString
    val out = Files.createTempDirectory("shardlog-adm-out").toString
    writeLog(dir, 1 to 40, 4)
    val batchIds = scala.collection.mutable.Set[Long]()
    val q = spark.readStream.format("shardlog")
      .option("path", dir).option("maxRecordsPerBatch", "12").load()
      .writeStream
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batchIds.synchronized { batchIds += id }
        batch.write.mode("overwrite").parquet(s"$out/data/batch=$id")
      }.start()
    assert(q.awaitTermination(120000))
    assert(batchIds.size >= 4) // 40 records at <=12/batch
    val all = spark.read.option("basePath", s"$out/data").parquet(s"$out/data/batch=*")
    assert(all.count() == 40)
    assert(all.select("sequenceNumber").distinct().count() == 40) // no dups
    // per-shard order: records of one shard appear in (batch, file-order)
    // matching their sequence order
    val perShard = all.select("shard", "batch", "sequenceNumber")
      .orderBy("shard", "batch", "sequenceNumber").collect()
      .groupBy(_.getString(0)).values
    perShard.foreach { rs =>
      val seqs = rs.map(_.getString(2)).toSeq
      assert(seqs == seqs.sorted, s"out-of-order shard read: $seqs")
    }
  }

  test("in-memory GetRecords client: split/merge sequencing drains parents before children") {
    // lineage: p --split--> (ca, cb) --merge--> m ; every shard pre-filled,
    // so with a small admission budget the ONLY thing ordering consumption
    // is the planner's parents-before-children gate (the KCL ShardSyncer
    // rule the live-Kinesis swap-in must keep)
    val fake = new InMemoryStreamClient(pageCap = 3) // pages < partition size
    def recs(shard: String, n: Int, base: Int): Seq[StreamRecord] =
      (0 until n).map(i => StreamRecord(f"${base + i}%020d",
        java.lang.Long.valueOf(1700000000000L + base + i), "USER",
        s"""{"title":"$shard$i","vote_average":1.0,"vote_count":$i}""", null))
    fake.createShard("p")
    fake.append("p", recs("p", 6, 0))
    fake.splitShard("p", "ca", "cb")
    fake.append("ca", recs("ca", 3, 100))
    fake.append("cb", recs("cb", 3, 200))
    fake.mergeShards("ca", "cb", "m")
    fake.append("m", recs("m", 4, 300))
    fake.close("m")
    InMemoryStreamClient.register("split-merge-test", fake)

    val out = Files.createTempDirectory("shardlog-fake-out").toString
    val q = spark.readStream.format("shardlog")
      .option("client", "split-merge-test")
      .option("maxRecordsPerBatch", "4").load()
      .writeStream
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.write.mode("overwrite").parquet(s"$out/data/batch=$id")
      }.start()
    assert(q.awaitTermination(120000))

    val all = spark.read.option("basePath", s"$out/data")
      .parquet(s"$out/data/batch=*")
      .select("shard", "sequenceNumber", "batch")
      .as[(String, String, Long)].collect().toSeq
    // exactly-once, all 16 records, across paginated (pageCap=3) reads
    assert(all.size == 16 && all.map(_._2).distinct.size == 16,
      s"paginated fake must deliver every record exactly once: ${all.size}")
    // sequencing: max parent batch < min child batch, per generation
    def batchesOf(sh: String): Seq[Long] = all.filter(_._1 == sh).map(_._3)
    assert(batchesOf("p").max < (batchesOf("ca") ++ batchesOf("cb")).min,
      "children consumed before the split parent was drained")
    assert((batchesOf("ca") ++ batchesOf("cb")).max < batchesOf("m").min,
      "the merge child consumed before both parents were drained")
  }

  test("default read pages through EMPTY mid-stream GetRecords responses") {
    // The live GetRecords API returns zero-record pages with an ADVANCED
    // position mid-stream (sparse pages, throttling): the default read
    // loop must keep paging while the position moves, and only stop when
    // it sticks (the shard really shrank below the planned end). Treating
    // the first empty page as end-of-shard silently dropped the rest of a
    // committed [from, to) range — the round-11 advisory.
    val sparse = new StreamClient {
      override def listShards(): Seq[ShardInfo] = Seq(ShardInfo("s"))
      override def shardEnd(shard: String): Long = 10L
      override def getRecords(shard: String, from: Long, limit: Int): GetRecordsResult =
        if (from >= 10L) GetRecordsResult(Nil, from) // true end: position sticks
        else if (from % 2 == 0) GetRecordsResult(Nil, from + 1) // empty, advanced
        else GetRecordsResult(Seq(StreamRecord(f"$from%020d",
          java.lang.Long.valueOf(from), "USER", "{}", null)), from + 1)
    }
    val got = sparse.read("s", 0L, 10L).map(_.sequenceNumber).toVector
    assert(got == Seq(1L, 3L, 5L, 7L, 9L).map(i => f"$i%020d"),
      s"empty mid-stream pages must not truncate the range: $got")
    // a stuck position below the planned end terminates (no spin, no throw)
    val short = sparse.read("s", 0L, 20L).map(_.sequenceNumber).toVector
    assert(short.size == 5, s"shrunk shard must stop at reality: $short")
  }

  test("resharding MID-stream: children gated batch-by-batch until the parent drains") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val fake = new InMemoryStreamClient(pageCap = 2)
    def recs(n: Int, base: Int): Seq[StreamRecord] =
      (0 until n).map(i => StreamRecord(f"${base + i}%020d",
        java.lang.Long.valueOf(1700000000000L + base + i), "USER",
        s"""{"title":"x","vote_average":1.0,"vote_count":$i}""", null))
    fake.createShard("p")
    fake.append("p", recs(5, 0))
    InMemoryStreamClient.register("reshard-unit", fake)
    val stream = new ShardLogMicroBatchStream(
      RegisteredClientFactory("reshard-unit"), Some(3L))
    var off = stream.initialOffset().asInstanceOf[ShardLogOffset]
    def advance(): Map[String, Long] = {
      off = stream.latestOffset(off, ReadLimit.maxRows(3))
        .asInstanceOf[ShardLogOffset]
      off.counts
    }
    assert(advance() == Map("p" -> 3L)) // budgeted first batch
    // split WHILE p still has unread records: children must wait
    fake.splitShard("p", "c1", "c2")
    fake.append("c1", recs(2, 100)); fake.append("c2", recs(2, 200))
    assert(advance() == Map("p" -> 5L),
      "a batch planned while the parent is undrained must not touch children")
    assert(advance() == Map("p" -> 5L, "c1" -> 2L, "c2" -> 1L),
      "once the parent drained at batch start, children consume under the budget")
    assert(advance() == Map("p" -> 5L, "c1" -> 2L, "c2" -> 2L))
    // merge the drained children; the merge child consumes immediately
    fake.mergeShards("c1", "c2", "m")
    fake.append("m", recs(2, 300))
    assert(advance() == Map("p" -> 5L, "c1" -> 2L, "c2" -> 2L, "m" -> 2L))
    // caught up: the offset must be EQUAL so the engine sees no new data
    assert(advance() == off.counts)
  }

  test("kill mid-stream and restart: resumes mid-shard from checkpoint, no dups") {
    val dir = Files.createTempDirectory("shardlog-restart").toString
    val out = Files.createTempDirectory("shardlog-restart-out").toString
    writeLog(dir, 1 to 60, 2)

    def runQuery(trigger: Trigger) = spark.readStream.format("shardlog")
      .option("path", dir).option("maxRecordsPerBatch", "10").load()
      .writeStream
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // deterministic per-batch dir + overwrite = idempotent under replay;
        // the sleep paces batches so the kill reliably lands mid-stream
        batch.write.mode("overwrite").parquet(s"$out/data/batch=$id")
        Thread.sleep(300)
      }.start()

    // phase 1: slow continuous trigger, kill after the first couple batches
    val q1 = runQuery(Trigger.ProcessingTime("100 milliseconds"))
    eventually(timeout(Span(60, Seconds)), interval(Span(1, Seconds))) {
      assert(q1.recentProgress.map(_.numInputRows).sum >= 10)
    }
    q1.stop() // kill mid-stream — KCL worker crash equivalent
    val sofar = spark.read.option("basePath", s"$out/data").parquet(s"$out/data/batch=*")
    val n1 = sofar.count()
    assert(n1 > 0 && n1 < 60, s"kill landed at $n1 — expected mid-stream")
    // the checkpointed offset is mid-shard (some shard consumed but not done)
    val committed = sofar.groupBy("shard").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(committed.values.exists(c => c > 0 && c < 30),
      s"offsets not mid-shard: $committed")

    // phase 2: restart from the same checkpoint, drain to the end
    val q2 = runQuery(Trigger.AvailableNow())
    assert(q2.awaitTermination(120000))
    val all = spark.read.option("basePath", s"$out/data").parquet(s"$out/data/batch=*")
    assert(all.count() == 60, "records lost or duplicated across restart")
    assert(all.select("sequenceNumber").distinct().count() == 60)
  }

  test("admission budget is never refunded by a shrunken shard file") {
    val dir = Files.createTempDirectory("shardlog-shrink").toString
    writeLog(dir, 1 to 30, 2) // 15 records per shard
    val stream = new ShardLogMicroBatchStream(dir, None)
    // shard "0" checkpointed BEYOND its current file length (file shrank):
    // its negative advance must not grant shard "1" extra budget
    val start = ShardLogOffset(Map("0" -> 100L, "1" -> 0L))
    val end = stream.latestOffset(start,
      org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(10))
      .asInstanceOf[ShardLogOffset]
    assert(end.counts("0") == 100L) // offsets never move backward
    assert(end.counts("1") <= 10L, s"budget overrun: ${end.counts}")
  }

  test("late-appended records are picked up from the checkpointed offsets") {
    val dir = Files.createTempDirectory("shardlog-append").toString
    val out = Files.createTempDirectory("shardlog-append-out").toString
    writeLog(dir, 1 to 20, 2)
    def drain() = {
      val q = spark.readStream.format("shardlog").option("path", dir).load()
        .writeStream
        .option("checkpointLocation", s"$out/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, id: Long) =>
          batch.write.mode("overwrite").parquet(s"$out/data/batch=$id")
        }.start()
      assert(q.awaitTermination(120000))
    }
    drain()
    writeLog(dir, 21 to 35, 2) // append to the SAME shard files
    drain()
    val all = spark.read.option("basePath", s"$out/data").parquet(s"$out/data/batch=*")
    assert(all.count() == 35)
    assert(all.select("sequenceNumber").distinct().count() == 35)
  }
}
