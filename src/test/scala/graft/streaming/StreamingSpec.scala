package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.cdc.Cdc
import graft.config.GraftConfig
import Sinks._

case class TestImage(title: String, vote_average: Double, vote_count: Int)
case class TestMeta(stream_keyspace_name: String, stream_table_name: String,
    stream_operation_type: String, stream_arrival_timestamp: Long,
    stream_sequence_number: String)
case class TestCdc(origin: String, metadata: TestMeta, image: TestImage,
    oldImage: TestImage)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val imageSchema = StructType(Seq(
    StructField("title", StringType), StructField("vote_average", DoubleType),
    StructField("vote_count", IntegerType)))

  private def rec(seq: Int, op: String, img: TestImage, old: TestImage = null,
      arrival: Long = 1700000000000L): TestCdc =
    TestCdc(if (op == "TTL") "TTL" else "USER",
      TestMeta("media", "movies", op, arrival, f"$seq%020d"), img, old)

  test("end-to-end micro-batch pipeline: filter -> project -> file sink") {
    val tmp = Files.createTempDirectory("graft-stream").toString
    val input = MemoryStream[TestCdc](spark)
    val settings = GraftConfig.ConnectorSettings(
      filterExpression = Some("newImage != null && (newImage.vote_average ?: 0) > 7.0"),
      fieldsToInclude = Seq("title", "vote_average"), recordFormat = "new-image",
      includeMetadata = true, maxMessageSize = 256 * 1024,
      maxRecordsPerMessage = -1, timestampPartition = "hours", maxRetries = 3)
    val query = Pipeline.run(input.toDF(), settings, imageSchema,
        Sinks.fileSink(s"$tmp/out", "json"), s"$tmp/ckpt", Trigger.AvailableNow())
    input.addData(
      rec(1, "INSERT", TestImage("john wick", 7.2, 12063)),
      rec(2, "INSERT", TestImage("dud", 3.0, 5)),
      rec(3, "DELETE", null, TestImage("gone", 9.0, 7))) // no newImage -> filtered
    val q = query.start()
    q.awaitTermination(60000)
    val out = spark.read.json(s"$tmp/out")
    assert(out.count() == 1)
    val row = out.select("image.title", "image.vote_average", "year", "month").head()
    assert(row.getString(0) == "john wick" && row.getDouble(1) == 7.2)
    assert(row.get(2).toString == "2023" && row.get(3).toString == "11")
    // restart with same checkpoint: no reprocessing, no duplicate output
    val q2 = Pipeline.run(input.toDF(), settings, imageSchema,
      Sinks.fileSink(s"$tmp/out", "json"), s"$tmp/ckpt", Trigger.AvailableNow()).start()
    q2.awaitTermination(60000)
    assert(spark.read.json(s"$tmp/out").count() == 1)
  }

  private def envelopeDf(recs: TestCdc*): DataFrame = spark.createDataset(recs).toDF()

  test("include-metadata=false: payloads omit metadata but routing still works") {
    val tmp = Files.createTempDirectory("graft-nometa").toString
    val input = MemoryStream[TestCdc](spark)
    val settings = GraftConfig.ConnectorSettings(
      filterExpression = None, fieldsToInclude = Nil, recordFormat = "new-image",
      includeMetadata = false, maxMessageSize = 256 * 1024,
      maxRecordsPerMessage = -1, timestampPartition = "hours", maxRetries = 3)
    val query = Pipeline.run(input.toDF(), settings, imageSchema,
      Sinks.fileSink(s"$tmp/out", "json"), s"$tmp/ckpt", Trigger.AvailableNow())
    input.addData(rec(1, "INSERT", TestImage("a", 1.0, 1)))
    query.start().awaitTermination(60000)
    val out = spark.read.json(s"$tmp/out")
    // metadata is gone from the serialized payload, but the arrival-ts
    // time partitions were still derived from it (the reference omits
    // metadata from converter output only — routing fields stay available)
    assert(!out.columns.contains("metadata") && !out.columns.contains(Sinks.RoutingMeta))
    assert(out.select("year").head().get(0).toString == "2023")

    // SQS path: message ids still come from the sequence number
    val client = new InMemorySqsClient()
    val batch = Pipeline.transform(
      envelopeDf(rec(7, "INSERT", TestImage("b", 2.0, 2))), settings, imageSchema)
    Sinks.sqsSink(client, clock = () => 999L)(batch.coalesce(1), 0L)
    val entry = client.sent.flatten.head
    assert(entry.id == f"${7}%020d-${7}%020d-999") // firstSeq-lastSeq-now (final message)
    assert(!entry.body.contains("stream_sequence_number"))
  }

  test("sqs sink: chunks of <=10, partial and total failure classification") {
    // one-record messages (maxRecordsPerMessage=1) exercise the reference's
    // 10-entry SendMessageBatch chunking over 23 entries
    def sid(i: Int) = f"$i%020d-$i%020d" // firstSeq-lastSeq of a 1-record message
    val ids = (1 to 22).map(sid).toSet + (sid(23) + "-999") // final gets -now
    val ok = new InMemorySqsClient()
    val batch = envelopeDf((1 to 23).map(i =>
      rec(i, "INSERT", TestImage(s"t$i", 5.0, i))): _*)
    Sinks.sqsSink(ok, maxRecordsPerMessage = 1, clock = () => 999L)(batch.coalesce(1), 0L)
    assert(ok.sent.map(_.size).sorted == Seq(3, 10, 10))
    assert(ok.sent.flatten.map(_.id).toSet == ids)

    val partial = new InMemorySqsClient(failIds = Set(sid(1)))
    val thrown = intercept[org.apache.spark.SparkException] {
      Sinks.sqsSink(partial, maxRecordsPerMessage = 1, clock = () => 999L)(batch.coalesce(1), 0L)
    }
    def rootCauses(t: Throwable): Seq[Throwable] =
      Option(t.getCause).map(c => c +: rootCauses(c)).getOrElse(Nil)
    assert((thrown +: rootCauses(thrown)).exists(_.isInstanceOf[PartialFailureException]))

    val allFail = new InMemorySqsClient(failIds = ids)
    val thrown2 = intercept[org.apache.spark.SparkException] {
      Sinks.sqsSink(allFail, maxRecordsPerMessage = 1, clock = () => 999L)(batch.coalesce(1), 0L)
    }
    assert((thrown2 +: rootCauses(thrown2)).exists(_.isInstanceOf[AllItemsFailureException]))
  }

  test("sqs sink packs multi-record JSON-array bodies within the size bound") {
    val maxSize = 1000L
    val client = new InMemorySqsClient()
    val batch = envelopeDf((1 to 40).map(i =>
      rec(i, "INSERT", TestImage(s"title-$i", 5.0, i))): _*)
    Sinks.sqsSink(client, maxMessageSize = maxSize, clock = () => 999L)(
      batch.coalesce(1), 0L)
    val entries = client.sent.flatten
    val seqRe = """"stream_sequence_number":"(\d{20})"""".r
    val bodySeqs = entries.map(e => seqRe.findAllMatchIn(e.body).map(_.group(1)).toVector)

    // bodies are JSON arrays of records; packing actually happened
    assert(entries.forall(e => e.body.startsWith("[{") && e.body.endsWith("}]")))
    assert(bodySeqs.exists(_.size > 1), "no message carries more than one record")
    // every record exactly once, in sequence order within each message
    assert(bodySeqs.flatten.sorted == (1 to 40).map(i => f"$i%020d"))
    assert(bodySeqs.forall(s => s == s.sorted))
    // reference size rule: sum of individual record sizes <= max (array
    // overhead = n-1 commas + 2 brackets) unless a single oversized record
    bodySeqs.zip(entries).foreach { case (seqs, e) =>
      val recordBytes = e.body.getBytes("UTF-8").length - (seqs.size - 1) - 2
      assert(recordBytes <= maxSize || seqs.size == 1)
    }
    // id scheme: firstSeq-lastSeq of the packed records; final message -now
    entries.init.zip(bodySeqs.init).foreach { case (e, seqs) =>
      assert(e.id == s"${seqs.head}-${seqs.last}")
    }
    assert(entries.last.id == s"${bodySeqs.last.head}-${bodySeqs.last.last}-999")
    // send chunks stay <=10 entries
    assert(client.sent.forall(_.size <= 10))
  }

  test("sqs sink closes messages and send batches at shard boundaries") {
    val client = new InMemorySqsClient()
    val batch = envelopeDf((1 to 8).map(i =>
      rec(i, "INSERT", TestImage(s"t$i", 5.0, i))): _*)
    Sinks.sqsSink(client, shard = Some(pmod(col("image.vote_count"), lit(2))),
      clock = () => 999L)(batch, 0L)
    val entries = client.sent.flatten
    val seqRe = """"stream_sequence_number":"(\d{20})"""".r
    // two shards (even/odd vote_count) -> two final messages, one per shard,
    // each holding only its own shard's records in sequence order
    assert(entries.size == 2 && entries.forall(_.id.endsWith("-999")))
    val grouped = entries.map(e =>
      seqRe.findAllMatchIn(e.body).map(_.group(1).toLong).toVector).sortBy(_.head)
    assert(grouped == Vector(Vector(2L, 4L, 6L, 8L), Vector(1L, 3L, 5L, 7L))
      .sortBy(_.head))
  }

  test("json object sink: firstSeq-lastSeq-ts object naming under time partitions") {
    val tmp = Files.createTempDirectory("graft-jsonobj").toString
    val batch = envelopeDf((1 to 5).map(i =>
      rec(i, "INSERT", TestImage(s"t$i", 1.0, i))): _*)
    Sinks.jsonObjectSink(tmp, maxRecordsPerMessage = 2, clock = () => 999L)(batch, 0L)
    // arrival 1700000000000 = 2023-11-14T22:13:20Z; hours granularity
    val dir = new java.io.File(s"$tmp/2023/11/14/22")
    def s(i: Int) = f"$i%020d"
    val names = dir.listFiles().map(_.getName)
      .filter(n => !n.startsWith(".") && n.endsWith(".json")).sorted.toSeq
    // reference naming (S3TargetMapper.java:126-135): messageId-epochMs.json,
    // where the shard's final message id itself carries the -now suffix
    assert(names == Seq(
      s"${s(1)}-${s(2)}-999.json", s"${s(3)}-${s(4)}-999.json",
      s"${s(5)}-${s(5)}-999-999.json").sorted)
    val body = scala.io.Source.fromFile(new java.io.File(dir, names.head)).mkString
    assert(body.startsWith("[{") && body.endsWith("}]"))
    assert(body.contains("\"title\":\"t1\"") && body.contains("\"title\":\"t2\""))
  }

  test("mv sink: latest change per key wins; delete removes; upsert writes") {
    val table = new InMemoryKeyedTable()
    val batch = envelopeDf(
      rec(1, "INSERT", TestImage("a", 1.0, 1)),
      rec(2, "UPDATE", TestImage("a", 2.0, 2), TestImage("a", 1.0, 1)),
      rec(3, "INSERT", TestImage("b", 3.0, 3)),
      rec(4, "DELETE", null, TestImage("b", 3.0, 3)),
      rec(5, "INSERT", TestImage("c", 5.0, 5)))
    Sinks.mvSink(table, Seq("title"), Seq("vote_average", "vote_count"))(batch, 0L)
    assert(table.data.keySet == Set(Seq("a"), Seq("c")))
    assert(table.data(Seq("a")) == Map("vote_average" -> 2.0, "vote_count" -> 2))
  }

  test("vector sink: embeds text field, falls back to key when text empty") {
    val index = new InMemoryVectorIndex()
    val batch = envelopeDf(
      rec(1, "INSERT", TestImage("keyed", 1.0, 1)),
      rec(2, "DELETE", null, TestImage("gone", 2.0, 2))) // no image -> skipped
      .withColumn("image", when(col("image").isNotNull,
        struct(col("image.title").as("title"), lit("").as("overview"),
          col("image.vote_count").as("vote_count"))))
    Sinks.vectorSink(index, HashEmbedder, keyField = "title",
      embeddingField = "overview", dims = 8, metadataFields = Seq("vote_count"))(batch, 0L)
    assert(index.vectors.keySet == Set("keyed"))
    val v = index.vectors("keyed")
    assert(v.data.length == 8)
    // empty overview fell back to key text -> same embedding as embed(key)
    assert(v.data.toSeq == HashEmbedder.embed("keyed", 8).toSeq)
    assert(v.metadata == Map("vote_count" -> 1))
  }

  test("greedy packing honors both size and count bounds (reference semantics)") {
    val df = Seq(
      ("s", "01", 400L), ("s", "02", 400L), ("s", "03", 400L), // 3rd crosses 1000
      ("s", "04", 2000L), // oversize record still gets its own message
      ("s", "05", 100L), ("s", "06", 100L)).toDF("shard", "seq", "bytes")
    val bins = Packing.greedyPack(df, "shard", "seq", "bytes", 1000L, -1)
      .collect().map(p => p.seq -> p.messageBin).toMap
    assert(bins == Map("01" -> 0L, "02" -> 0L, "03" -> 1L, "04" -> 2L, "05" -> 3L, "06" -> 3L))
    val capped = Packing.greedyPack(df, "shard", "seq", "bytes", 100000L, 2)
      .collect().map(p => p.seq -> p.messageBin).toMap
    assert(capped == Map("01" -> 0L, "02" -> 0L, "03" -> 1L, "04" -> 1L, "05" -> 2L, "06" -> 2L))
  }

  test("config: HOCON values with env-var override and reference defaults") {
    val hocon =
      """keyspaces-cdc-streams.stream {
        |  filter-expression = "newImage != null"  # comment survives
        |  connector {
        |    record-format = "full"
        |    fields-to-include = "a, b"
        |  }
        |}""".stripMargin
    val c = GraftConfig.fromString(hocon,
      env = Map("STREAM_CONNECTOR_RECORD_FORMAT" -> "new-image"))
    val s = GraftConfig.connector(c)
    assert(s.recordFormat == "new-image") // env wins over HOCON
    assert(c.envVarName("keyspaces-cdc-streams.stream.connector.bucket-id")
      == "STREAM_CONNECTOR_BUCKET_ID") // full-remainder mangling (KeyspacesConfig.java:366-375)
    assert(s.fieldsToInclude == Seq("a", "b"))
    assert(s.filterExpression.contains("newImage != null"))
    assert(s.maxMessageSize == 256 * 1024 && s.maxRecordsPerMessage == -1
      && s.timestampPartition == "hours" && s.maxRetries == 3)

    // HOCON allows content on the same line as braces; braces inside quoted
    // values must survive untouched
    val inline = GraftConfig.fromString(
      """keyspaces-cdc-streams.stream { connector { sink = jsonobj
        |    record-format = full }
        |  filter-expression = "newImage.t == '{x}'" }""".stripMargin,
      env = Map.empty)
    assert(inline.get("keyspaces-cdc-streams.stream.connector.sink").contains("jsonobj"))
    assert(GraftConfig.connector(inline).recordFormat == "full")
    assert(GraftConfig.connector(inline).filterExpression.contains("newImage.t == '{x}'"))
  }

  test("retry: exponential backoff with cap, gives up after maxRetries") {
    val delays = scala.collection.mutable.Buffer[Long]()
    var calls = 0
    val ex = intercept[RuntimeException] {
      Retry(maxRetries = 3, baseDelayMs = 1000, maxDelayMs = 10000,
        jitter = 0.0, sleep = delays += _)(_ => true) {
        calls += 1; throw new RuntimeException("throttled")
      }
    }
    assert(ex.getMessage == "throttled" && calls == 4)
    assert(delays.toSeq == Seq(1000L, 2000L, 4000L))

    var n = 0
    val out = Retry(maxRetries = 3, sleep = _ => ())(_ => true) {
      n += 1; if (n < 3) throw new RuntimeException("flaky") else "ok"
    }
    assert(out == "ok")

    // non-retryable errors propagate immediately
    var m = 0
    intercept[IllegalStateException] {
      Retry(maxRetries = 3, sleep = _ => ())(_.getMessage.contains("throttl")) {
        m += 1; throw new IllegalStateException("fatal")
      }
    }
    assert(m == 1)
  }
}
