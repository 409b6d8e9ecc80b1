package graft.streaming

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, StreamMain}
import graft.cdc.CdcSynth

/** The reference's composed deployment shape (KCLMainRunner.java:25-102)
  * end to end: ONE HOCON config drives shardlog source → JEXL filter →
  * projection → ALL FIVE sinks (packed SQS + jsonObject + Avro + MV +
  * vector) in a single StreamMain run, then more records land in the log
  * and a second run resumes from the checkpoint without reprocessing —
  * every piece is individually spec'd elsewhere; this locks the
  * composition. */
class TopologySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("reference topology: shardlog -> JEXL -> five sinks; restart resumes without dups") {
    val tmp = Files.createTempDirectory("graft-e2e").toString
    val logDir = s"$tmp/log"
    val outDir = s"$tmp/out"
    val confPath = s"$tmp/conf.hocon"
    Files.writeString(Paths.get(confPath),
      """keyspaces-cdc-streams.stream {
        |  source = shardlog
        |  source-max-records-per-batch = 64
        |  filter-expression = "origin != null && (newImage.value ?: oldImage.value) > 50.0"
        |  connector {
        |    sink = "sqs,jsonobj,avro,mv,vector"
        |    record-format = full
        |    fields-to-include = "user_id,event_type,value,k"
        |    include-metadata = true
        |    timestamp-partition = days
        |    max-message-size = 4096
        |    max-records-per-message = 5
        |    partition-keys = "user_id"
        |    clustering-keys = "k"
        |    key-field = "user_id"
        |    embedding-field = "event_type"
        |    dimensions = 16
        |  }
        |}""".stripMargin)

    val env = CdcSynth.fromEvents(spark, dir)
    val shard = pmod(coalesce(col("image.user_id"), col("oldImage.user_id")), lit(4L))
    // batch-side mirror of the JEXL filter, for expected counts
    def expected(lo: Long, hi: Long) = env
      .filter(col("event_id") >= lo && col("event_id") < hi)
      .filter(col("origin").isNotNull &&
        coalesce(col("image.value"), col("oldImage.value")) > 50.0)

    graft.sources.ShardLog.record(env.filter(col("event_id") < 200), logDir, shard)
    val r1 = StreamMain.run(spark, confPath, logDir, outDir)
    val exp1 = expected(0, 200).count()
    assert(exp1 > 10 && exp1 < 200, s"the JEXL filter must be selective: $exp1")

    val mapper = new ObjectMapper()
    def sqsRecords(r: StreamMain.RunResult): Long =
      r.sqs.sent.flatten.map(e => mapper.readTree(e.body).size().toLong).sum
    def filesUnder(ext: String): Seq[java.io.File] = {
      val b = Seq.newBuilder[java.io.File]
      def walk(f: java.io.File): Unit =
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(walk))
        else if (f.getName.endsWith(ext)) b += f
      walk(new java.io.File(s"$outDir/data")); b.result()
    }
    def jsonObjRecords(): Long =
      filesUnder(".json").map(f => spark.read.json(f.getPath).count()).sum
    def avroRecords(): Long =
      filesUnder(".avro").map(f => AvroSink.readFile(f).size.toLong).sum

    // every filtered record reached every serializing sink exactly once
    assert(sqsRecords(r1) == exp1, s"sqs packed records: ${sqsRecords(r1)} != $exp1")
    assert(jsonObjRecords() == exp1, s"json objects: ${jsonObjRecords()} != $exp1")
    assert(avroRecords() == exp1, s"avro records: ${avroRecords()} != $exp1")
    // packed SQS ids follow the reference's firstSeq-lastSeq[-now] scheme
    r1.sqs.sent.flatten.foreach { e =>
      assert(e.id.matches("""\d{20}-\d{20}(-\d+)?"""), s"bad message id ${e.id}")
    }
    // MV holds exactly the latest-change-per-key upsert survivors
    val w = Window.partitionBy(col("uid"), col("k")).orderBy(col("seq").desc)
    val expMvKeys = expected(0, 200)
      .select(
        coalesce(col("image.user_id"), col("oldImage.user_id")).as("uid"),
        coalesce(col("image.k"), col("oldImage.k")).as("k"),
        col("metadata.stream_sequence_number").as("seq"),
        col("metadata.stream_operation_type").as("op"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .filter(col("op").isin("INSERT", "UPDATE", "REPLICATED_INSERT", "REPLICATED_UPDATE"))
      .select("uid", "k").collect()
      .map(r => Seq[Any](r.get(0), r.get(1))).toSet
    assert(r1.mv.data.keySet == expMvKeys,
      s"mv keys: extra=${r1.mv.data.keySet -- expMvKeys} missing=${expMvKeys -- r1.mv.data.keySet}")
    // vector index holds one vector per distinct key with a non-null image
    val expVecKeys = expected(0, 200).filter(col("image").isNotNull)
      .select(col("image.user_id").cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(r1.vec.vectors.keySet == expVecKeys,
      s"vector keys differ: ${r1.vec.vectors.keySet.size} vs ${expVecKeys.size}")

    // late data lands in the log; a SECOND run with the same checkpoint
    // resumes mid-shard and processes ONLY the new records
    graft.sources.ShardLog.record(
      env.filter(col("event_id") >= 200 && col("event_id") < 400), logDir, shard)
    val r2 = StreamMain.run(spark, confPath, logDir, outDir)
    val exp2 = expected(200, 400).count()
    assert(exp2 > 0, "second slice must contain filtered records")
    assert(sqsRecords(r2) == exp2,
      s"restart must process only new records: ${sqsRecords(r2)} != $exp2")
    assert(jsonObjRecords() == exp1 + exp2,
      s"json objects after resume: ${jsonObjRecords()} != ${exp1 + exp2}")
    assert(avroRecords() == exp1 + exp2,
      s"avro records after resume: ${avroRecords()} != ${exp1 + exp2}")
  }
}
