package graft.ops

import scala.collection.JavaConverters._

import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

import graft.Q
import graft.cdc.CdcSynth

/** ORACLE GATE for the Avro serialization path (SURVEY §2 B2) — the one
  * reference connector surface that until round 11 was spec-only: write the
  * full-format CDC envelope through [[graft.streaming.AvroSink]] (the
  * reference's schema-mapping and `old_` prefixing rules,
  * AbstractAvroConverter.java:339-394,491-515; object naming
  * `firstSeq-lastSeq.avro` under the time partition,
  * S3TargetMapper.java:126-135), then read every container file back and
  * hash-compare against DuckDB computing the same flat records straight
  * from the events log.
  *
  * The read-back is DISTRIBUTED: a `binaryFile` scan hands each executor
  * its files' bytes and a per-partition `DataFileReader` decodes them —
  * no driver-side loop, so verifying a day of archived CDC objects at
  * 100 TB scales with the cluster exactly like reading them would. (Spark
  * ships no avro data source in this container; the container FORMAT is
  * what B2 is about, so decoding it with the avro-core reader inside
  * mapPartitions is the honest equivalent, not a workaround.)
  */
object AvroGateImpl {

  private val outs = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  def clearCaches(): Unit = outs.clear()

  private val fields = CdcSynth.imageSchema.fieldNames.toSeq

  /** The record columns that land IN the Avro files (the StreamMain avro
    * sink's full-format flat shape + the sequence number as a data field). */
  private def dataSchema: StructType = StructType(
    StructField("stream_sequence_number",
      org.apache.spark.sql.types.StringType) +:
    (CdcSynth.imageSchema.fields.toSeq ++
      CdcSynth.imageSchema.fields.toSeq.map(f => f.copy(name = s"old_${f.name}"))))

  /** Flat full-format frame (metadata seq + image fields + old_ mirrors)
    * with the sink's routing columns: shard identity surviving DELETEs
    * (null image) and the hourly time-partition prefix. */
  private def flatEnvelope(s: SparkSession, dir: String): DataFrame = {
    val env = CdcSynth.fromEvents(s, dir)
    env.select(
      (col("metadata.stream_sequence_number").as("__seq") +:
        pmod(coalesce(col("image.user_id"), col("oldImage.user_id")), lit(8L))
          .cast("string").as("__shard") +:
        graft.cdc.Cdc.timePartitionPath(
          timestamp_millis(col("metadata.stream_arrival_timestamp")), "hours")
          .as("__path") +:
        col("metadata.stream_sequence_number").as("stream_sequence_number") +:
        fields.map(f => col(s"image.$f").as(f))) ++
        fields.map(f => col(s"oldImage.$f").as(s"old_$f")): _*)
  }

  private[graft] def ensureWritten(s: SparkSession, dir: String): String =
    Memo.getOrCacheAny(outs, s, dir, { _ =>
      val out = java.nio.file.Files.createTempDirectory("graft_avro").toString
      graft.streaming.AvroSink.sink(out)(flatEnvelope(s, dir), 0L)
      out
    })

  /** Distributed Avro container read: binaryFile scan → per-partition
    * DataFileReader decode. Field lookup is BY NAME against the expected
    * schema, so files written under either schema mode round-trip. */
  private[graft] def readAvroDir(s: SparkSession, dir: String,
      schema: StructType): DataFrame = {
    val bin = s.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro")
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(col("content"))
    val names = schema.fieldNames
    val rows = bin.rdd.mapPartitions(_.flatMap { row =>
      val bytes = row.getAs[Array[Byte]](0)
      val r = new DataFileReader[GenericRecord](
        new SeekableByteArrayInput(bytes),
        new GenericDatumReader[GenericRecord]())
      val decoded = r.iterator().asScala.map { rec =>
        Row(names.map { n =>
          rec.get(n) match {
            case u: org.apache.avro.util.Utf8 => u.toString
            case x => x
          }
        }: _*)
      }
      // STREAM the container's records instead of buffering them (they were
      // bounded by the sink's 256 KiB packing cap, but a lazy iterator holds
      // one record, not one container). Close on exhaustion AND on task
      // completion: today the input is an in-memory byte array so an
      // abandoned reader leaks no OS handle, but consumption that stops
      // early (limit/take/task kill) must still release the reader if this
      // is ever switched to a real stream — the listener makes the pattern
      // handle-safe instead of relying on the caller draining.
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => r.close()))
      new Iterator[Row] {
        def hasNext: Boolean = {
          val h = decoded.hasNext
          if (!h) r.close()
          h
        }
        def next(): Row = decoded.next()
      }
    })
    s.createDataFrame(rows, schema)
  }

  /** q234: full-format envelope → Avro containers → read-back must equal
    * DuckDB's flat synthesis of the same log (every op type, DELETEs with
    * null images, old_ mirrors carrying the pre-image). */
  def roundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = ensureWritten(s, dir)
    readAvroDir(s, out, dataSchema)
      .orderBy(col("stream_sequence_number"))
  }

  private[ops] lazy val q234Sql: String =
    s"""WITH ${CdcSynth.synthSql}
       |SELECT seq AS stream_sequence_number,
       |  new_user_id AS user_id, new_event_type AS event_type,
       |  new_value AS value, new_k AS k,
       |  old_user_id, old_event_type, old_value, old_k
       |FROM cdc
       |ORDER BY 1""".stripMargin
}

object AvroGateOps {
  def queries: Seq[Q] = Seq(
    Q("q234_avro_roundtrip", AvroGateImpl.roundtrip, Some(AvroGateImpl.q234Sql)))
}
