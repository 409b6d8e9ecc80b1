package graft.streaming

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AvroSinkSpec extends SparkSpec {
  import spark.implicits._

  test("avro schema mapping follows reference rules (nullable unions, decimal->string)") {
    import org.apache.spark.sql.types._
    val st = StructType(Seq(
      StructField("t", StringType), StructField("i", IntegerType),
      StructField("l", LongType), StructField("d", DecimalType(38, 18)),
      StructField("ts", TimestampType), StructField("dt", DateType),
      StructField("b", BinaryType)))
    val s = AvroSink.avroSchema(st, "Rec")
    import scala.collection.JavaConverters._
    val types = s.getFields.asScala.map(f =>
      f.name() -> f.schema().getTypes.asScala.map(_.getType.toString).toList).toMap
    assert(types("t") == List("NULL", "STRING"))
    assert(types("d") == List("NULL", "STRING")) // decimal stringified
    assert(types("ts") == List("NULL", "LONG")) // epoch millis
    assert(types("dt") == List("NULL", "INT")) // date logical type
    assert(types("b") == List("NULL", "BYTES"))
  }

  test("sink writes per-shard packed container files named firstSeq-lastSeq.avro") {
    val tmp = Files.createTempDirectory("graft-avro").toString
    val df = (1 to 7).map { i =>
      val shard = if (i <= 4) "s0" else "s1"
      (shard, f"$i%05d", "2024/01/05/07", i.toLong, s"title$i", if (i % 2 == 0) null else "x")
    }.toDF("__shard", "__seq", "__path", "user_id", "title", "opt")
    AvroSink.sink(tmp, maxRecords = 3)(df, 0L)

    val files = new File(s"$tmp/2024/01/05/07").listFiles().map(_.getName).sorted
    assert(files.toSeq == Seq("00001-00003.avro", "00004-00004.avro", "00005-00007.avro"))

    val recs = AvroSink.readFile(new File(s"$tmp/2024/01/05/07/00001-00003.avro"))
    assert(recs.size == 3)
    assert(recs.head("user_id") == 1L && recs.head("title") == "title1" && recs.head("opt") == "x")
    assert(recs(1)("opt") == null) // nullable union round-trips nulls
  }
}
