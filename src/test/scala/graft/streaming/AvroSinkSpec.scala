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

  test("opt-in reference object naming: firstSeq-lastSeq-epochMillis.avro") {
    val tmp = Files.createTempDirectory("graft-avro-ts").toString
    val df = Seq(("s0", "00001", "p", 1L), ("s0", "00002", "p", 2L))
      .toDF("__shard", "__seq", "__path", "user_id")
    AvroSink.sink(tmp, clock = Some(() => 777L))(df, 0L)
    assert(new File(s"$tmp/p").listFiles().map(_.getName).toSeq == Seq("00001-00002-777.avro"))
  }

  test("dynamic schema inference: sample's absent columns are dropped, metadata kept") {
    val path = "2024/02/01/00"
    def df(rows: (String, String, String, String, String, String)*) = rows.toSeq
      .map { case (sh, seq, t, o, oldT, oldO) => (sh, seq, path, s"op-$seq", t, o, oldT, oldO) }
      .toDF("__shard", "__seq", "__path", "stream_operation_type",
        "title", "opt", "old_title", "old_opt")

    // sample (first record) has opt = null -> 'opt'/'old_opt' dropped from
    // the whole file even though record 2 carries a value (the reference's
    // silent column loss, AbstractAvroConverter.java:359-385)
    val tmp1 = Files.createTempDirectory("graft-avro-dyn").toString
    AvroSink.sink(tmp1, dynamicSchema = true)(df(
      ("s0", "00001", "t1", null, "p1", "x"),
      ("s0", "00002", "t2", "y", "p2", "z")), 0L)
    val dynRecs = AvroSink.readFile(new File(s"$tmp1/$path/00001-00002.avro"))
    assert(dynRecs.head.keySet == Set("stream_operation_type", "title", "old_title"))
    assert(dynRecs.map(_("title")) == Seq("t1", "t2"))

    // static default keeps every column regardless of the sample
    val tmp2 = Files.createTempDirectory("graft-avro-static").toString
    AvroSink.sink(tmp2)(df(
      ("s0", "00001", "t1", null, "p1", "x"),
      ("s0", "00002", "t2", "y", "p2", "z")), 0L)
    val statRecs = AvroSink.readFile(new File(s"$tmp2/$path/00001-00002.avro"))
    assert(statRecs.head.keySet ==
      Set("stream_operation_type", "title", "opt", "old_title", "old_opt"))
    assert(statRecs(1)("opt") == "y")

    // delete-only file: no new-image data anywhere -> schema inferred from
    // the first record's old_ cells (reference fallback :369-378): field
    // names unprefixed + old_ mirrors, new-side values null
    val tmp3 = Files.createTempDirectory("graft-avro-del").toString
    AvroSink.sink(tmp3, dynamicSchema = true)(df(
      ("s0", "00001", null, null, "gone", null),
      ("s0", "00002", null, null, "also", null)), 0L)
    val delRecs = AvroSink.readFile(new File(s"$tmp3/$path/00001-00002.avro"))
    assert(delRecs.head.keySet == Set("stream_operation_type", "title", "old_title"))
    assert(delRecs.map(_("old_title")) == Seq("gone", "also"))
    assert(delRecs.forall(_("title") == null))
  }
}
