package graft.cdc

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val img = StructType(Seq(StructField("v", IntegerType)))

  /** All 8 outcomes of StreamHelpers.getOperationType (StreamHelpers.java:26-63). */
  test("operation-type derivation truth table") {
    val cases = Seq(
      // (origin, old?, new?) -> expected
      (Some("TTL"), true, false, "TTL"),
      (Some("TTL"), true, true, "TTL"), // TTL origin wins regardless of images
      (Some("USER"), true, false, "DELETE"),
      (Some("REPLICATION"), true, false, "REPLICATED_DELETE"),
      (Some("USER"), false, true, "INSERT"),
      (Some("REPLICATION"), false, true, "REPLICATED_INSERT"),
      (Some("USER"), true, true, "UPDATE"),
      (Some("REPLICATION"), true, true, "REPLICATED_UPDATE"),
      (None, true, true, "UNKNOWN"),
      // no image at all: the reference's else-branch classifies this as an
      // update (StreamHelpers.java getOperationType has no both-null arm)
      (Some("USER"), false, false, "UPDATE"),
      (Some("REPLICATION"), false, false, "REPLICATED_UPDATE"))
    val rows = cases.zipWithIndex.map { case ((o, hasOld, hasNew, exp), i) =>
      Row(i, o.orNull, if (hasOld) Row(1) else null, if (hasNew) Row(2) else null, exp)
    }
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("origin", StringType),
      StructField("oldImage", img), StructField("image", img),
      StructField("expected", StringType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .withColumn("op", Cdc.operationType(col("origin"), col("oldImage"), col("image")))
    val bad = df.filter(col("op") =!= col("expected")).collect()
    assert(bad.isEmpty, s"mismatches: ${bad.mkString(", ")}")
  }

  test("selectImage default falls back to oldImage on DELETE/TTL") {
    val df = Seq((Some(1), None: Option[Int]), (None, Some(2)), (Some(3), Some(4)))
      .toDF("n", "o")
      .select(when($"n".isNotNull, struct($"n".as("v"))).as("image"),
        when($"o".isNotNull, struct($"o".as("v"))).as("oldImage"))
    val out = Cdc.selectImage(df, "new-image").select($"image.v").as[Int].collect().sorted
    assert(out.toSeq == Seq(1, 2, 3))
    assert(Cdc.selectImage(df, "full").columns.toSeq == Seq("image", "oldImage"))
  }

  test("includeFields prunes to configured list; empty keeps all") {
    val schema = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType)))
    val df = Seq((1, "x")).toDF("a", "b").select(struct($"a", $"b").as("image"))
    val pruned = df.select(Cdc.includeFields($"image", schema, Seq("b")).as("image"))
    assert(pruned.schema.fields.head.dataType.asInstanceOf[StructType].fieldNames.toSeq == Seq("b"))
    val all = df.select(Cdc.includeFields($"image", schema, Nil).as("image"))
    assert(all.schema.fields.head.dataType.asInstanceOf[StructType].fieldNames.toSeq == Seq("a", "b"))
  }

  test("includeFields keeps a NULL image NULL (reference: absent image node)") {
    val schema = StructType(Seq(StructField("a", IntegerType)))
    val df = Seq(Tuple1(Option(1)), Tuple1(None: Option[Int])).toDF("a")
      .select(when($"a".isNotNull, struct($"a")).as("image"))
    val out = df.select(Cdc.includeFields($"image", schema, Seq("a")).as("image"))
    assert(out.filter($"image".isNull).count() == 1)
    assert(out.filter($"image".isNotNull).count() == 1)
  }

  test("time partition columns honor granularity fall-through") {
    val df = Seq("2024-03-05 07:08:09").toDF("s").select(to_timestamp($"s").as("ts"))
    val cols = Cdc.timePartitionColumns($"ts", "minutes")
    val row = df.select(cols: _*).head()
    assert(row.toSeq == Seq("2024", "03", "05", "07", "08"))
    val path = df.select(Cdc.timePartitionPath($"ts", "hours")).head().getString(0)
    assert(path == "2024/03/05/07")
  }

  test("packByCount groups at most maxRecords per bin, in sequence order") {
    val df = (1 to 25).map(i => ("s", f"$i%05d")).toDF("shard", "seq")
    val out = Cdc.packByCount(df, $"shard", $"seq", 10)
      .groupBy($"message_bin").count().orderBy($"message_bin")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 10L), (1L, 10L), (2L, 5L)))
  }

  test("packBySize starts a new bin when running bytes cross the bound") {
    val df = Seq(("s", "1", 600L), ("s", "2", 600L), ("s", "3", 600L))
      .toDF("shard", "seq", "bytes")
    val out = Cdc.packBySize(df, $"shard", $"seq", $"bytes", 1024L)
      .select($"seq", $"message_bin").as[(String, Long)].collect().toMap
    assert(out == Map("1" -> 0L, "2" -> 0L, "3" -> 1L))
  }

  test("replayLatest keeps last image per key, drops tombstoned keys, revives re-inserts") {
    // key 1: insert v=1 then update v=2            -> survives with v=2
    // key 2: insert v=3 then delete                -> absent
    // key 3: insert v=4, delete, re-insert v=5     -> survives with v=5
    // key 4: lone TTL tombstone                    -> absent
    val rows = Seq(
      (1L, "01", Some(1), "USER"), (1L, "02", Some(2), "USER"),
      (2L, "03", Some(3), "USER"), (2L, "04", None, "USER"),
      (3L, "05", Some(4), "USER"), (3L, "06", None, "USER"), (3L, "07", Some(5), "USER"),
      (4L, "08", None, "TTL"))
    val env = rows.toDF("k", "seq", "v", "origin")
      .select($"k", $"seq",
        when($"v".isNotNull, struct($"v")).as("image"),
        when($"v".isNull, struct(lit(0).as("v"))).as("oldImage"),
        $"origin")
      .select($"k", $"image",
        struct(
          Cdc.operationType($"origin", $"oldImage", $"image").as("stream_operation_type"),
          $"seq".as("stream_sequence_number")).as("metadata"))
    val out = Cdc.replayLatest(env, $"k", $"metadata.stream_sequence_number")
      .select($"key", $"last.image.v".as("v"), $"last_seq")
      .as[(Long, Int, String)].collect().toSeq.sorted
    assert(out == Seq((1L, 2, "02"), (3L, 5, "07")))
  }
}
