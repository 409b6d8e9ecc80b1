package graft.expr

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class JexlSpec extends SparkSpec {

  private val img = StructType(Seq(
    StructField("title", StringType),
    StructField("vote_average", DoubleType),
    StructField("vote_count", IntegerType)))
  private val meta = StructType(Seq(
    StructField("stream_operation_type", StringType),
    StructField("stream_arrival_timestamp", LongType)))
  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("metadata", meta),
    StructField("image", img),
    StructField("oldImage", img)))

  private def env(rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)

  private val data = env(
    Row(1, Row("INSERT", 1000L), Row("john wick", 7.2, 12063), null),
    Row(2, Row("UPDATE", 2000L), Row("dud", 3.0, 5), Row("dud", 6.0, 4)),
    Row(3, Row("DELETE", 3000L), null, Row("gone", 9.0, 7)),
    Row(4, Row("INSERT", 4000L), Row("nullvote", null, 1), null))

  private def ids(jexl: String): Seq[Int] =
    Jexl.filter(data, Some(jexl)).select("id").collect().map(_.getInt(0)).toSeq.sorted

  test("reference canonical filter: newImage != null && (vote_average ?: 0) > 7.0") {
    assert(ids("newImage != null && (newImage.vote_average ?: 0) > 7.0") == Seq(1))
  }

  test("metadata.operation equality and inequality") {
    assert(ids("metadata.operation == 'DELETE'") == Seq(3))
    assert(ids("metadata.operation != 'DELETE'") == Seq(1, 2, 4))
  }

  test("cross-image comparison") {
    assert(ids("newImage.vote_count > oldImage.vote_count") == Seq(2))
  }

  test("elvis supplies default for null field (incl. null image: JEXL lenient deref)") {
    assert(ids("(newImage.vote_average ?: 10) > 9") == Seq(3, 4))
  }

  test("null checks both directions") {
    assert(ids("newImage == null") == Seq(3))
    assert(ids("null != oldImage") == Seq(2, 3))
  }

  test("arithmetic and precedence") {
    assert(ids("newImage.vote_average * 2 + 1 > 15") == Seq(1))
    assert(ids("(newImage.vote_count % 2) == 1") == Seq(1, 2, 4))
  }

  test("converters namespace functions") {
    assert(ids("converters:to_big_decimal(newImage.vote_average) > 7") == Seq(1))
    assert(ids("converters:compare_to(newImage.vote_count, oldImage.vote_count) == 1") == Seq(2))
  }

  test("truthiness coercion: numbers truthy iff nonzero; strings via parseBoolean") {
    assert(ids("newImage.vote_count") == Seq(1, 2, 4)) // all nonzero ints
    assert(ids("newImage.vote_count - newImage.vote_count") == Seq()) // 0 falsy
    assert(ids("'true' && metadata.operation == 'INSERT'") == Seq(1, 4))
    assert(ids("'yes'") == Seq()) // parseBoolean('yes') = false
  }

  test("fail-closed: malformed expression rejects every record") {
    assert(ids("newImage .&& garbage ((") == Seq())
  }

  test("fail-closed: string/number comparison errors filter the row, not the job") {
    // JEXL would throw coercing 'john wick' to a number -> record filtered.
    assert(ids("newImage.title > 5") == Seq())
    // but numeric strings compare numerically
    assert(ids("'8.5' > 7") == Seq(1, 2, 3, 4))
  }

  test("lexical comparison when both sides are strings") {
    assert(ids("newImage.title < 'e'") == Seq(2))
  }

  test("empty() and logical keywords") {
    assert(ids("empty(newImage.title) || metadata.operation == 'DELETE'") == Seq(3))
    assert(ids("not (metadata.operation eq 'DELETE')") == Seq(1, 2, 4))
  }

  test("no filter configured passes everything through") {
    assert(Jexl.filter(data, None).count() == 4)
    assert(Jexl.filter(data, Some("")).count() == 4)
  }
}
