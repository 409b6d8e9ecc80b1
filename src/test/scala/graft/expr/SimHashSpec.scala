package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SimHashSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "the quick brown fox"), // identical -> identical signature
    (3L, "completely different words entirely"),
    (4L, "the quick brown wolf")) // near-dup -> small hamming distance
    .toDF("doc_id", "text")
    .withColumn("toks", split($"text", " "))

  test("identical token sets produce identical signatures; near-dups are close") {
    val sig = docs.select($"doc_id", SimHashFunctions.simhash($"toks", 63).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sig(1L) == sig(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sig(1L), sig(4L)) < hamming(sig(1L), sig(3L)))
  }

  test("interpreted eval agrees with codegen") {
    val df = docs.select(SimHashFunctions.simhash($"toks", 48).as("s"))
    val gen = df.collect().map(_.getLong(0)).toSeq
    val interp = {
      val prev = spark.conf.get("spark.sql.codegen.wholeStage")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try df.collect().map(_.getLong(0)).toSeq
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", prev)
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    assert(gen == interp)
  }

  test("16-bit native simhash matches the relational SQL formulation (q43)") {
    val tok = docs.select($"doc_id", explode(array_distinct($"toks")).as("tk"))
      .withColumn("h", md5($"tk"))
    val sums = (0 until 16).map { j =>
      val pos = j / 4 + 1
      val shift = 1 << (3 - j % 4)
      sum(expr(
        s"CASE WHEN pmod((instr('0123456789abcdef', substr(h, $pos, 1)) - 1) div $shift, 2) = 1 " +
          s"THEN 1 ELSE -1 END")).as(s"s$j")
    }
    val sqlForm = tok.groupBy($"doc_id").agg(sums.head, sums.tail: _*)
      .select($"doc_id",
        (0 until 16).map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
      .as[(Long, Long)].collect().toMap
    val native = docs
      .select($"doc_id", SimHashFunctions.simhash(array_distinct($"toks"), 16).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(native == sqlForm)
  }

  test("native sign-LSH agrees between codegen and interpreted eval") {
    val planes = graft.ops.VectorOpsImpl.hyperplanes
    val vecs = Seq(
      (1L, Array.tabulate(64)(i => (i - 32) / 10.0f)),
      (2L, Array.fill(64)(0.5f)),
      (3L, Array.fill(64)(-0.5f)))
      .toDF("id", "v")
    val df = vecs.select($"id", SignLshFunctions.signLsh($"v", planes).as("sig"))
    val gen = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp =
      try df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      finally {
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
      }
    assert(gen == interp)
    assert(gen.map(_._2).distinct.size == 3) // signatures differentiate inputs
  }

  test("wrong input element types fail at analysis, not with garbage at runtime") {
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      docs.select(SimHashFunctions.simhash($"text", 16)).collect() // string, not array
    }
    assert(e1.getMessage.contains("array<string>"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1L, Array.fill(64)(0.5))).toDF("id", "v") // array<double>, not array<float>
        .select(SignLshFunctions.signLsh($"v", graft.ops.VectorOpsImpl.hyperplanes))
        .collect()
    }
    assert(e2.getMessage.contains("array<float>"))
  }

  test("SQL registration via GraftExtensions.install") {
    graft.GraftExtensions.install(spark)
    val r = spark.sql(
      """SELECT to_big_decimal('1.5') AS d, to_big_decimal('oops') AS bad,
        |  compare_to(2, 1) AS gt, compare_to(1, 2) AS lt, compare_to(3, 3) AS eq,
        |  simhash(array('a', 'b'), 16) AS sh""".stripMargin).head()
    assert(r.getDecimal(0).compareTo(new java.math.BigDecimal("1.5")) == 0)
    assert(r.isNullAt(1)) // try-cast semantics: malformed -> null, no error
    assert(r.getInt(2) == 1 && r.getInt(3) == -1 && r.getInt(4) == 0)
    assert(r.getLong(5) >= 0 && r.getLong(5) < (1L << 16))
  }
}
