package graft.expr

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pure-Scala reference model for [[DHash64]], written independently of the
  * production one-pass loop: stripes materialized by grouping byte indices
  * (not by accumulating in a pass), bits assembled from an explicit
  * (row, col) comprehension. Agreement in the property test means the
  * production loop implements the specified function, not merely itself. */
object DHashModel {
  def dhash(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val stripeOf = (i: Int) => ((i.toLong * 72L) / n).toInt
    val stripes = (0 until 72).map { k =>
      bytes.indices.filter(stripeOf(_) == k).map(bytes(_) & 0xFF).map(_.toLong).sum
    }
    (for {
      r <- 0 until 8
      c <- 0 until 8
      b = r * 8 + c
      if b < 63 && stripes(r * 9 + c + 1) > stripes(r * 9 + c)
    } yield 1L << b).foldLeft(0L)(_ | _)
  }
}

/** Deterministic seeds — the scalatest/scalacheck bridge isn't in the
  * offline cache (same approach as JexlPropertySpec). */
class DHashSpec extends SparkSpec {
  import spark.implicits._

  private def viaSpark(payloads: Seq[Array[Byte]]): Seq[Long] =
    payloads.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "content")
      .select($"id", DHashFunctions.dhash64($"content").as("h"))
      .orderBy($"id").as[(Long, Long)].collect().map(_._2).toSeq

  test("property: expression output equals the independent Scala model") {
    val rng = new Random(20260814L)
    val payloads = (1 to 80).map { _ =>
      val n = rng.nextInt(400) // includes < 72 (empty stripes) and 0
      Array.fill[Byte](n)(rng.nextInt(256).toByte)
    }
    val got = viaSpark(payloads)
    payloads.zip(got).foreach { case (b, h) =>
      assert(h == DHashModel.dhash(b), s"len=${b.length}")
      assert(h >= 0L, "bit 63 must never be set (BIGINT oracle headroom)")
    }
  }

  test("edge cases: empty, single byte, stripe-aligned constant payload hash to zero bits") {
    // 144 = 2 bytes per stripe exactly: a constant payload then gives equal
    // stripe sums → no strictly-greater neighbor → 0. (A NON-multiple of 72
    // populates stripes unevenly, so raw sums differ even for constant
    // bytes — the stand-in sums rather than averages; deterministic and
    // identical in both engines, just not zero.)
    val cases = Seq[Array[Byte]](Array.emptyByteArray, Array[Byte](7),
      Array.fill[Byte](144)(42))
    viaSpark(cases).zip(cases).foreach { case (h, b) =>
      assert(h == 0L && h == DHashModel.dhash(b))
    }
  }

  test("near-identical payloads land closer than unrelated ones; codegen == interpreted") {
    val base = Array.tabulate[Byte](360)(i => ((i * 31 + 7) % 251).toByte)
    val tweaked = base.clone(); tweaked(5) = (tweaked(5) + 90).toByte
    val far = Array.tabulate[Byte](360)(i => ((i * i * 17 + 3) % 247).toByte)
    val Seq(hb, ht, hf) = viaSpark(Seq(base, tweaked, far))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hb, ht) < ham(hb, hf), s"tweak ${ham(hb, ht)} vs far ${ham(hb, hf)}")

    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp =
      try viaSpark(Seq(base, tweaked, far))
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    assert(interp == Seq(hb, ht, hf))
  }

  test("SQL registration: dhash64(binary) works after GraftExtensions.install") {
    graft.GraftExtensions.install(spark)
    val h = spark.sql(
      "SELECT dhash64(encode('some ascii image stand-in text here', 'UTF-8')) AS h")
      .head().getLong(0)
    assert(h == DHashModel.dhash("some ascii image stand-in text here".getBytes("UTF-8")))
  }

  test("non-binary input fails at analysis, not with garbage at runtime") {
    val e = intercept[Exception] {
      Seq(Tuple1("plain string")).toDF("content")
        .select(DHashFunctions.dhash64($"content")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("binary"))
  }
}
