package graft.expr

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fixture row (top-level for Spark encoders). */
final case class MhDoc(id: Long, shs: Seq[String])

/** The native MinHash against an independent Scala md5 computation —
  * including the edges the q200 gate filters out (empty arrays → all-null
  * lanes, null elements skipped) and the SQL-function registration. */
class MinHashSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def reference(shs: Seq[String]): Seq[Option[String]] = {
    if (shs.isEmpty) return Seq.fill(8)(None)
    val lanes = (0 until 8).map { i =>
      shs.map { sh =>
        val h = if (i < 4) md5hex(sh) else md5hex("1:" + sh)
        h.substring(8 * (i % 4), 8 * (i % 4) + 8)
      }.min
    }
    lanes.map(Some(_))
  }

  test("native lanes equal an independent md5 computation; empty array yields null lanes") {
    val rng = new Random(11)
    val docs = (0 until 40).map { d =>
      MhDoc(d.toLong, (0 until rng.nextInt(12)).map(_ => s"w${rng.nextInt(50)} x y"))
    } :+ MhDoc(99L, Seq.empty)
    val got = docs.toDF()
      .select(col("id"), MinHashFunctions.minhash8(col("shs")).as("mh"))
      .as[(Long, Seq[Option[String]])].collect().toMap
    docs.foreach { d =>
      assert(got(d.id) == reference(d.shs.distinct),
        s"doc ${d.id}: ${got(d.id)} vs ${reference(d.shs.distinct)}")
    }
  }

  test("minhash8 is registered as a SQL function and rejects non-string arrays") {
    graft.GraftExtensions.install(spark)
    val viaSql = spark.sql(
      "SELECT minhash8(array('a b c', 'd e f')) AS mh").as[Seq[String]].head()
    assert(viaSql == reference(Seq("a b c", "d e f")).map(_.get))
    val err = intercept[Exception] {
      spark.sql("SELECT minhash8(array(1, 2))").collect()
    }
    assert(err.getMessage.contains("array<string>") ||
      err.getMessage.toLowerCase.contains("type"), err.getMessage)
  }
}
