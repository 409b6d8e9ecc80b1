package graft.expr

import java.security.MessageDigest

import scala.util.Random

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Property tests for the native content-defined chunker over randomized
  * documents (seeded generation — the scalatest/scalacheck bridge isn't in
  * the offline dependency cache):
  *
  *  1. differential oracle: the expression's chunks equal a straight
  *     independent Scala reimplementation (plain String indexing, no
  *     UTF8String) for arbitrary text;
  *  2. partition invariants: starts begin at 1, chunks tile the document
  *     with no gap/overlap, hashes are the md5 of exactly the chunk text;
  *  3. edit stability — the property that makes CDC chunking dedup-useful:
  *     after inserting one character, every chunk starting at or after the
  *     first surviving boundary past the edit is IDENTICAL (shifted by
  *     one), so chunk-hash dedup keeps matching across edited near-copies.
  */
class CdcChunksPropertySpec extends SparkSpec {
  import graft.ops.TextOpsImpl.{CdcWindow, CdcBoundaryMax}

  private def md5hex(s: String): String = {
    val md = MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Independent reimplementation: boundary at i (1-based, i >= 2) iff the
    * first md5 byte of the window starting at i is < boundaryMax. */
  private def referenceChunks(text: String): Seq[(Long, Long, String)] = {
    val md = MessageDigest.getInstance("MD5")
    val len = text.length
    val hi = math.max(len - (CdcWindow - 1), 1)
    val bounds = 1 +: (2 to hi).filter { i =>
      val w = text.substring(i - 1, math.min(i - 1 + CdcWindow, len))
      (md.digest(w.getBytes("UTF-8"))(0) & 0xFF) < CdcBoundaryMax
    }
    bounds.zipWithIndex.map { case (start, j) =>
      val end = if (j + 1 < bounds.length) bounds(j + 1) - 1 else len
      val chunk = text.substring(start - 1, math.max(end, start - 1))
      (start.toLong, chunk.length.toLong, md5hex(chunk))
    }
  }

  private def exprChunks(texts: Seq[String]): Map[String, Seq[(Long, Long, String)]] = {
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val rows = df.select(col("id"),
        CdcChunksFunctions.cdcChunks(col("text"), CdcWindow, CdcBoundaryMax).as("ch"))
      .as[(Long, Seq[(Long, Long, String)])].collect()
    rows.map { case (id, ch) => texts(id.toInt) -> ch }.toMap
  }

  private def randomTexts(n: Int): Seq[String] = {
    val rng = new Random(7)
    val alphabet = "abcdefgh "
    (1 to n).map { _ =>
      val len = rng.nextInt(300)
      (1 to len).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    }
  }

  test("expression chunks equal an independent reimplementation on random text") {
    val texts = randomTexts(60).filter(_.nonEmpty)
    val got = exprChunks(texts)
    texts.foreach { t =>
      assert(got(t) == referenceChunks(t), s"chunk mismatch for ${t.take(40)}…")
    }
  }

  test("chunks tile each document exactly and hash exactly their own text") {
    val texts = randomTexts(40).filter(_.nonEmpty)
    val got = exprChunks(texts)
    texts.foreach { t =>
      val ch = got(t)
      assert(ch.head._1 == 1L, "first chunk starts at 1")
      ch.sliding(2).foreach {
        case Seq((s1, l1, _), (s2, _, _)) =>
          assert(s2 == s1 + l1, s"gap/overlap between chunks at $s1 in ${t.take(30)}…")
        case _ =>
      }
      assert(ch.map(_._2).sum == t.length.toLong, "chunks must cover the whole document")
      ch.foreach { case (s, l, h) =>
        assert(h == md5hex(t.substring(s.toInt - 1, s.toInt - 1 + l.toInt)),
          "chunk hash must be the md5 of exactly the chunk text")
      }
    }
  }

  test("a one-character insert leaves every chunk after the next surviving boundary identical") {
    val rng = new Random(11)
    val texts = randomTexts(40).filter(_.length > 60)
    var exercised = 0
    texts.foreach { t =>
      val p = 2 + rng.nextInt(t.length - 2) // 1-based insert position >= 2
      val edited = t.substring(0, p - 1) + "z" + t.substring(p - 1)
      val Seq(orig, ed) = {
        val m = exprChunks(Seq(t, edited)); Seq(m(t), m(edited))
      }
      // first original boundary at or after the insert position survives
      // (all windows starting >= p are merely shifted by one)
      orig.map(_._1).find(_ >= p).foreach { b =>
        val tailOrig = orig.dropWhile(_._1 < b).map(c => (c._2, c._3))
        val tailEd = ed.dropWhile(_._1 < b + 1).map(c => (c._2, c._3))
        assert(tailOrig == tailEd,
          s"chunks after boundary $b must survive an insert at $p (${t.take(30)}…)")
        exercised += 1
      }
    }
    assert(exercised >= 20, s"property must actually fire (got $exercised cases)")
  }
}
