package graft.ops

import graft.SparkSpec

/** Independent pure-Scala reimplementation of the unigram-LM trainer spec
  * (imperative DP with explicit backpointers — a different shape from the
  * production per-level DataFrame pipeline), run against the REAL corpus:
  * agreement means the Spark pipeline implements the documented EM, not
  * merely itself. Mirrors the BpeSpec discipline. */
object UnigramModel {
  import UnigramOpsImpl.{EmIters, MaxWordLen, PieceMaxLen, Scale}

  def qp(cnts: Map[String, Long]): Map[String, Double] = {
    val tot = cnts.values.sum
    cnts.map { case (p, c) => p -> (c * Scale / tot).toDouble / Scale.toDouble }
  }

  /** Viterbi with explicit backpointers; ties prefer the smaller split j. */
  def segment(word: String, probs: Map[String, Double]): Seq[String] = {
    val n = word.length
    val best = new Array[Double](n + 1)
    val bp = new Array[Int](n + 1)
    val pc = new Array[String](n + 1)
    best(0) = 1.0
    for (i <- 1 to n) {
      best(i) = -1.0
      for (j <- math.max(0, i - PieceMaxLen) until i) {
        val piece = word.substring(j, i)
        probs.get(piece).foreach { q =>
          val sc = best(j) * q
          if (sc > best(i)) { best(i) = sc; bp(i) = j; pc(i) = piece }
        }
      }
    }
    var i = n
    var out = List.empty[String]
    while (i > 0) { out = pc(i) :: out; i = bp(i) }
    out
  }

  /** Full EM: returns (final counts, final segmentation per word). */
  def train(freqs: Map[String, Long]): (Map[String, Long], Map[String, Seq[String]]) = {
    val words = freqs.filter(_._1.length <= MaxWordLen)
    var cnts: Map[String, Long] = words.toSeq.flatMap { case (w, f) =>
      for {
        i <- 0 until w.length
        l <- 1 to math.min(PieceMaxLen, w.length - i)
      } yield (w.substring(i, i + l), f)
    }.groupMapReduce(_._1)(_._2)(_ + _)
    var segs = Map.empty[String, Seq[String]]
    for (_ <- 1 to EmIters) {
      val probs = qp(cnts)
      segs = words.keys.map(w => w -> segment(w, probs)).toMap
      val chosen = segs.toSeq.flatMap { case (w, ps) => ps.map(_ -> words(w)) }
        .groupMapReduce(_._1)(_._2)(_ + _)
      val zeros = cnts.keySet.filter(_.length == 1).map(_ -> 0L).toMap
      cnts = (zeros.toSeq ++ chosen.toSeq).groupMapReduce(_._1)(_._2)(_ + _)
    }
    (cnts, segs)
  }
}

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val freqs: Map[String, Long] =
    graft.Tables(spark, dir, "documents").select($"text").as[String].collect()
      .flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupMapReduce(identity)(_ => 1L)(_ + _)

  test("q138 learned vocabulary matches the independent model on the real corpus") {
    val (cnts, _) = UnigramModel.train(freqs)
    val got = UnigramOpsImpl.unigramVocab(spark, dir)
      .select($"piece", $"cnt").as[(String, Long)].collect().toMap
    assert(got == cnts, {
      val diff = (got.keySet ++ cnts.keySet)
        .filter(k => got.get(k) != cnts.get(k)).take(5)
      s"first diffs: ${diff.map(k => (k, got.get(k), cnts.get(k)))}"
    })
  }

  test("q139 per-document token counts match independently applied segmentations") {
    val (_, segs) = UnigramModel.train(freqs)
    val docs = graft.Tables(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val expect = docs.map { case (id, t) =>
      val ws = t.split(" ").filter(w => w.nonEmpty && segs.contains(w))
      (id, ws.length.toLong, ws.map(w => segs(w).size.toLong).sum)
    }.filter(_._2 > 0).sortBy(_._1).toSeq
    val got = UnigramOpsImpl.unigramEncode(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expect)
  }

  test("coverage invariant: every word segments (single chars never leave the vocab)") {
    val (cnts, segs) = UnigramModel.train(freqs)
    assert(segs.values.forall(_.nonEmpty))
    val chars = freqs.keySet.filter(_.length <= UnigramOpsImpl.MaxWordLen)
      .flatMap(_.toSeq).map(_.toString)
    assert(chars.subsetOf(cnts.keySet))
    UnigramOpsImpl.clearCaches()
  }
}
