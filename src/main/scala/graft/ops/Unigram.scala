package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}

import graft.{Q, Tables}

/** Unigram-LM (SentencePiece-style) tokenizer learning — the OTHER
  * production tokenizer family next to BPE (q129/q130): a vocabulary of
  * subword pieces with probabilities, fit by fixed-iteration Viterbi
  * (hard) EM. Seed the piece inventory with every substring of the corpus
  * vocabulary up to [[PieceMaxLen]] chars (single chars guarantee
  * coverage, the SentencePiece invariant); each EM round then (E) segments
  * every word by Viterbi under the current piece probabilities and (M)
  * re-estimates each piece's count as the frequency-weighted number of
  * times the best segmentations chose it. q138 ships the learned
  * vocabulary (piece, count, quantized prob) — the artifact a unigram
  * tokenizer serializes; q139 applies it, producing per-document token
  * counts — directly comparable with BPE's q130 for tokenizer selection.
  *
  * Scale shape: identical to BPE — ONE corpus-sized aggregation builds the
  * (word, freq) vocabulary, and everything after runs on vocab-scale rows
  * (millions at 100 TB, metadata next to the corpus). The Viterbi DP is
  * [[MaxWordLen]] position-levels, each a capped union of ≤ [[PieceMaxLen]]
  * previous levels joined to the piece table and reduced by a per-word
  * window — all vocab-sized, materialized per level with `localCheckpoint`
  * (the BPE loop discipline) so plans stay constant-depth instead of
  * expanding 4^16 chains. Encoding re-joins per-word piece counts to the
  * exploded corpus on the word equi-key — the only corpus-sized work.
  *
  * Determinism (both engines bitwise-equal): piece probabilities are
  * floor-quantized to 1/[[Scale]] via INTEGER division before the cast to
  * double, and a segmentation's score is the left-associated IEEE product
  * of its pieces' quantized probs in position order — the same chain both
  * engines evaluate, so Viterbi comparisons agree bitwise. Ties break on
  * the smaller split point j (prefer the longer final piece), a total
  * engine-independent order. Words longer than [[MaxWordLen]] are excluded
  * from learning and encoding in both engines (none exist in the
  * testdata; at scale this is the standard rare-pathology clip).
  */
object UnigramOpsImpl {

  /** Longest seed piece (chars). */
  val PieceMaxLen = 4
  /** Viterbi DP unroll budget; longer words are clipped in both engines. */
  val MaxWordLen = 16
  /** Fixed EM rounds (hard EM: Viterbi E-step, count M-step). */
  val EmIters = 2
  /** Probability quantum denominator: qp = (cnt·Scale div total) / Scale. */
  val Scale = 1000000L

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (DataFrame, DataFrame)]()

  def clearCaches(): Unit =
    graft.ops.Memo.clearAny(cache) { case (seg, cnts) => Seq(seg, cnts) }

  /** The corpus vocabulary (word, freq, n), checkpointed. */
  private def vocab(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .filter(length(col("word")) <= MaxWordLen)
      .select(col("word"), col("freq"), length(col("word")).cast(LongType).as("n"))

  /** Quantized piece probabilities: one scalar-broadcast total, integer
    * floor division, then the double cast — exact in both engines. */
  private def qpOf(cnts: DataFrame): DataFrame = {
    val tot = cnts.agg(sum(col("cnt")).as("tot"))
    cnts.crossJoin(broadcast(tot))
      .select(col("piece"),
        expr(s"CAST((cnt * $Scale) div tot AS DOUBLE) / CAST($Scale AS DOUBLE)")
          .as("qp"))
  }

  /** One Viterbi pass: best segmentation of every word under `qpDf`.
    * Returns (word, freq, segs) checkpointed; all per-level working
    * blocks are freed before returning. */
  private def viterbi(s: SparkSession, v: DataFrame, qpDf: DataFrame,
      maxN: Int): DataFrame = {
    val qp = qpDf.localCheckpoint() // referenced once per level — materialize
    val levels = scala.collection.mutable.ArrayBuffer[DataFrame](
      v.select(col("word"), col("freq"), col("n"), lit(1.0).as("score"),
        array().cast(ArrayType(StringType)).as("segs")).localCheckpoint())
    for (i <- 1 to maxN) {
      val cands = (math.max(0, i - PieceMaxLen) until i).map { j =>
        levels(j).filter(col("n") >= i)
          .withColumn("piece", expr(s"substr(word, ${j + 1}, ${i - j})"))
          .withColumn("j", lit(j.toLong))
      }.reduce(_ union _)
        .join(qp, "piece")
        .select(col("word"), col("freq"), col("n"), col("j"),
          (col("score") * col("qp")).as("score"),
          concat(col("segs"), array(col("piece"))).as("segs"))
      val w = Window.partitionBy(col("word")).orderBy(col("score").desc, col("j").asc)
      levels += cands.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("word"), col("freq"), col("n"), col("score"), col("segs"))
        .localCheckpoint()
    }
    val seg = (1 to maxN).map(i =>
        levels(i).filter(col("n") === i)
          .select(col("word"), col("freq"), col("segs")))
      .reduce(_ union _).localCheckpoint()
    (levels :+ qp).foreach(graft.ops.Memo.unpersistAll)
    seg
  }

  /** Memoized EM run: (final segmentations, final piece counts). */
  private def learned(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    graft.ops.Memo.getOrCacheAny(cache, s, dir, { _ =>
      val v = vocab(s, dir).localCheckpoint()
      // seed counts: every substring occurrence, weighted by word freq
      val s1 = v.select(col("word"), col("freq"),
        explode(sequence(lit(1), length(col("word")))).as("i"))
      val s2 = s1.select(col("word"), col("freq"), col("i"),
        explode(sequence(lit(1),
          least(lit(PieceMaxLen), length(col("word")) - col("i") + 1))).as("l"))
      var cnts = s2.select(expr("substr(word, i, l)").as("piece"), col("freq"))
        .groupBy(col("piece")).agg(sum(col("freq")).cast(LongType).as("cnt"))
        .localCheckpoint()
      // levels past the longest word are empty in both engines; the Spark
      // loop skips them (the oracle's fixed unroll leaves them vacuously
      // empty). A metadata-sized driver probe, like the centroid collects.
      val maxN = math.min(MaxWordLen.toLong,
        v.agg(max(col("n"))).head().getLong(0)).toInt
      var seg: DataFrame = null
      for (_ <- 1 to EmIters) {
        val nextSeg = viterbi(s, v, qpOf(cnts), maxN)
        if (seg != null) graft.ops.Memo.unpersistAll(seg)
        seg = nextSeg
        // M-step: chosen-piece counts; single chars persist at zero so
        // coverage never degrades (the SentencePiece invariant)
        val chosen = seg.select(explode(col("segs")).as("piece"),
          col("freq").cast(LongType).as("cnt"))
        val zeros = cnts.filter(length(col("piece")) === 1)
          .select(col("piece"), lit(0L).as("cnt"))
        cnts = graft.ops.Memo.roll(cnts,
          chosen.union(zeros).groupBy(col("piece"))
            .agg(sum(col("cnt")).cast(LongType).as("cnt")).localCheckpoint())
      }
      graft.ops.Memo.unpersistAll(v)
      (seg, cnts)
    })

  /** q138: the learned vocabulary — (piece, cnt, qp). */
  def unigramVocab(s: SparkSession, dir: String): DataFrame = {
    val (_, cnts) = learned(s, dir)
    cnts.join(qpOf(cnts), "piece")
      .select(col("piece"), col("cnt"), col("qp"))
      .orderBy(col("piece"))
  }

  /** q139: per-document token counts under the learned vocabulary. */
  def unigramEncode(s: SparkSession, dir: String): DataFrame = {
    val (seg, _) = learned(s, dir)
    val tok = seg.select(col("word"), size(col("segs")).cast(LongType).as("n_tok"))
    val cw = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
    // tok is the learned per-WORD segmentation — an O(vocab) dictionary;
    // broadcast it so the exploded corpus is never shuffled on a
    // vocabulary-cardinality key
    cw.join(broadcast(tok), "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_tok")).cast(LongType).as("n_tokens"))
      .orderBy(col("doc_id"))
  }
}

object UnigramOps {
  import UnigramOpsImpl._

  /** The fully unrolled DuckDB mirror: seed, then per round — quantized
    * probs, MaxWordLen DP levels (each the capped union of up to
    * PieceMaxLen predecessor levels), segmentation pick, count M-step.
    * `AS MATERIALIZED` pins DuckDB to the same materialize-per-level
    * evaluation the Spark side uses (inlining 4^16 level chains is as
    * fatal there as it is in Catalyst). */
  private def dpRound(t: Int): Seq[String] = {
    val qp =
      s"""q$t AS MATERIALIZED (SELECT piece,
         |  CAST((cnt * $Scale) // (SELECT SUM(cnt) FROM c$t) AS DOUBLE) / CAST($Scale AS DOUBLE) AS qp
         |  FROM c$t)""".stripMargin
    val b0 =
      s"b${t}_0 AS MATERIALIZED (SELECT word, freq, n, CAST(1.0 AS DOUBLE) AS score, []::VARCHAR[] AS segs FROM v)"
    val lvls = (1 to MaxWordLen).map { i =>
      val cand = (math.max(0, i - PieceMaxLen) until i).map { j =>
        s"""SELECT word, freq, n, $j AS j, score * qp AS score, list_concat(segs, [piece]) AS segs
           |FROM (SELECT b.*, substr(word, ${j + 1}, ${i - j}) AS piece
           |      FROM b${t}_$j b WHERE n >= $i) x JOIN q$t USING (piece)""".stripMargin
      }.mkString(" UNION ALL ")
      s"""b${t}_$i AS MATERIALIZED (SELECT word, freq, n, score, segs FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY word ORDER BY score DESC, j ASC) AS rn
         |  FROM ($cand) c) z WHERE rn = 1)""".stripMargin
    }
    val seg = (1 to MaxWordLen)
      .map(i => s"SELECT word, freq, segs FROM b${t}_$i WHERE n = $i")
      .mkString(" UNION ALL ")
    val m =
      s"""c${t + 1} AS MATERIALIZED (SELECT piece, CAST(SUM(cnt) AS BIGINT) AS cnt FROM (
         |  SELECT piece, freq AS cnt FROM (SELECT freq, unnest(segs) AS piece FROM seg$t) u
         |  UNION ALL SELECT piece, 0 AS cnt FROM c$t WHERE length(piece) = 1) g GROUP BY piece)""".stripMargin
    Seq(qp, b0) ++ lvls ++ Seq(s"seg$t AS MATERIALIZED ($seg)", m)
  }

  private def ctes: String = {
    val base = Seq(
      "w AS (SELECT word, COUNT(*) AS freq FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) x WHERE word <> '' GROUP BY word)",
      s"v AS MATERIALIZED (SELECT word, freq, CAST(length(word) AS BIGINT) AS n FROM w WHERE length(word) <= $MaxWordLen)",
      "s1 AS (SELECT word, freq, CAST(unnest(generate_series(1, length(word))) AS BIGINT) AS i FROM v)",
      s"s2 AS (SELECT word, freq, i, CAST(unnest(generate_series(1, least($PieceMaxLen, length(word) - i + 1))) AS BIGINT) AS l FROM s1)",
      "c1 AS MATERIALIZED (SELECT substr(word, CAST(i AS INT), CAST(l AS INT)) AS piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM s2 GROUP BY 1)")
    (base ++ (1 to EmIters).flatMap(dpRound)).mkString(",\n")
  }

  private def vocabSql: String = {
    val f = EmIters + 1
    s"""WITH $ctes
       |SELECT c$f.piece AS piece, c$f.cnt AS cnt,
       |  CAST((c$f.cnt * $Scale) // (SELECT SUM(cnt) FROM c$f) AS DOUBLE) / CAST($Scale AS DOUBLE) AS qp
       |FROM c$f ORDER BY piece""".stripMargin
  }

  private[graft] def encodeSql: String =
    s"""WITH $ctes,
       |tok AS (SELECT word, CAST(len(segs) AS BIGINT) AS n_tok FROM seg$EmIters),
       |cw AS (SELECT doc_id, word FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) x WHERE word <> '')
       |SELECT cw.doc_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(tok.n_tok) AS BIGINT) AS n_tokens
       |FROM cw JOIN tok ON cw.word = tok.word
       |GROUP BY cw.doc_id ORDER BY doc_id""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("q138_text_unigram_vocab", unigramVocab, Some(vocabSql)),
    Q("q139_text_unigram_encode", unigramEncode, Some(encodeSql)))
}
