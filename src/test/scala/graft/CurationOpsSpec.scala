package graft

import org.apache.spark.sql.functions._

/** Behavioral properties of the round-3 curation/ANN operators that the
  * value-equality oracle can't express: chunking must RECONSTRUCT the
  * original document, multi-probe recall must dominate single-probe, and
  * the repetition signals must equal an independent in-test recomputation.
  */
class CurationOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q39 chunks reconstruct every document exactly (coverage + overlap)") {
    import ops.TextOpsImpl.{ChunkSize, ChunkStride}
    val texts = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunks = ops.TextOpsImpl.chunkDocuments(spark, dir)
      .select(col("doc_id"), col("chunk_id"), col("chunk_start"), col("chunk_text"))
      .collect()
      .groupBy(_.getLong(0))
    assert(chunks.keySet == texts.keySet, "every document must chunk")
    chunks.foreach { case (docId, rows) =>
      val text = texts(docId)
      val sorted = rows.sortBy(_.getLong(1))
      // starts advance by exactly the stride and begin at 1
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(2) == i.toLong * ChunkStride + 1, s"doc $docId chunk $i start")
        assert(r.getString(3) ==
          text.substring((i * ChunkStride).min(text.length),
            (i * ChunkStride + ChunkSize).min(text.length)),
          s"doc $docId chunk $i content")
      }
      // full coverage: the last chunk reaches the end of the document
      val last = sorted.last
      assert(last.getLong(2) + last.getString(3).length - 1 >= text.length,
        s"doc $docId not covered to its end")
      // reconstruction: stitch chunks dropping the overlap
      val rebuilt = sorted.zipWithIndex.map { case (r, i) =>
        val t = r.getString(3)
        if (i == 0) t else t.substring((ChunkSize - ChunkStride).min(t.length))
      }.mkString
      assert(rebuilt == text, s"doc $docId reconstruction mismatch")
    }
  }

  test("q64 multi-probe search dominates single-probe at every rank") {
    val single = ops.VectorOpsImpl.ivfTopK(spark, dir)
      .select(col("query_id"), col("rn"), col("cosine")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val multi = ops.VectorOpsImpl.ivfMultiProbeTopK(spark, dir)
      .select(col("query_id"), col("rn"), col("cosine")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(multi.nonEmpty)
    // nprobe=2 candidates are a superset of nprobe=1, so the k-th best
    // cosine can only improve (or stay equal)
    single.foreach { case (key, c1) =>
      multi.get(key).foreach(c2 => assert(c2 >= c1, s"rank regressed at $key"))
    }
  }

  test("q67 keeps exactly one member per component, and it has the max quality") {
    val rows = ops.DedupOpsImpl.dedupKeepBest(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("component")).foreach { case (comp, members) =>
      val kept = members.filter(_.getAs[Boolean]("keep"))
      assert(kept.length == 1, s"component $comp must keep exactly one member")
      val maxQ = members.map(_.getAs[Double]("quality")).max
      assert(kept.head.getAs[Double]("quality") == maxQ,
        s"component $comp kept a non-best member")
    }
  }

  test("q71 content-defined chunks survive a prefix edit; fixed windows don't") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"w$i").mkString(" ") // ~270 chars
    val edited = "X" + base                             // one char inserted at front
    val tmp = java.nio.file.Files.createTempDirectory("cdcdocs").toString
    Seq((1L, base, "en", "t", base.length.toLong),
        (2L, edited, "en", "t", edited.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val chunks = ops.TextOpsImpl.contentDefinedChunks(spark, tmp)
      .select(col("doc_id"), col("chunk_md5")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    val shared = chunks(1L) & chunks(2L)
    // everything from the first post-edit boundary onward re-aligns: only
    // the leading chunk (whose content absorbed the edit) may differ
    assert(shared.size >= chunks(1L).size - 1,
      s"content-defined chunks must re-align after the edit: ${chunks(1L).size} vs shared ${shared.size}")
    assert(chunks(1L).size > 2, "expected several chunks for a ~270-char doc")
  }

  test("q48 repetition signals match an independent recomputation") {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = ops.TextOpsImpl.repetitionSignals(spark, dir).collect()
    assert(got.length == docs.size)
    got.take(50).foreach { r =>
      val text = docs(r.getLong(0))
      val toks = text.split(" ", -1).toSeq
      val tf = toks.groupBy(identity).view.mapValues(_.size)
      val (topTok, topN) = tf.toSeq.minBy { case (t, n) => (-n, t) }
      val bigrams = toks.zip(toks.tail).map { case (a, b) => s"$a $b" }
      val bf = bigrams.groupBy(identity).view.mapValues(_.size)
      val (topBi, topBiN) = bf.toSeq.minBy { case (t, n) => (-n, t) }
      assert(r.getAs[Long]("n_tok") == toks.size.toLong)
      assert(r.getAs[Long]("n_distinct") == tf.size.toLong)
      assert(r.getAs[String]("top_tok") == topTok)
      assert(r.getAs[Long]("top_tok_n") == topN.toLong)
      assert(r.getAs[String]("top_bigram") == topBi)
      assert(r.getAs[Long]("top_bigram_n") == topBiN.toLong)
    }
  }
}
