package graft.streaming

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** INCREMENTAL near-duplicate detection: the batch MinHash-LSH banding
  * (`DedupOpsImpl.minhashSignatures`/`minhashLsh` — same 3-token shingles,
  * same two-md5 8-lane signatures, same 4 × 2-lane banding, same bucket
  * cap) applied to a STREAM. Each arriving document hashes to its 4 band
  * buckets; keyed state holds the documents already seen in each bucket,
  * and the new arrival is emitted as a candidate pair against each of
  * them. A curation pipeline runs exact verification (or routes to
  * quarantine) on the candidates only — the streaming half of the same
  * candidates-then-verify design the batch operators use.
  *
  * Scale/state design: state per bucket is ≤ `cap` doc ids (the batch
  * BucketCap discipline — an over-full LSH bucket is boilerplate
  * collision, not near-duplication, so it stops admitting and emitting
  * rather than going quadratic). The shuffle key is (band, bucket-hash) —
  * high cardinality, uniformly md5-distributed, so state and work spread
  * evenly across executors. [[candidatePairsWindowed]] adds the event-time
  * timeout an infinite stream needs: buckets age out with the dedup
  * window, so live-bucket count is bounded by the window's arrival volume
  * instead of growing forever (the hard cap alone bounds memory per bucket
  * but not the bucket count).
  *
  * Two key families share the machinery: MinHash bands over text
  * ([[bandKeys]] — the batch q42 semantics) and sign-LSH bands over
  * embeddings ([[embedBandKeys]] — the batch q56 semantics), so both text
  * near-dup and vector near-dup run incrementally.
  */
object StreamDedup {

  final case class DocBand(band: Int, bh: String, docId: Long)
  final case class TimedDocBand(band: Int, bh: String, docId: Long, ts: java.sql.Timestamp)
  final case class CandidatePair(aId: Long, bId: Long, band: Int)
  final case class BucketState(ids: Seq[Long])
  final case class WindowedBucketState(ids: Seq[Long], maxTsMs: Long)

  val Bands = 4
  val DefaultCap = 50

  private def md5hex(md: MessageDigest, s: String): String =
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The pure-Scala mirror of the batch signature SQL: distinct 3-token
    * shingles, d1 = md5(sh), d2 = md5("1:" + sh), lane i = min 8-hex-char
    * window, band key = md5(h(2b) ++ h(2b+1)). A doc with < 3 tokens has no
    * shingles and therefore no bands (the batch groupBy drops it too). */
  def bandKeys(docId: Long, text: String): Seq[DocBand] = {
    val toks = text.split(" ", -1)
    if (toks.length < 3) return Seq.empty
    val md = MessageDigest.getInstance("MD5")
    val shingles = toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
    // "g" sorts after every hex window ([0-9a-f]*), so it is the identity
    // for the lexicographic min
    val lanes = Array.fill(8)("g")
    shingles.foreach { sh =>
      val d1 = md5hex(md, sh)
      val d2 = md5hex(md, "1:" + sh)
      (0 until 8).foreach { i =>
        val w = (if (i < 4) d1 else d2).substring(8 * (i % 4), 8 * (i % 4) + 8)
        if (w < lanes(i)) lanes(i) = w
      }
    }
    (0 until Bands).map(b => DocBand(b, md5hex(md, lanes(2 * b) + lanes(2 * b + 1)), docId))
  }

  /** Sign-LSH band keys for an embedding — the pure-Scala mirror of the
    * batch `VectorOpsImpl.bandedSignatures` (q56): 16-bit signature from
    * the shared deterministic hyperplanes (projections accumulated in the
    * same left-associative IEEE order as the unrolled SQL, so signatures
    * are bitwise identical), split into 4 disjoint 4-bit bands. */
  def embedBandKeys(vecId: Long, emb: Array[Float],
      bands: Int = graft.ops.VectorOpsImpl.NearDupBands,
      bandBits: Int = graft.ops.VectorOpsImpl.NearDupBandBits): Seq[DocBand] = {
    val hp = graft.ops.VectorOpsImpl.hyperplanes
    var sig = 0L
    (0 until 16).foreach { j =>
      var p = 0.0
      var i = 0
      while (i < emb.length) { p += hp(j)(i) * emb(i).toDouble; i += 1 }
      if (p > 0.0) sig |= (1L << j)
    }
    val mask = (1L << bandBits) - 1
    (0 until bands).map(b => DocBand(b, ((sig >> (b * bandBits)) & mask).toString, vecId))
  }

  /** Streaming candidate pairs over a (docId, text) stream. Emits each
    * (smaller, larger) id pair once PER BAND it collides in — downstream
    * dedups with `dropDuplicates` or verifies idempotently, exactly like
    * the batch path's `.distinct()`. */
  def candidatePairs(docs: Dataset[(Long, String)],
      cap: Int = DefaultCap): Dataset[CandidatePair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    pairsFromBands(docs.flatMap { case (id, text) => bandKeys(id, text) }, cap)
  }

  /** Streaming EMBEDDING near-dup candidates over a (vecId, embedding)
    * stream — the vector sibling of [[candidatePairs]], banded sign-LSH
    * instead of MinHash bands, same bucket state and cap discipline. */
  def candidatePairsEmbedding(vecs: Dataset[(Long, Array[Float])],
      cap: Int = DefaultCap): Dataset[CandidatePair] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    pairsFromBands(vecs.flatMap { case (id, emb) => embedBandKeys(id, emb) }, cap)
  }

  private def pairsFromBands(banded: Dataset[DocBand], cap: Int): Dataset[CandidatePair] = {
    val spark = banded.sparkSession
    import spark.implicits._
    banded
      .groupByKey(db => (db.band, db.bh))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Int, String), rows: Iterator[DocBand], state: GroupState[BucketState]) =>
          var ids = state.getOption.map(_.ids).getOrElse(Seq.empty)
          val out = Seq.newBuilder[CandidatePair]
          rows.foreach { db =>
            if (!ids.contains(db.docId) && ids.size < cap) {
              ids.foreach { e =>
                out += CandidatePair(math.min(e, db.docId), math.max(e, db.docId), key._1)
              }
              ids = ids :+ db.docId
            }
          }
          state.update(BucketState(ids))
          out.result().iterator
      }
  }

  /** [[candidatePairs]] with an EVENT-TIME TTL — the production form for an
    * infinite stream: each bucket's state expires once the watermark passes
    * `max event time seen in the bucket + dedupWindowMs`, so documents only
    * pair with documents from the same dedup window and live-bucket count
    * is bounded by the window's arrival volume. Expired buckets emit
    * nothing and are removed; a later arrival re-opens the bucket fresh
    * (no pairs across the window boundary — that IS the window semantics).
    *
    * @param docs             (docId, text, eventTime) stream
    * @param dedupWindowMs    how long a document stays pair-able
    * @param watermarkDelayMs max accepted event-time lateness
    */
  def candidatePairsWindowed(docs: Dataset[(Long, String, java.sql.Timestamp)],
      dedupWindowMs: Long, watermarkDelayMs: Long = 0,
      cap: Int = DefaultCap): Dataset[CandidatePair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .flatMap { case (id, text, ts) =>
        bandKeys(id, text).map(db => TimedDocBand(db.band, db.bh, db.docId, ts))
      }
      .withWatermark("ts", s"$watermarkDelayMs milliseconds")
      .groupByKey(db => (db.band, db.bh))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Int, String), rows: Iterator[TimedDocBand],
            state: GroupState[WindowedBucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val st = state.getOption.getOrElse(WindowedBucketState(Seq.empty, 0L))
            var ids = st.ids
            var maxTs = st.maxTsMs
            val out = Seq.newBuilder[CandidatePair]
            rows.foreach { db =>
              maxTs = math.max(maxTs, db.ts.getTime)
              if (!ids.contains(db.docId) && ids.size < cap) {
                ids.foreach { e =>
                  out += CandidatePair(math.min(e, db.docId), math.max(e, db.docId), key._1)
                }
                ids = ids :+ db.docId
              }
            }
            state.update(WindowedBucketState(ids, maxTs))
            // expire when the watermark passes the window after the LAST
            // arrival; clamp above the current watermark (a timeout in the
            // past is rejected by the state store)
            state.setTimeoutTimestamp(
              math.max(maxTs + dedupWindowMs, state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }

  /** The EXACT-verify stage that completes candidates-then-verify: compute
    * true 3-token-shingle Jaccard for each candidate pair against the
    * document store and keep pairs ≥ `threshold`. Runs per micro-batch
    * inside `foreachBatch` (or as a plain batch job): the join touches
    * only candidate ids × their two documents, never pairs the corpus.
    * Same shingle semantics as `DedupOpsImpl.shingles`/`ngramJaccard`, so
    * a pair verified here is exactly a pair q41 would report.
    *
    * @param pairs distinct candidate pairs with columns (aId, bId)
    * @param docs  document store with columns (doc_id, text)
    */
  def verifyExact(pairs: DataFrame, docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val sh = docs
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"),
        explode(expr(
          """array_distinct(filter(transform(sequence(1, size(toks)),
            |  i -> concat(try_element_at(toks, i), ' ', try_element_at(toks, i + 1),
            |              ' ', try_element_at(toks, i + 2))),
            |  x -> x IS NOT NULL))""".stripMargin)).as("sh"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val p = pairs.select(col("aId"), col("bId")).distinct()
    // equi-join on (bId, sh): the shared-shingle count is computed by hash
    // join on the shingle key, never by crossing the two shingle sets
    val inter = p
      .join(sh.select(col("doc_id").as("aId"), col("sh")), "aId")
      .join(sh.select(col("doc_id").as("bId"), col("sh")), Seq("bId", "sh"))
      .groupBy(col("aId"), col("bId")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("aId"), col("n").as("na")), "aId")
      .join(sizes.select(col("doc_id").as("bId"), col("n").as("nb")), "bId")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("aId"), col("bId"), col("jaccard"))
  }
}
