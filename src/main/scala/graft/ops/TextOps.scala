package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting (whitespace + regex), quality scoring, language-ID heuristic,
  * and document fingerprinting. All are per-row narrow transforms — they
  * parallelize embarrassingly at 100 TB (no shuffle; filters/projections
  * push into the parquet scan) and stay inside WholeStageCodegen.
  *
  * Cross-engine determinism: token math is integer-exact; fingerprints use
  * md5 hex strings (identical output in Spark and DuckDB; lexicographic min
  * over fixed-width lowercase hex equals numeric min, so no integer-hash
  * conversion is ever needed).
  */
object TextOpsImpl {

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
  private def inList(xs: Seq[String]) = xs.map(s => s"'$s'").mkString("(", ", ", ")")
  /** The stopword set as a SQL IN-list — shared with [[LrOpsImpl]] so the
    * trained classifier's features stay bit-identical to q82's. */
  val stopwordsInList: String = inList(stopwords)

  def tokenCounts(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id"),
      length(col("text")).cast(LongType).as("n_chars"),
      expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n_ws_tokens"),
      expr("CAST(size(regexp_extract_all(text, '[a-z0-9]+', 0)) AS BIGINT)").as("n_re_tokens"))
      .orderBy(col("doc_id"))

  /** Quality score from length / token stats / stopword ratio — the usual
    * cheap pre-filter before expensive dedup or embedding stages. */
  def qualityScore(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("toks")).cast(LongType))
      .withColumn("n_stop",
        expr(s"CAST(size(filter(toks, x -> x IN ${inList(stopwords)})) AS BIGINT)"))
      .select(
        col("doc_id"),
        col("n_tok"),
        col("n_stop"),
        (col("n_stop").cast(DoubleType) / col("n_tok")).as("stop_ratio"),
        ((length(col("text")).cast(DoubleType) - (col("n_tok") - lit(1L))) / col("n_tok"))
          .as("avg_tok_len"),
        // score: prefer mid-length docs with moderate stopword density
        (least(col("n_tok").cast(DoubleType) / 50.0, lit(1.0)) * 0.5
          + (lit(1.0) - col("n_stop").cast(DoubleType) / col("n_tok")) * 0.5).as("quality"))
      .orderBy(col("doc_id"))

  /** Marker-token language-ID heuristic (n-gram-family approach: score each
    * candidate language by marker hits, argmax with fixed priority). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "de" -> Seq("der", "die", "das", "und", "ist"))

  def languageId(s: SparkSession, dir: String): DataFrame = {
    val df = Tables(s, dir, "documents").withColumn("toks", split(col("text"), " "))
    val scored = langMarkers.foldLeft(df) { case (d, (lang, markers)) =>
      d.withColumn(s"score_$lang",
        expr(s"CAST(size(filter(toks, x -> x IN ${inList(markers)})) AS BIGINT)"))
    }
    scored.select(
      col("doc_id"),
      col("score_en"), col("score_es"), col("score_de"),
      when(greatest(col("score_en"), col("score_es"), col("score_de")) === 0, "und")
        .when(col("score_en") >= col("score_es") && col("score_en") >= col("score_de"), "en")
        .when(col("score_es") >= col("score_de"), "es")
        .otherwise("de").as("pred_lang"))
      .orderBy(col("doc_id"))
  }

  /** Corpus term statistics: top-5 most frequent tokens per language —
    * explode + two-level aggregation + per-group top-k, the shape of any
    * corpus-frequency report (vocab building, stopword discovery).
    *
    * The top-k runs through the custom TopKPerKey physical operator
    * (graft.plans.TopK), not `row_number().over(Window.partitionBy(lang))`:
    * `lang` has ~3 distinct values, so the window form ships the ENTIRE
    * (lang, tok) frequency table to ≤3 reducers and fully sorts it — a
    * guaranteed straggler at 100 TB. TopKPerKey keeps bounded per-key heaps
    * with a map-side partial, so ≤ 5 rows per lang per partition cross the
    * shuffle regardless of vocabulary size. */
  def topTermsPerLang(s: SparkSession, dir: String): DataFrame = {
    val tf = Tables(s, dir, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("tf"))
    graft.plans.TopK.topKPerKey(tf, 5, Seq("lang"),
        Seq(graft.plans.TopK.desc("tf"), graft.plans.TopK.asc("tok")))
      .select(col("lang"), col("rank").as("rn"), col("tok"), col("tf"))
      .orderBy(col("lang"), col("rn"))
  }

  /** Document fingerprint: minimum md5 over character 5-gram shingles
    * (winnowing-style content signature, stable under reordering of
    * surrounding content). Native expression (graft.expr.MinShingleMd5):
    * the HOF `array_min(transform(sequence(...), i -> md5(substr(...))))`
    * form evaluated an interpreted lambda per shingle and allocated a
    * 32-char hex string per shingle; the native walk hashes each window
    * in place and keeps a running 16-byte min — bitwise-identical output
    * (MinShingleMd5Spec pins it against the HOF text). */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id"),
      expr("minshinglemd5(text, 5)").as("fp"))
      .orderBy(col("doc_id"))

  /** Winnowing parameters: word-3-gram hashes (k), selection window (w).
    * The scheme guarantees any shared token run of length ≥ k + w - 1 = 6
    * yields at least one shared fingerprint (Schleimer, Wilkerson & Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    * 2003). */
  val WinnowK = 3
  val WinnowW = 4
  val WinnowDfCap = 20
  val WinnowMinShared = 2

  /** Winnowing fingerprints: the minimum 3-gram hash of every w-length
    * hash window, deduplicated — position-robust LOCAL fingerprints (a
    * shared passage fingerprints identically wherever it sits in the doc),
    * the passage-granular complement of q33's one-per-doc global min-hash.
    *
    * Scale shape: the only shuffle is the doc_id window, and it ships
    * (doc_id, pos, 32-char hash) rows — O(len) bytes per doc, never the
    * text itself; the per-doc sort is doc-scoped. Selection keeps ~2/(w+1)
    * of positions, so downstream consumers see a 60 %-smaller index than
    * raw shingles. */
  /** Memoized CACHED winnow-fingerprint view per (session, dir): q101 and
    * both sides of q102's pair join (plus its DF filter) read it, so one
    * materialization serves four plan subtrees — the fingerprint set IS the
    * index a production pipeline persists once per corpus snapshot.
    * Invalidation: [[clearCaches]], like the shingle/IVF/PQ memos. */
  private val winnowCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def winnowIndex(s: SparkSession, dir: String): DataFrame =
    graft.ops.Memo.getOrCache(winnowCache, s, dir, { d =>
      // Native per-document winnowing (graft.expr.WinnowFps): hash, window-
      // min, full-window selection and per-doc dedup all happen inside one
      // codegen'd narrow projection — the round-15 plan posexploded O(len)
      // (doc_id, pos, hash) rows, shuffled them into a per-doc Window for
      // the running min and ran a global DISTINCT (two shuffles + an
      // interpreted md5 HOF per shingle; index:text_winnow burned 22 s of
      // task CPU at sf0.1 for 1.6 s of wall). Set-identical output —
      // WinnowFps' scaladoc carries the parity argument, WinnowFpsSpec pins
      // it row-for-row against the old windowed plan, and q101/q102/q88
      // stay oracle-green.
      graft.expr.WinnowFps.register(s)
      Tables(s, d, "documents")
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= WinnowK)
        .select(col("doc_id"),
          explode(expr(s"winnowfps(toks, $WinnowK, $WinnowW)")).as("fp"))
        .cache()
    })

  /** Unpersist and drop the memoized winnow index. */
  def clearCaches(): Unit = {
    graft.ops.Memo.clear(winnowCache)
    graft.ops.Memo.clear(unigramStatsCache)
  }

  /** Memoized CHECKPOINTED unigram statistics table — per token: corpus
    * occurrence count and per-source counts pivoted as a map. This is the
    * materialized artifact every unigram-LM consumer (q91 scoring, q95
    * DSIR, q96 drift) derives its distributions and totals from: one
    * corpus explode+aggregate builds it, and each consumer's totals /
    * marginals are vocab-bounded rollups of the checkpointed rows.
    * (Exchange reuse cannot dedupe these consumers' branches — their
    * differently-shaped joins push different constraints into each copy of
    * the aggregate, breaking canonical identity; a persisted vocab-sized
    * table is also the honest 100 TB shape, where the unigram LM is an
    * artifact you store next to the tokenizer, not a subtree you hope the
    * optimizer dedupes.) Rows = |vocab| — metadata at any realistic
    * vocabulary. */
  private[graft] def unigramStats(s: SparkSession, dir: String): DataFrame =
    graft.ops.Memo.getOrCache(unigramStatsCache, s, dir, { _ =>
      Tables(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok"), col("source"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("tok"))
        .agg(sum(col("c")).as("tf"),
          map_from_entries(collect_list(struct(col("source"), col("c"))))
            .as("by_source"))
        .localCheckpoint()
    })

  private val unigramStatsCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def winnowFingerprints(s: SparkSession, dir: String): DataFrame =
    winnowIndex(s, dir).orderBy(col("doc_id"), col("fp"))

  /** Shared-passage detection over winnowing fingerprints — the MOSS use:
    * doc pairs sharing ≥ [[WinnowMinShared]] fingerprints, i.e. pairs with
    * at least that many independent ≥ 6-token common runs. The join key is
    * DF-capped exactly like the rare-shingle Jaccard join (stop-passage
    * fingerprints would go quadratic); cost is Σ min(df, cap)² over
    * fingerprints, never all-pairs. */
  def winnowSharedPassages(s: SparkSession, dir: String): DataFrame = {
    val fp = winnowIndex(s, dir)
    val rare = fp.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= WinnowDfCap).select("fp")
    val keyed = fp.join(rare, "fp")
    keyed.as("a").join(keyed.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= WinnowMinShared)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** TF-IDF top-3 terms per document — the vocabulary-weighting step of
    * corpus analysis / keyword extraction. Two hash aggregations (term
    * frequency, document frequency) + one equi-join on the term + a
    * broadcast of the single-row corpus size; the per-doc top-k window
    * partitions on doc_id (high cardinality → no straggler reducer, unlike
    * the per-lang case that needs TopKPerKey). IDF is the plain ratio
    * n_docs/df rather than a logarithm: +,*,/ are IEEE-correctly-rounded in
    * every engine, while ln() is libm-dependent — so results stay bitwise
    * cross-engine comparable (same reasoning as Det.dsum). */
  def tfidfTopTerms(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val tf = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "tok").crossJoin(broadcast(total))
      .withColumn("tfidf", col("tf").cast(DoubleType)
        * (col("n_docs").cast(DoubleType) / col("df").cast(DoubleType)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("tok"))
    scored.withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("rn"), col("tok"), col("tf"), col("df"), col("tfidf"))
      .orderBy(col("doc_id"), col("rn"))
  }

  /** Deterministic stratified sampling for training-data mixture control:
    * a stable per-doc hash byte (two md5 hex nibbles — portable across
    * engines via the strpos alphabet trick) compared against a per-language
    * rate threshold. Zero shuffle, zero RNG state: any worker, any retry,
    * any engine draws the SAME sample — the property that matters when a
    * 100 TB mixture must be reproducible across reruns and backfills
    * (Spark's df.sample is seed-stable only within one partitioning). */
  val SampleThresholds: Seq[(String, Int)] = Seq("en" -> 128, "es" -> 64, "de" -> 32)

  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val byteExpr =
      "(instr('0123456789abcdef', substr(md5(concat('smp:', CAST(doc_id AS STRING))), 1, 1)) - 1) * 16" +
        " + (instr('0123456789abcdef', substr(md5(concat('smp:', CAST(doc_id AS STRING))), 2, 1)) - 1)"
    val threshold = SampleThresholds.foldRight(lit(256): Column) { case ((l, t), acc) =>
      when(col("lang") === l, t).otherwise(acc)
    }
    Tables(s, dir, "documents")
      .withColumn("bucket", expr(s"CAST($byteExpr AS BIGINT)"))
      .withColumn("threshold", threshold.cast(LongType))
      .filter(col("bucket") < col("threshold"))
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy(col("doc_id"))
  }

  /** Training-sequence packing: assign documents to fixed-token-budget bins
    * (512 here) in deterministic corpus order, per language shard — the
    * batch-construction step before tokenized examples are concatenated
    * into fixed-length training sequences. Reuses the closed-form
    * size-bounded packer (Cdc.packBySize): one shuffle on the shard key, a
    * running-sum window per shard, no driver loop — the same operator that
    * packs CDC messages packs token budgets. */
  def sequencePacking(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents").select(
      col("doc_id"), col("lang"),
      expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n_tok"))
    graft.cdc.Cdc.packBySize(docs, col("lang"), col("doc_id"), col("n_tok"), 512L)
      .select(col("doc_id"), col("lang"), col("n_tok"), col("message_bin").as("bin"))
      .orderBy(col("lang"), col("doc_id"))
  }

  /** EXACT token-length quantiles per language (p50/p90/p99, linear
    * interpolation at rank (n−1)·p) — corpus length profiling for curation
    * thresholds. The scale trick: quantiles are computed from the VALUE
    * HISTOGRAM, not the rows — one shuffle on (lang, value) distinct pairs,
    * then a window over distinct values per language (thousands of rows,
    * not the corpus), each value covering rank range (cum−c, cum]. Exact
    * results without ever sorting the corpus per key; the usual alternative
    * at 100 TB is approx_percentile, which trades exactness — this one
    * doesn't have to. Interpolation uses only +,−,×,/ on doubles
    * (IEEE-correctly-rounded in every engine). */
  def lengthQuantiles(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val t = Tables(s, dir, "documents").select(col("lang"),
      expr("CAST(size(split(text, ' ')) AS BIGINT)").as("v"))
    val vc = t.groupBy(col("lang"), col("v")).agg(count(lit(1)).as("c"))
    val cum = vc
      .withColumn("cum", sum(col("c")).over(w.partitionBy(col("lang")).orderBy(col("v"))))
      .withColumn("n", sum(col("c")).over(w.partitionBy(col("lang"))))
    def loHi(tag: String, p: Double): Seq[Column] = {
      val loIdx = floor((col("n") - 1) * lit(p)) + 1
      val hiIdx = ceil((col("n") - 1) * lit(p)) + 1
      Seq(
        max(when(col("cum") - col("c") + 1 <= loIdx && loIdx <= col("cum"), col("v")))
          .as(s"${tag}_lo"),
        max(when(col("cum") - col("c") + 1 <= hiIdx && hiIdx <= col("cum"), col("v")))
          .as(s"${tag}_hi"))
    }
    val qs = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    val aggCols = max(col("n")).as("n") +: qs.flatMap { case (tag, p) => loHi(tag, p) }
    def interp(tag: String, p: Double): Column = {
      val fr = (col("n") - 1) * lit(p) - floor((col("n") - 1) * lit(p))
      (col(s"${tag}_lo").cast(DoubleType)
        + (col(s"${tag}_hi").cast(DoubleType) - col(s"${tag}_lo").cast(DoubleType)) * fr)
        .as(tag)
    }
    cum.groupBy(col("lang")).agg(aggCols.head, aggCols.tail: _*)
      .select(col("lang") +: col("n") +: qs.map { case (tag, p) => interp(tag, p) }: _*)
      .orderBy(col("lang"))
  }

  /** Fixed-window document chunking with overlap — the unit-of-work splitter
    * in front of embedding / tokenization stages (every RAG or long-context
    * training pipeline runs one). Window = [[ChunkSize]] chars, stride =
    * [[ChunkStride]] (so consecutive chunks overlap by size − stride).
    *
    * Scale shape: a NARROW generator — each row explodes into its own
    * ≤ ⌈len/stride⌉ chunks inside one codegen'd stage; no shuffle, no state,
    * output volume bounded by (size/stride)× input bytes. At 100 TB this is
    * purely scan-bound and partitions independently. Chunk count uses only
    * integer-exact double math (values ≪ 2^53) so both engines agree. */
  val ChunkSize  = 200
  val ChunkStride = 150

  def chunkDocuments(s: SparkSession, dir: String): DataFrame = {
    val nChunks =
      s"1 + CAST(floor((greatest(length(text) - $ChunkSize, 0) + ${ChunkStride - 1}) / ${ChunkStride}.0) AS BIGINT)"
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        posexplode(expr(s"sequence(0, $nChunks - 1)")).as(Seq("pos", "chunk_id")))
      .select(
        col("doc_id"),
        col("chunk_id"),
        (col("chunk_id") * ChunkStride + 1).as("chunk_start"),
        expr(s"substring(text, CAST(chunk_id * $ChunkStride + 1 AS INT), $ChunkSize)")
          .as("chunk_text"))
      .withColumn("chunk_chars", length(col("chunk_text")).cast(LongType))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** CONTENT-DEFINED chunking: boundaries where the hash of the local
    * 5-char window drops below a threshold (md5 first byte < 8 → expected
    * chunk ≈ 32 chars), instead of at fixed offsets. The property fixed
    * windows (q39) lack: inserting one character shifts every later fixed
    * chunk but leaves all content-defined chunks after the next boundary
    * IDENTICAL — so chunk-hash dedup keeps matching across edited
    * near-copies. Same technique storage dedup uses, applied to corpus
    * text.
    *
    * Scale shape: ONE compiled pass — the native [[graft.expr.CdcChunksExpr]]
    * computes boundaries and chunk hashes per row via a static call from
    * generated code, so the doc never leaves its input partition and the
    * whole scan stays in WholeStageCodegen. (Both relational formulations
    * lose one of those: exploding window positions through a doc_id Window
    * carries the full text across a shuffle — O(len²/32) shuffle bytes per
    * doc — and a higher-order `filter(sequence(...))` is narrow but Spark
    * evaluates lambdas interpreted, 2× slower at sf0.1.) Work per doc is
    * O(len) hashing; output O(len/32) rows; the boundary decision is pure
    * hashing: deterministic across engines, retries, partitionings. */
  val CdcWindow = 5
  val CdcBoundaryMax = 8 // md5 first byte < 8 → boundary (density 8/256)

  def contentDefinedChunks(s: SparkSession, dir: String): DataFrame =
    cdcChunkRows(s, dir).orderBy(col("doc_id"), col("chunk_idx"))

  /** The chunk stream without the presentation sort — shared by the q71
    * gate and the chunk-level snapshot dedup (q92). */
  private def cdcChunkRows(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(graft.expr.CdcChunksFunctions.cdcChunks(
          col("text"), CdcWindow, CdcBoundaryMax)).as(Seq("pos", "c")))
      .select(
        col("doc_id"),
        col("pos").cast(LongType).as("chunk_idx"),
        col("c.start").as("chunk_start"),
        col("c.len").as("chunk_len"),
        col("c.md5").as("chunk_md5"))

  /** Gopher-style repetition signals per document: distinct-token ratio,
    * most-frequent-token fraction, most-frequent-bigram fraction. The
    * standard cheap filters for degenerate/boilerplate text ahead of
    * expensive dedup or training.
    *
    * Scale shape: two narrow generators (token explode; bigrams built from
    * the token ARRAY inside the scan — no posexplode + doc-keyed window
    * carrying the full token stream across a shuffle), one map-side-
    * combined shuffle on (doc_id, token) and one on (doc_id, bigram), and
    * the per-doc stats + argmax fold into ONE aggregate each via
    * `min(struct(−count, key))` (negated count makes lexicographic struct
    * MIN pick highest-count-then-lexicographically-first — the same
    * struct-extremum trick as the recall panel's (cosine, −id) max), so
    * no window re-sorts any doc's
    * vocabulary. Ties for the top token/bigram break lexicographically in
    * both engines. */
  def repetitionSignals(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
    val stats = tf.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tok"), count(lit(1)).as("n_distinct"),
        min(struct((-col("c")).as("nc"), col("tok").as("tk"))).as("m"))
    val bigrams = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"))
        .as("bigram"))
    val bf = bigrams.groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("c"))
    val topBigram = bf.groupBy(col("doc_id"))
      .agg(min(struct((-col("c")).as("nc"), col("bigram").as("bg"))).as("mb"))
    stats.join(topBigram, "doc_id")
      .select(
        col("doc_id"),
        col("n_tok"),
        col("n_distinct"),
        (col("n_distinct").cast(DoubleType) / col("n_tok")).as("distinct_ratio"),
        col("m.tk").as("top_tok"),
        (-col("m.nc")).as("top_tok_n"),
        ((-col("m.nc")).cast(DoubleType) / col("n_tok")).as("top_tok_frac"),
        col("mb.bg").as("top_bigram"),
        (-col("mb.nc")).as("top_bigram_n"),
        ((-col("mb.nc")).cast(DoubleType) / (col("n_tok") - 1)).as("top_bigram_frac"))
      .orderBy(col("doc_id"))
  }

  /** Token-budget truncation: cap every document at [[TruncateTokens]]
    * whitespace tokens (the standard context-length guard before packing /
    * tokenization). Pure narrow transform — `slice` on the token array
    * inside codegen, no shuffle; emits old/new token counts so the
    * pipeline can account for dropped volume instead of losing it
    * silently. */
  val TruncateTokens = 40

  def truncateTokens(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(col("toks")).cast(LongType).as("n_tok"),
        least(size(col("toks")).cast(LongType), lit(TruncateTokens.toLong)).as("kept_tok"),
        expr(s"concat_ws(' ', slice(toks, 1, $TruncateTokens))").as("truncated"))
      .withColumn("truncated_chars", length(col("truncated")).cast(LongType))
      .orderBy(col("doc_id"))

  /** Deterministic global shuffle with explicit positions: a reproducible
    * total order by `md5('shuf:' || doc_id)` — what "shuffle the training
    * corpus" must mean at 100 TB, where `rand()` is neither stable across
    * retries nor across partitionings. The global POSITION is computed
    * scalably: rank within each of 256 hash-prefix buckets (a
    * 256-way-parallel window — the first hash byte IS the bucket, so
    * (bucket, key) order equals key order), plus per-bucket offsets from
    * the 256-row size table (metadata-sized window). No single reducer
    * ever sees the corpus — the naive `row_number() OVER (ORDER BY key)`
    * would. */
  def deterministicShuffle(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val keyed = Tables(s, dir, "documents")
      .select(col("doc_id"),
        md5(concat(lit("shuf:"), col("doc_id").cast(StringType))).as("shuffle_key"))
      .withColumn("bucket", expr(
        "CAST((instr('0123456789abcdef', substr(shuffle_key, 1, 1)) - 1) * 16" +
          " + (instr('0123456789abcdef', substr(shuffle_key, 2, 1)) - 1) AS BIGINT)"))
    val ranked = keyed.withColumn("rn",
      row_number().over(w.partitionBy(col("bucket"))
        .orderBy(col("shuffle_key"), col("doc_id"))).cast(LongType))
    val offsets = keyed.groupBy(col("bucket")).agg(count(lit(1)).as("c"))
      .withColumn("off", coalesce(
        sum(col("c")).over(w.orderBy(col("bucket"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("bucket"), col("off"))
    ranked.join(broadcast(offsets), "bucket")
      .select(col("doc_id"), col("shuffle_key"),
        (col("off") + col("rn")).as("shuffle_pos"))
      .orderBy(col("shuffle_pos"))
  }

  /** Deterministic DATA MIXING — the mixture-weights step of training-data
    * assembly: given a target weight per source, compute each source's
    * target share, the largest total the available counts can serve at
    * those shares (the binding source caps it), the per-source keep rate,
    * and the hash-selected kept count. Selection is the same deterministic
    * md5-threshold discipline as [[stratifiedSample]] (`rand()` is neither
    * retry- nor partitioning-stable), so the mixed corpus is reproducible
    * bit-for-bit.
    *
    * Scale shape: per-source stats are a |sources|-row aggregate
    * (map-side combine); rates broadcast back into one corpus scan whose
    * filter is a narrow hash compare — the corpus never shuffles. Weights
    * here are a deterministic demo rule (even-numbered sources weighted
    * 2×); production passes its mixture config the same way. */
  def mixtureSample(s: SparkSession, dir: String): DataFrame = {
    // 2.0D / 1.0D: Spark parses a bare decimal literal as DECIMAL (DuckDB as
    // DOUBLE); the share division must be IEEE double in both engines
    val w = expr("CASE WHEN CAST(substr(source, 4, 10) AS INT) % 2 = 0 THEN 2.0D ELSE 1.0D END")
    val per = Tables(s, dir, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("n_avail"))
      .withColumn("w", w)
    val tot = per.agg(sum(col("w")).as("sumw"))
    val shares = per.crossJoin(broadcast(tot))
      .withColumn("target_share", col("w") / col("sumw"))
      .withColumn("feasible", col("n_avail") / col("target_share"))
    val tmin = shares.agg(min(col("feasible")).as("t_total"))
    val rates = shares.crossJoin(broadcast(tmin))
      .withColumn("keep_rate",
        least(lit(1.0), col("target_share") * col("t_total") / col("n_avail")))
      .select(col("source"), col("n_avail"), col("target_share"), col("keep_rate"))
    // 16-bit hash fraction: 4 md5 hex nibbles, exact power-of-two divide
    val hash16 = (1 to 4).map { p =>
      s"(instr('0123456789abcdef', substr(md5(concat('mix:', CAST(doc_id AS STRING))), $p, 1)) - 1) * ${1 << (4 * (4 - p))}"
    }.mkString(" + ")
    val kept = Tables(s, dir, "documents")
      .join(broadcast(rates.select(col("source"), col("keep_rate"))), "source")
      .filter(expr(s"CAST($hash16 AS DOUBLE) / 65536.0") < col("keep_rate"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
    rates.join(kept, Seq("source"), "left")
      .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
      .orderBy(col("source"))
  }

  /** TEMPERATURE-resampled mixture (q170) — the α-sampling rule
    * multilingual/multi-source training mixes actually use (raise rare
    * sources, damp dominant ones): target share ∝ share^α with α = 1/2.
    * α = 1/2 is not just the common choice — it is the libm-FREE one:
    * share^0.5 is IEEE `sqrt`, correctly rounded in both engines, where a
    * general `pow` would break bitwise parity. Resampled total = the
    * corpus size; oversubscribed sources cap at keep_rate 1 (their mass
    * implicitly redistributes). Selection is the q80 hash-threshold
    * discipline; Σw accumulates floor-quantized so the normalizer is
    * order-independent.
    *
    * Scale shape: |sources|-row aggregates and broadcasts around ONE
    * corpus scan whose keep decision is a narrow hash compare — identical
    * cost envelope to q80. */
  def temperatureMixture(s: SparkSession, dir: String): DataFrame = {
    val per = Tables(s, dir, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("n_avail"))
    val tot = per.agg(sum(col("n_avail")).as("n_total"))
    val shares = per.crossJoin(broadcast(tot))
      .withColumn("share",
        col("n_avail").cast(DoubleType) / col("n_total").cast(DoubleType))
      .withColumn("w", sqrt(col("share")))
    val sumw = shares.agg(
      expr("CAST(SUM(CAST(FLOOR(w * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12")
        .as("sumw"))
    val rates = shares.crossJoin(broadcast(sumw))
      .withColumn("target_share", col("w") / col("sumw"))
      .withColumn("keep_rate", least(lit(1.0),
        col("target_share") * col("n_total").cast(DoubleType)
          / col("n_avail").cast(DoubleType)))
      .select(col("source"), col("n_avail"), col("share"), col("target_share"),
        col("keep_rate"))
    val hash16 = (1 to 4).map { p =>
      s"(instr('0123456789abcdef', substr(md5(concat('tmp:', CAST(doc_id AS STRING))), $p, 1)) - 1) * ${1 << (4 * (4 - p))}"
    }.mkString(" + ")
    val kept = Tables(s, dir, "documents")
      .join(broadcast(rates.select(col("source"), col("keep_rate"))), "source")
      .filter(expr(s"CAST($hash16 AS DOUBLE) / 65536.0") < col("keep_rate"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
    rates.join(kept, Seq("source"), "left")
      .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
      .orderBy(col("source"))
  }

  /** Deterministic LINEAR QUALITY CLASSIFIER — the model-scored upgrade of
    * the rule threshold in [[qualityScore]]: a fixed weight vector over
    * cheap per-doc features (length saturation, stopword ratio, distinct
    * ratio, mean token length) producing a logit and a keep decision. This
    * is the fastText-/logistic-regression-shaped filter every production
    * curation stack runs after rules and before expensive stages; weights
    * here are fixed constants, production swaps in trained ones the same
    * way (they bake into the projection as literals either way).
    *
    * Scale shape: a pure NARROW scan — every feature and the dot product
    * evaluate per-row inside one codegen'd projection; no shuffle, no UDF.
    * Determinism: features and the logit use only +,−,×,/ and `least` on
    * doubles (IEEE correctly-rounded in both engines), summed in fixed
    * left-associative order, so the keep decision is bitwise portable. */
  val ClfBias = -3.3

  def qualityClassifier(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("toks")).cast(LongType))
      .withColumn("len_sat", least(col("n_tok").cast(DoubleType) / 50.0, lit(1.0)))
      .withColumn("stop_ratio",
        expr(s"CAST(size(filter(toks, x -> x IN ${inList(stopwords)})) AS BIGINT)")
          .cast(DoubleType) / col("n_tok"))
      .withColumn("distinct_ratio",
        size(array_distinct(col("toks"))).cast(DoubleType) / col("n_tok"))
      .withColumn("avg_tok_len",
        (length(col("text")).cast(DoubleType) - (col("n_tok") - lit(1L))) / col("n_tok"))
      .withColumn("logit",
        lit(ClfBias) + col("len_sat") * 2.0 - col("stop_ratio") * 1.5
          + col("distinct_ratio") * 1.0 + col("avg_tok_len") * 0.25)
      .select(col("doc_id"), col("n_tok"), col("len_sat"), col("stop_ratio"),
        col("distinct_ratio"), col("avg_tok_len"), col("logit"),
        (col("logit") >= 0.0).as("keep"))
      .orderBy(col("doc_id"))

  /** Cross-document REPEATED-PASSAGE detection — the candidate stage of
    * exact substring deduplication (Lee et al.'s "Deduplicating Training
    * Data" shape at n-gram granularity): find token [[RepN]]-grams that
    * occur in ≥ [[RepMinDocs]] distinct documents, and report per document
    * how many of its n-gram positions are repeated and how many of its
    * tokens those repeated spans cover. Downstream removal = filter or cut
    * on `cov_frac` (boilerplate headers, license blocks, templated spam all
    * surface here before any fuzzy method sees them).
    *
    * Scale shape: the gram stream is generated NARROW (explode positions,
    * hash `md5` of the 8-token slice — only (doc_id, position, 32-byte
    * gram hash) rows ever shuffle, never document text); the doc-frequency
    * aggregate is a hash agg with map-side partials; the repeated-gram set
    * joins back by gram hash (uniform md5 keys — no skew). Covered-token
    * counting exploits the FIXED span length: a hit at position i covers
    * [i, i+RepN), so the union size per doc is Σ min(RepN, next_i − i)
    * over position-sorted hits (the last hit contributes RepN) — one
    * window-lead pass and ONE doc-keyed aggregate serve both the span
    * count and the coverage, where the original formulation exploded every
    * hit ×RepN and paid a corpus-scale DISTINCT shuffle (the round-12
    * regenerated corpus, duplicate-heavy at sf1 by design, made that the
    * sweep's second-worst entry). Nothing is all-pairs: work is
    * O(total tokens), the same order as tokenizing the corpus. */
  val RepN = 8
  val RepMinDocs = 2

  def repeatedNgrams(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("toks")).cast(LongType))
    val grams = docs.filter(col("n_tok") >= RepN)
      .select(col("doc_id"), col("toks"),
        explode(expr(s"sequence(1, size(toks) - ${RepN - 1})")).as("i"))
      .select(col("doc_id"), col("i"),
        md5(concat_ws(" ", expr(s"slice(toks, i, $RepN)"))).as("gram"))
    val rep = grams.groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= RepMinDocs)
      .select(col("gram"))
    val hits = grams.join(rep, "gram")
    // fixed-length interval union via window lead: (doc_id, i) is unique by
    // construction (one gram per position), so consecutive hits overlap by
    // exactly max(0, RepN − gap) and each row's marginal coverage is
    // min(RepN, gap); the final hit contributes RepN
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("i"))
    val perDoc = hits
      .withColumn("cov", least(
        coalesce((lead(col("i"), 1).over(wd) - col("i")).cast(LongType),
          lit(RepN.toLong)),
        lit(RepN.toLong)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_rep_spans"), sum(col("cov")).as("n_cov_tok"))
    docs.select(col("doc_id"), col("n_tok"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tok"),
        greatest(col("n_tok") - (RepN - 1), lit(0L)).as("n_grams"),
        coalesce(col("n_rep_spans"), lit(0L)).as("n_rep_spans"),
        coalesce(col("n_cov_tok"), lit(0L)).as("n_cov_tok"),
        (coalesce(col("n_cov_tok"), lit(0L)).cast(DoubleType) / col("n_tok")).as("cov_frac"))
      .orderBy(col("doc_id"))
  }

  /** Repeated-passage REMOVAL — the rewrite step completing [[repeatedNgrams]]'
    * detection (together they are the exact-substring-dedup pipeline of Lee
    * et al., at token-n-gram granularity): cut every token covered by a
    * cross-document repeated [[RepN]]-gram and reassemble the survivors in
    * original order. Emits per doc the kept-token count and the md5 of the
    * cleaned text (the full text flows the same way; the gate hashes it to
    * keep outputs small).
    *
    * Scale shape: detection is q84's bounded pipeline (gram hashes, never
    * text, cross the shuffle). The rewrite explodes tokens once —
    * (doc_id, position, token) rows, O(corpus tokens) — anti-joins the
    * covered-position set on the high-cardinality (doc_id, position) key,
    * and reassembles per doc with a bounded-by-doc-length sort inside the
    * aggregation. Everything is doc-scoped after the gram stage; no
    * reducer ever holds more than one document's tokens. */
  def removeRepeatedPassages(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("toks")).cast(LongType))
    val grams = docs.filter(col("n_tok") >= RepN)
      .select(col("doc_id"), col("toks"),
        explode(expr(s"sequence(1, size(toks) - ${RepN - 1})")).as("i"))
      .select(col("doc_id"), col("i"),
        md5(concat_ws(" ", expr(s"slice(toks, i, $RepN)"))).as("gram"))
    val rep = grams.groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= RepMinDocs)
      .select(col("gram"))
    val covered = grams.join(rep, "gram")
      .select(col("doc_id"), explode(expr(s"sequence(i, i + ${RepN - 1})")).as("p"))
      .distinct()
    val toks = docs
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos0", "tok")))
      .select(col("doc_id"), (col("pos0") + 1).cast(LongType).as("p"), col("tok"))
    val kept = toks.join(covered, Seq("doc_id", "p"), "left_anti")
    val cleaned = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ",
          expr("transform(array_sort(collect_list(struct(p, tok))), x -> x.tok)"))
          .as("cleaned"))
    docs.select(col("doc_id"), col("n_tok"))
      .join(cleaned, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        md5(coalesce(col("cleaned"), lit(""))).as("cleaned_md5"))
      .orderBy(col("doc_id"))
  }

  /** Unigram LANGUAGE-MODEL scoring — the LM-based quality signal between
    * rule filters and a real perplexity model: score each document by the
    * corpus-wide unigram probability of its tokens. Log-free on purpose:
    * true perplexity needs ln/exp (libm-dependent — results would stop
    * being bitwise portable across engines), so the score is the
    * ARITHMETIC mean token probability plus the rarest-token probability —
    * the same ordering signal for rare-token-dense/degenerate docs.
    *
    * Scale shape: the unigram distribution and its total come off the
    * memoized [[unigramStats]] artifact (one corpus aggregation shared
    * with q95/q96; the total is a vocab-bounded rollup of it, never a
    * second corpus pass), then a token-keyed equi-join back onto the
    * exploded corpus (the inverted-index shape; token keys are as uniform
    * as the vocabulary) and a per-doc aggregation whose probability sum
    * uses the floor-quantized DECIMAL(38,0) discipline (order-independent;
    * p is quantized at 1e-12 — the gate's determinism does not depend on
    * the quantum, only on both engines sharing it). */
  def lmScore(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val tf = unigramStats(s, dir).select(col("tok"), col("tf"))
    val total = tf.agg(sum(col("tf")).as("n_total"))
    val probs = tf.crossJoin(broadcast(total))
      .select(col("tok"),
        (col("tf").cast(DoubleType) / col("n_total").cast(DoubleType)).as("p"))
    // BROADCAST the distribution: probs is O(vocab) rows by construction
    // (a dictionary, the classic broadcast side), while toks is the
    // exploded CORPUS — without the hint the join shuffles the corpus on
    // `tok`, a key with vocabulary cardinality, so at scale most shuffle
    // partitions are empty and the hot tokens pile into a few (the
    // sf0.1→sf1 sweep's q91 tail)
    toks.join(broadcast(probs), "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        expr("CAST(SUM(CAST(FLOOR(p * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12")
          .as("sum_p"),
        min(col("p")).as("min_p"))
      .select(col("doc_id"), col("n_tok"),
        (col("sum_p") / col("n_tok")).as("mean_p"), col("min_p"))
      .orderBy(col("doc_id"))
  }

  /** DSIR-style IMPORTANCE RESAMPLING for domain-targeted data selection
    * (Xie et al. 2023, "Data Selection for Language Models via Importance
    * Resampling"): score every candidate document by how much more likely
    * its tokens are under a TARGET domain's unigram distribution than under
    * the raw corpus distribution, and keep the top [[DsirKeep]]. Here the
    * target domain is `source = 'src0'` (production passes any curated
    * exemplar set); candidates are every other source. Log-free on purpose
    * (same reasoning as [[lmScore]]): the score is the ratio of
    * floor-quantized mean token probabilities Σp_target / Σp_raw — the
    * same ordering signal as a likelihood ratio for unigram features,
    * without libm-dependent ln/exp breaking cross-engine parity.
    *
    * Scale shape: BOTH distributions come off the memoized
    * [[unigramStats]] artifact — the target's per-token count is its
    * by-source map entry (tokens absent from the target read 0, exactly
    * the original left join's coalesce) and both totals are vocab-bounded
    * rollups (the original formulation made FIVE corpus passes: two tf
    * aggregations, two totals, one probe — now one shared build plus the
    * probe). Then one token-keyed equi-join back onto the exploded corpus,
    * a per-doc aggregate, and top-N via orderBy+limit — which Spark plans
    * as TakeOrderedAndProject (per-partition heaps + driver merge of N),
    * never a global sort of the corpus. Ties broken by doc_id. */
  val DsirKeep = 100

  /** Every candidate document's (doc_id, n_tok, ratio) importance score —
    * the full scored frame [[dsirSelect]] takes its top-N from. */
  def dsirScores(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"), explode(split(col("text"), " ")).as("tok"))
    val tf = unigramStats(s, dir).select(col("tok"),
      col("tf").as("tfa"),
      coalesce(element_at(col("by_source"), "src0"), lit(0L)).as("tft"))
    val tot = tf.agg(sum(col("tfa")).as("nta"), sum(col("tft")).as("ntt"))
    val probs = tf.crossJoin(broadcast(tot))
      .select(col("tok"),
        (col("tft").cast(DoubleType) / col("ntt").cast(DoubleType)).as("pt"),
        (col("tfa").cast(DoubleType) / col("nta").cast(DoubleType)).as("pa"))
    toks.filter(col("source") =!= "src0")
      .join(broadcast(probs), "tok") // O(vocab) dictionary side (see lmScore)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        expr("CAST(SUM(CAST(FLOOR(pt * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12")
          .as("sum_pt"),
        expr("CAST(SUM(CAST(FLOOR(pa * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12")
          .as("sum_pa"))
      .withColumn("ratio", col("sum_pt") / col("sum_pa"))
      .select(col("doc_id"), col("n_tok"), col("ratio"))
  }

  def dsirSelect(s: SparkSession, dir: String): DataFrame =
    dsirScores(s, dir)
      .orderBy(col("ratio").desc, col("doc_id")).limit(DsirKeep)
      .select(col("doc_id"), col("n_tok"), col("ratio"))
      .orderBy(col("doc_id"))

  /** SNAPSHOT-DELTA dedup at CHUNK granularity — incremental-ingestion
    * dedup against an existing corpus snapshot, the storage-dedup
    * formulation: which content-defined chunks ([[contentDefinedChunks]])
    * of the incoming batch does the snapshot's chunk store already hold?
    * (Here even doc_ids are the snapshot, odd ones the incoming batch;
    * production passes two tables the same way.) Chunk granularity is what
    * makes delta dedup bite on real corpora: whole-text hashes only catch
    * verbatim copies, while shared chunk hashes catch partially-overlapping
    * revisions — and because the chunker is content-defined, the overlap
    * survives edits. Emits per incoming doc its chunk count, how many
    * chunks the snapshot already had, and the duplicate fraction.
    *
    * Scale shape: both sides reduce to 32-hex chunk hashes BEFORE the join
    * (never text); the snapshot side pre-aggregates to distinct hashes;
    * the probe is a uniform-hash equi-join followed by a doc-scoped
    * aggregate. At 100 TB the snapshot chunk index lives as its own
    * compacted table and the same plan applies (a Bloom filter pre-screen
    * keeps the same join shape with a cheaper first pass). */
  def snapshotDedup(s: SparkSession, dir: String): DataFrame = {
    val chunks = cdcChunkRows(s, dir).select(col("doc_id"), col("chunk_md5"))
    val snapshot = chunks.filter(pmod(col("doc_id"), lit(2L)) === 0L)
      .select(col("chunk_md5")).distinct().withColumn("seen", lit(1L))
    val incoming = chunks.filter(pmod(col("doc_id"), lit(2L)) === 1L)
    incoming.join(snapshot, Seq("chunk_md5"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("seen").isNotNull, 1L).otherwise(0L)).as("n_dup_chunks"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        (col("n_dup_chunks").cast(DoubleType) / col("n_chunks")).as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  /** Per-source VOCABULARY DRIFT — total-variation distance between each
    * source's unigram distribution and the whole-corpus distribution:
    * TV(s) = ½ Σ_tok |p_s(tok) − p_corpus(tok)|, summed over the corpus
    * vocabulary (p_s = 0 where the source lacks the token). The
    * distribution-shift monitor a pipeline runs per ingest source /
    * per snapshot: a source whose TV jumps between crawls changed its
    * content mix (spam influx, template change, language shift) before any
    * downstream metric notices. TV instead of KL on purpose: it needs only
    * |·|, +, / — no ln() — so the score is bitwise portable across engines
    * (same reasoning as [[lmScore]]), and it is bounded in [0, 1] and
    * defined even where p_s = 0 (KL is infinite there without smoothing).
    *
    * Scale shape: ONE (source, token) term-frequency aggregation (map-side
    * combine) whose rollups supply the corpus distribution and all totals,
    * a vocabulary × sources grid built by cross-joining the vocab against
    * the BROADCAST handful of source rows (|vocab| × |sources| rows — the
    * grid is as big as the vocab, not the corpus), one left join to attach
    * per-source counts, and a |sources|-row final aggregate with the
    * floor-quantized DECIMAL(38,0) discipline (order-independent). */
  def vocabDrift(s: SparkSession, dir: String): DataFrame = {
    // every distribution and total is a rollup of the memoized
    // [[unigramStats]] artifact (vocab × sources rows — metadata, not
    // corpus passes; the original formulation scanned the corpus once per
    // aggregation, four times)
    val stats = unigramStats(s, dir)
    val tfS = stats.select(col("tok"),
      explode(col("by_source")).as(Seq("source", "tfs")))
    val tfC = stats.select(col("tok"), col("tf").as("tfc"))
    val totC = stats.agg(sum(col("tf")).as("ntc"))
    val totS = tfS.groupBy(col("source")).agg(sum(col("tfs")).as("nts"))
    val grid = tfC.crossJoin(broadcast(totS))
    grid.join(tfS, Seq("source", "tok"), "left")
      .crossJoin(broadcast(totC))
      .select(col("source"), col("nts"),
        abs(coalesce(col("tfs"), lit(0L)).cast(DoubleType) / col("nts").cast(DoubleType)
          - col("tfc").cast(DoubleType) / col("ntc").cast(DoubleType)).as("ad"))
      .groupBy(col("source"))
      .agg(max(col("nts")).as("n_tok"),
        (expr("CAST(SUM(CAST(FLOOR(ad * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12")
          / lit(2.0)).as("tv"))
      .orderBy(col("source"))
  }

  /** OUT-OF-VOCABULARY rate against a frozen snapshot vocabulary — the
    * tokenizer/vocab-drift monitor for incremental ingestion: how much of
    * each incoming document falls outside the vocabulary the snapshot
    * corpus (and the tokenizer trained on it) already knows. Rising OOV on
    * a source means its content outran the tokenizer — the early-warning
    * signal before fertility degrades. (Even doc_ids are the snapshot,
    * odd the incoming batch, the q92 convention; production passes two
    * tables.)
    *
    * Scale shape: the frozen vocabulary reduces to distinct tokens BEFORE
    * the join (map-side combine), then one uniform token-keyed equi-join
    * against the exploded incoming batch and a doc-scoped aggregate —
    * the inverted-index probe shape, never corpus × corpus. */
  def oovRate(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val vocab = toks.filter(pmod(col("doc_id"), lit(2L)) === 0L)
      .select(col("tok")).distinct().withColumn("known", lit(1L))
    toks.filter(pmod(col("doc_id"), lit(2L)) === 1L)
      // the vocabulary is the dictionary side — O(vocab) rows; unhinted,
      // the held-out half of the CORPUS shuffles on the token key
      .join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("known").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tok"), col("n_oov"),
        (col("n_oov").cast(DoubleType) / col("n_tok")).as("oov_rate"))
      .orderBy(col("doc_id"))
  }

  /** PII / identifier scrubbing pattern library — (name, regex, redaction
    * tag). Every regex is written in the RE2 ∩ java.util.regex common
    * subset so the DuckDB oracle can run the IDENTICAL pattern text.
    * Counting treats the patterns as independent detectors over the
    * ORIGINAL text; redaction applies them in library order, so the more
    * specific shapes (email, phone, IP) consume their matches before the
    * generic long-digit-run rule fires. Real deployments extend this seq —
    * the operator itself is pattern-agnostic. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}", "[PHONE]"),
    ("ipv4", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "[IP]"),
    ("idrun", "[0-9]{6,}", "[ID]"))

  /** Generic PII scrub: per-pattern match counts (`n_<name>` columns, plus
    * the `n_pii` total) and a redacted copy of `textCol`. A pure narrow
    * scan — no shuffle, no UDF: `regexp_extract_all`/`regexp_replace` are
    * codegen'd expressions, so at 100 TB this runs at parquet-scan speed
    * with pushdown/pruning intact. Built with the typed `functions` API
    * (not `expr`) so the regex text reaches the engine verbatim — a Spark
    * SQL string literal would consume the backslashes. */
  def piiScrub(df: DataFrame, textCol: String): DataFrame = {
    val counted = PiiPatterns.foldLeft(df) { case (d, (nm, re, _)) =>
      d.withColumn(s"n_$nm",
        size(regexp_extract_all(col(textCol), lit(re), lit(0))).cast(LongType))
    }
    val red = PiiPatterns.foldLeft(col(textCol)) { case (c, (_, re, tag)) =>
      regexp_replace(c, lit(re), lit(tag))
    }
    counted
      .withColumn("n_pii", PiiPatterns.map { case (nm, _, _) => col(s"n_$nm") }.reduce(_ + _))
      .withColumn("redacted", red)
  }

  /** The gated PII query runs the full library over supplier names — the
    * one string field in the corpus with genuinely identifier-shaped
    * content (9-digit account-number-like runs). The email/phone/IP
    * columns are provably zero here and are asserted zero by the oracle;
    * CurationOpsSpec exercises them on constructed rows. */
  def piiSupplierScrub(s: SparkSession, dir: String): DataFrame =
    piiScrub(Tables(s, dir, "supplier").select(col("s_suppkey"), col("s_name")), "s_name")
      .filter(col("n_pii") > 0)
      .select(col("s_suppkey"), col("n_email"), col("n_phone"), col("n_ipv4"),
        col("n_idrun"), col("redacted"))
      .orderBy(col("s_suppkey"))

  /** Deterministic train/val/test assignment (~90/5/5 by md5-byte
    * thresholds): the split is a pure function of the document id with a
    * dedicated salt, so it is (a) STABLE UNDER CORPUS GROWTH — ingesting
    * more documents never moves an existing doc across splits, which
    * position- or sort-based splitting cannot guarantee — and (b)
    * reproducible from the id alone on any engine (the leakage audit can
    * recompute it without the assignment table).
    *
    * Scale shape: a narrow map over the scan, no shuffle; at write time
    * `split` becomes a partition column so readers prune to their split. */
  val SplitThresholds: (Long, Long) = (230L, 243L)

  /** The split byte as a Spark expression over any id column — shared by
    * the assignment table (q107) and every audit that needs to recompute
    * membership in place (q110): pure function of id+salt. */
  private[graft] def splitBucketExpr(idCol: String): Column = expr(
    s"CAST((instr('0123456789abcdef', substr(md5(concat('split:', CAST($idCol AS STRING))), 1, 1)) - 1) * 16" +
      s" + (instr('0123456789abcdef', substr(md5(concat('split:', CAST($idCol AS STRING))), 2, 1)) - 1) AS BIGINT)")

  private[graft] def splitNameCol(bucket: Column): Column =
    when(bucket < SplitThresholds._1, "train")
      .when(bucket < SplitThresholds._2, "val")
      .otherwise("test")

  def trainSplit(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .withColumn("bucket", splitBucketExpr("doc_id"))
      .withColumn("split", splitNameCol(col("bucket")))
      .select(col("doc_id"), col("bucket"), col("split"))
      .orderBy(col("doc_id"))

  /** Collocation mining via LIFT (log-free PMI): for adjacent token
    * bigrams seen at least [[MinBigramCount]] times, score
    * P(ab) / (P(a)·P(b)) evaluated as (c_ab/c_a)·(N/c_b) — two fixed-order
    * double divisions and one multiply, so no ln() (libm-portability, the
    * q96/q86 discipline) and no integer overflow (c_ab·N and c_a·c_b
    * overflow 64-bit once the corpus passes ~3e9 tokens). Margins are the
    * bigram-position marginals (count of a as FIRST member, b as SECOND) —
    * the contingency-table-correct normalization for adjacent bigrams.
    * The multi-word-expression / tokenizer-vocabulary miner.
    *
    * Scale shape: ONE corpus scan — the exploded bigrams aggregate once
    * into (wa, wb, c_ab), and because every occurrence of a token as a
    * FIRST (resp. SECOND) bigram member is in exactly one bigram, the
    * position marginals and the total are exact rollups OF THE BIGRAM
    * COUNTS (c_a = Σ_b c_ab, c_b = Σ_a c_ab, N = Σ c_ab) — vocab²-bounded
    * metadata aggregations, never a second corpus pass. (The original
    * formulation re-scanned and re-exploded the corpus once per marginal —
    * 4 scans; on the round-12 regenerated corpus, whose 31-token
    * vocabulary makes every bigram key massively multiplied, that was the
    * sf1 sweep's worst entry.) All four consumers share ONE physical
    * bigram aggregation through exchange reuse — the (wa, wb) shuffle
    * subtree is identical in each branch, so Spark's ReuseExchange/AQE
    * stage reuse executes the scan+explode+partial once (PlanSpec pins
    * the reuse). Map-side combine carries the bigram aggregation; top-k
    * plans as TakeOrderedAndProject, never a global sort. */
  val MinBigramCount = 5L
  val CollocationTopK = 100

  def collocations(s: SparkSession, dir: String): DataFrame = {
    val big = Tables(s, dir, "documents")
      .select(split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), i -> named_struct('a', element_at(t, i), 'b', element_at(t, i + 1)))")).as("bg"))
      .select(col("bg.a").as("wa"), col("bg.b").as("wb"))
      // explicit (vacuous — split() never yields nulls) null filters, so
      // every branch's pushed-down join constraints are SUBSUMED and the
      // four consumers' aggregate subtrees stay canonically identical —
      // without this, the main branch gets isnotnull(wa) AND isnotnull(wb)
      // from its two joins while ua gets only isnotnull(wa), and the
      // exchange-reuse match fails, re-scanning the corpus per marginal
      .filter(col("wa").isNotNull && col("wb").isNotNull)
    val bc = big.groupBy(col("wa"), col("wb")).agg(count(lit(1)).as("c_ab"))
    val ua = bc.groupBy(col("wa")).agg(sum(col("c_ab")).as("c_a"))
    val ub = bc.groupBy(col("wb")).agg(sum(col("c_ab")).as("c_b"))
    val n = bc.agg(sum(col("c_ab")).as("n"))
    bc.filter(col("c_ab") >= MinBigramCount)
      .join(ua, "wa").join(ub, "wb")
      .crossJoin(broadcast(n))
      .withColumn("lift",
        (col("c_ab").cast(DoubleType) / col("c_a"))
          * (col("n").cast(DoubleType) / col("c_b")))
      .select(col("wa"), col("wb"), col("c_ab"), col("lift"))
      .orderBy(col("lift").desc, col("wa"), col("wb"))
      .limit(CollocationTopK)
  }

  /** Per-source CORPUS REPORT CARD — the one-pass health dashboard a data
    * pipeline publishes per ingest source: volume (docs, tokens), exact
    * duplication rate, mean quality, and language concentration. Gini
    * impurity (1 − Σ p²) stands in for entropy deliberately: it needs only
    * +,×,/ (ln() is libm-dependent and would break bitwise cross-engine
    * parity).
    *
    * Determinism at scale: token/char totals are exact integer sums; the
    * quality mean uses the floor-quantized DECIMAL(38,0) accumulation
    * (order-independent — a plain double SUM varies with partitioning);
    * Gini's Σ c² is summed exactly in DECIMAL(38,0) (c² overflows BIGINT
    * once a (source, lang) cell exceeds ~3e9 docs) and divided ONCE in
    * double. Scale shape: two corpus aggregations (per source, per
    * (source, lang)) with map-side partials + a |sources|-row join. */
  def corpusReport(s: SparkSession, dir: String): DataFrame = {
    val base = Tables(s, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("toks")).cast(LongType))
      .withColumn("n_stop",
        expr(s"CAST(size(filter(toks, x -> x IN ${inList(stopwords)})) AS BIGINT)"))
      .withColumn("quality",
        least(col("n_tok").cast(DoubleType) / 50.0, lit(1.0)) * 0.5
          + (lit(1.0) - col("n_stop").cast(DoubleType) / col("n_tok")) * 0.5)
    val per = base.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      countDistinct(md5(col("text"))).as("n_unique_texts"),
      sum(col("n_tok")).as("n_tokens"),
      sum(length(col("text")).cast(LongType)).as("n_chars"),
      expr("CAST(SUM(CAST(FLOOR(quality * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12")
        .as("qsum"))
    val langSq = base.groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(expr("CAST(SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) AS DOUBLE)")
        .as("sumsq"))
    per.join(langSq, "source")
      .select(
        col("source"),
        col("n_docs"),
        col("n_unique_texts"),
        (lit(1.0) - col("n_unique_texts").cast(DoubleType) / col("n_docs")).as("dup_rate"),
        col("n_tokens"),
        (col("n_tokens").cast(DoubleType) / col("n_docs")).as("avg_tokens"),
        (col("n_chars").cast(DoubleType) / col("n_docs")).as("avg_chars"),
        (col("qsum") / col("n_docs")).as("avg_quality"),
        (lit(1.0) - col("sumsq") / (col("n_docs").cast(DoubleType) * col("n_docs")))
          .as("lang_gini"))
      .orderBy(col("source"))
  }

  /** The composed END-TO-END curation pipeline — the flagship shape a
    * training-data engine actually runs: quality filter → exact dedup
    * (canonical = min doc_id per identical text) → deterministic
    * hash-stratified sample → per-language sequence packing. Every stage is
    * the already-gated operator (q31, q40, q36, q37) chained on one
    * DataFrame, which is the point: stages compose as plans, so Catalyst
    * sees ONE pipeline (the quality filter and hash-sample predicates both
    * evaluate in the same scan stage; only the dedup agg and the packing
    * window shuffle). */
  val CurationQualityMin = 0.9

  def curationPipeline(s: SparkSession, dir: String): DataFrame = {
    val base = Tables(s, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("toks")).cast(LongType))
      .withColumn("n_stop",
        expr(s"CAST(size(filter(toks, x -> x IN ${inList(stopwords)})) AS BIGINT)"))
      .withColumn("quality",
        least(col("n_tok").cast(DoubleType) / 50.0, lit(1.0)) * 0.5
          + (lit(1.0) - col("n_stop").cast(DoubleType) / col("n_tok")) * 0.5)
      .filter(col("quality") >= CurationQualityMin)
    val canon = base.groupBy(md5(col("text")).as("h")).agg(min(col("doc_id")).as("doc_id"))
    val deduped = base.join(canon.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val byteExpr =
      "(instr('0123456789abcdef', substr(md5(concat('smp:', CAST(doc_id AS STRING))), 1, 1)) - 1) * 16" +
        " + (instr('0123456789abcdef', substr(md5(concat('smp:', CAST(doc_id AS STRING))), 2, 1)) - 1)"
    val threshold = SampleThresholds.foldRight(lit(256): Column) { case ((l, t), acc) =>
      when(col("lang") === l, lit(t)).otherwise(acc)
    }
    val sampled = deduped
      .withColumn("bucket", expr(s"CAST($byteExpr AS BIGINT)"))
      .filter(col("bucket") < threshold)
      .select(col("doc_id"), col("lang"), col("n_tok"), col("quality"))
    graft.cdc.Cdc.packBySize(sampled, col("lang"), col("doc_id"), col("n_tok"), 512L)
      .select(col("doc_id"), col("lang"), col("n_tok"), col("quality"),
        col("message_bin").as("bin"))
      .orderBy(col("lang"), col("doc_id"))
  }

  /** Per-document curation funnel audit (q114): every document gets the
    * FIRST stage that drops it — quality gate → exact dedup (canonical =
    * min doc_id per identical text, evaluated only among quality passers,
    * as the real pipeline would) → stratified sample — or `kept` plus its
    * q107 train/val/test assignment. The audit artifact behind q49's
    * composed pipeline: q49 emits the survivors, this explains every
    * document's fate (attrition accounting, drop-reason drill-down,
    * kept-set lineage) without re-running any stage.
    *
    * Scale shape: one corpus scan computes quality/buckets narrowly; the
    * only shuffle is the exact-dedup window on md5(text) (the same single
    * hash shuffle q40 pays); split membership is recomputed in place as a
    * pure function of the id (q107's design), so no assignment table is
    * joined. Dropping a stage's non-candidates BEFORE its shuffle keeps
    * stage costs ordered by selectivity, exactly like the production
    * pipeline it audits. */
  def curationFunnel(s: SparkSession, dir: String): DataFrame = {
    val base = Tables(s, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("toks")).cast(LongType))
      .withColumn("n_stop",
        expr(s"CAST(size(filter(toks, x -> x IN ${inList(stopwords)})) AS BIGINT)"))
      .withColumn("quality",
        least(col("n_tok").cast(DoubleType) / 50.0, lit(1.0)) * 0.5
          + (lit(1.0) - col("n_stop").cast(DoubleType) / col("n_tok")) * 0.5)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val canon = base.filter(col("quality") >= CurationQualityMin)
      .withColumn("rnk", row_number().over(w))
      .select(col("doc_id"), (col("rnk") === 1).as("is_canon"))
    val byteExpr =
      "(instr('0123456789abcdef', substr(md5(concat('smp:', CAST(doc_id AS STRING))), 1, 1)) - 1) * 16" +
        " + (instr('0123456789abcdef', substr(md5(concat('smp:', CAST(doc_id AS STRING))), 2, 1)) - 1)"
    val threshold = SampleThresholds.foldRight(lit(256): Column) { case ((l, t), acc) =>
      when(col("lang") === l, lit(t)).otherwise(acc)
    }
    base.join(canon, Seq("doc_id"), "left")
      .withColumn("bucket", expr(s"CAST($byteExpr AS BIGINT)"))
      .withColumn("stage",
        when(col("quality") < CurationQualityMin, "low_quality")
          .when(!col("is_canon"), "exact_dup")
          .when(col("bucket") >= threshold, "sampled_out")
          .otherwise("kept"))
      .withColumn("split",
        when(col("stage") === "kept", splitNameCol(splitBucketExpr("doc_id")))
          .otherwise(lit("none")))
      .select(col("doc_id"), col("quality"), col("stage"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** Per-source token budget for [[tokenBudgetSelect]] (q115). */
  val TokenBudget = 600L

  /** Quality-prioritized selection under a per-source TOKEN budget (q115):
    * fill each source's budget with its best documents — priority is the
    * quantized quality level FLOOR(quality·256) descending (doc_id breaks
    * ties), and a document is kept iff it fits entirely within the budget
    * after all higher-priority documents. The budgeted-mixture builder: a
    * training run doesn't want "x% of source S" (q80) so much as "the best
    * N tokens of source S".
    *
    * Scale shape: the q73 two-pass prefix-sum decomposition, keyed on the
    * QUANTIZED level — a naive `SUM OVER (PARTITION BY source ORDER BY
    * quality DESC)` funnels each source's entire corpus through one
    * reducer. Here pass 1 sums tokens per (source, level) — ≤257 rows per
    * source, metadata-scale — and a window over that tiny frame yields
    * each level's higher-priority token offset, broadcast back; pass 2
    * computes the within-level running sum, so parallelism is
    * sources × levels. Level quantization is what makes the priority
    * order range-decomposable; it is part of the operator's DEFINITION
    * (both engines compute the same quantized priority), not an
    * approximation of it. All sums are BIGINT token counts — exact in any
    * engine. */
  def tokenBudgetSelect(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val base = Tables(s, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("toks")).cast(LongType))
      .withColumn("n_stop",
        expr(s"CAST(size(filter(toks, x -> x IN ${inList(stopwords)})) AS BIGINT)"))
      .withColumn("quality",
        least(col("n_tok").cast(DoubleType) / 50.0, lit(1.0)) * 0.5
          + (lit(1.0) - col("n_stop").cast(DoubleType) / col("n_tok")) * 0.5)
      .withColumn("level", expr("CAST(FLOOR(quality * 256) AS BIGINT)"))
      .select(col("source"), col("doc_id"), col("n_tok"), col("level"))
    val within = base.withColumn("wcum",
      sum(col("n_tok")).over(
        w.partitionBy(col("source"), col("level")).orderBy(col("doc_id"))))
    val offs = base.groupBy(col("source"), col("level")).agg(sum(col("n_tok")).as("c"))
      .withColumn("off", coalesce(
        sum(col("c")).over(w.partitionBy(col("source")).orderBy(col("level").desc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("source"), col("level"), col("off"))
    within.join(broadcast(offs), Seq("source", "level"))
      .withColumn("cum_tokens", col("off") + col("wcum"))
      .filter(col("cum_tokens") <= TokenBudget)
      .select(col("source"), col("doc_id"), col("n_tok"), col("level"), col("cum_tokens"))
      .orderBy(col("source"), col("doc_id"))
  }

  /** Interpolated bigram LM scoring (q116) — the context-aware upgrade of
    * q91's unigram scorer: each transition i→i+1 scores
    * λ·p(tᵢ₊₁|tᵢ) + (1−λ)·p(tᵢ₊₁) with λ=0.75 (Jelinek-Mercer
    * interpolation; the backoff to unigram mass is what keeps unseen
    * transitions from zeroing a document). Per-document output is the
    * mean and min transition probability — the repetition/fluency signal
    * a perplexity filter thresholds, kept log-free (probabilities, not
    * logprobs: ln() is libm-dependent and breaks bitwise cross-engine
    * parity; mean-p orders documents the same way mean-logp does NOT, but
    * both are standard filter signals and this one is portable).
    * λ = 3/4 and 1−λ = 1/4 are powers of two — exact in any
    * decimal-or-double literal parse.
    *
    * Scale shape: the bigram/left-context count tables are token-keyed
    * aggregations with map-side combine (the same shuffles q111 pays);
    * the per-position probability join keys on the bigram — corpus-sized
    * but narrow rows (ids + two tokens) — and the final reduce is one
    * doc-keyed aggregate. Nothing is all-pairs; skew on a hot bigram is
    * bounded by the count tables being pre-reduced before the join. */
  def bigramLmScore(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
    val nTot = toks.agg(count(lit(1)).as("n_total"))
    val big = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(t) - 1), i -> named_struct('a', element_at(t, i), 'b', element_at(t, i + 1)))")).as("bg"))
      .select(col("doc_id"), col("bg.a").as("wa"), col("bg.b").as("wb"))
    val bc = big.groupBy(col("wa"), col("wb")).agg(count(lit(1)).as("c_ab"))
    val ca = big.groupBy(col("wa")).agg(count(lit(1)).as("c_a"))
    big.join(bc, Seq("wa", "wb")).join(ca, "wa")
      .join(uni.withColumnRenamed("tok", "wb"), "wb")
      .crossJoin(broadcast(nTot))
      .withColumn("p", expr(
        "0.75 * (CAST(c_ab AS DOUBLE) / CAST(c_a AS DOUBLE))" +
          " + 0.25 * (CAST(tf AS DOUBLE) / CAST(n_total AS DOUBLE))"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        expr("CAST(SUM(CAST(FLOOR(p * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12")
          .as("sum_p"),
        min(col("p")).as("min_p"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("sum_p") / col("n_bigrams")).as("mean_p"), col("min_p"))
      .orderBy(col("doc_id"))
  }

  /** Second-stage reranker seam (q117) — where a production deployment
    * calls a cross-encoder model on (query, document) pairs. The trait is
    * the full integration surface: batching, retries, and the model client
    * live behind it (same altitude as the q59 Embedder seam). The offline
    * default is deterministic and SQL-mirrorable so the rerank PIPELINE —
    * shortlist join, per-pair scoring, re-sort, truncation — is
    * value-gated end-to-end in this zero-egress sandbox. */
  trait Reranker extends Serializable {
    def score(queryId: Long, text: String): Double
  }
  object HashReranker extends Reranker {
    def score(queryId: Long, text: String): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(s"rr:$queryId:$text".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val byte = Integer.parseInt(hex.substring(0, 2), 16)
      byte.toDouble / 256.0
    }
  }
  val RerankKeep = 3

  /** Retrieve → rerank (q117): the canonical two-stage search pipeline —
    * BM25 produces the cheap top-[[Bm25TopN]] shortlist (q112's gated
    * stage 1), the [[Reranker]] scores only those queries × 10 pairs, and
    * the final order is the reranker's. Model-call economics are the
    * point: the expensive scorer touches the shortlist, never the corpus.
    *
    * Scale shape: the shortlist (queries × 10 rows) BROADCASTS into the
    * documents join to fetch text — the corpus never shuffles for stage 2
    * — and the rerank window runs over shortlist-sized groups. The one
    * per-row UDF is the deliberate model seam, outside any corpus-sized
    * plan. */
  def rerankTopK(s: SparkSession, dir: String,
      reranker: Reranker = HashReranker): DataFrame = {
    s.udf.register("rerank_score",
      (qid: Long, text: String) => reranker.score(qid, text))
    val shortlist = bm25TopK(s, dir)
      .select(col("query_id"), col("rn").as("retrieval_rn"), col("doc_id"))
    val withText = broadcast(shortlist)
      .join(Tables(s, dir, "documents").select(col("doc_id"), col("text")), "doc_id")
      .withColumn("rr_score", expr("rerank_score(query_id, text)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("rr_score").desc, col("doc_id"))
    withText.withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= RerankKeep)
      .select(col("query_id"), col("rn"), col("doc_id"),
        col("retrieval_rn"), col("rr_score"))
      .orderBy(col("query_id"), col("rn"))
  }

  val MaxPTopN = 5

  /** Passage retrieval with MaxP document aggregation (q118, Dai & Callan
    * 2019's BERT-MaxP shape with BM25 as the passage scorer): score every
    * q39 fixed-window chunk as its own BM25 "document" (chunk-level df and
    * length normalization — long documents no longer dilute a locally
    * relevant passage), then rank documents by their BEST chunk. The
    * retrieval answer carries `best_chunk`, which is the snippet/grounding
    * answer a RAG pipeline actually wants. Chunks are character windows,
    * so window-edge partial tokens score as their own terms — identical in
    * both engines; a token-aligned chunker is a parameter choice, not a
    * correctness one.
    *
    * Scale shape: chunk postings are the q112 index build over the chunk
    * table (one shuffle each, keyed by (doc, chunk, token)); the query set
    * broadcasts into the probe; MaxP is one (query, doc)-keyed max — the
    * struct-max tie-break (higher score, then lower chunk_id) is
    * deterministic in both engines. Nothing touches more than the matched
    * chunk postings. */
  def passageMaxP(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val chunks = chunkDocuments(s, dir)
      .select(col("doc_id"), col("chunk_id"), col("chunk_text"))
    val toks = chunks.select(col("doc_id"), col("chunk_id"),
      explode(split(col("chunk_text"), " ")).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("chunk_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col("doc_id"), col("chunk_id")).agg(count(lit(1)).as("dl"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("n_toks"))
      .withColumn("avgdl", expr("CAST(n_toks AS DOUBLE) / CAST(n_docs AS DOUBLE)"))
      .select(col("n_docs"), col("avgdl"))
    val q = bm25Queries.flatMap { case (qid, ts) => ts.map(qid -> _) }
      .toDF("query_id", "tok")
    val qd = broadcast(q).join(dfreq, "tok")
    val scored = broadcast(qd).join(tf, "tok")
      .join(dl, Seq("doc_id", "chunk_id"))
      .crossJoin(broadcast(stats))
      .withColumn("p", expr(bm25TermScore("tf", "df", "dl", "n_docs", "avgdl")))
      .groupBy(col("query_id"), col("doc_id"), col("chunk_id"))
      .agg(expr("CAST(SUM(CAST(FLOOR(p * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12")
        .as("score"))
    val maxp = scored.groupBy(col("query_id"), col("doc_id"))
      .agg(max(struct(col("score"), (-col("chunk_id")).as("nc"))).as("m"))
      .select(col("query_id"), col("doc_id"),
        col("m.score").as("score"), (-col("m.nc")).as("best_chunk"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id"))
    maxp.withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= MaxPTopN)
      .select(col("query_id"), col("rn"), col("doc_id"), col("best_chunk"), col("score"))
      .orderBy(col("query_id"), col("rn"))
  }

  /** Cross-source quality calibration (q122): each document's quality
    * PERCENTILE within its own source — the comparable signal when raw
    * quality scores are miscalibrated across domains (a 0.9 from a clean
    * wiki source and a 0.9 from raw crawl mean different things; the 95th
    * percentile of each means the same). Rank is over the quantized
    * priority (level = FLOOR(quality·256) ascending, doc_id tie-break) —
    * the same range-decomposable order as q115, and like there it is the
    * operator's definition, making the q73/q115 two-pass shape apply:
    * per-(source, level) counts broadcast as lower-level offsets,
    * within-level ranks run sources × levels wide, never one reducer per
    * source. percentile = rank / n_source (one double division). */
  def qualityCalibration(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val base = Tables(s, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("toks")).cast(LongType))
      .withColumn("n_stop",
        expr(s"CAST(size(filter(toks, x -> x IN ${inList(stopwords)})) AS BIGINT)"))
      .withColumn("quality",
        least(col("n_tok").cast(DoubleType) / 50.0, lit(1.0)) * 0.5
          + (lit(1.0) - col("n_stop").cast(DoubleType) / col("n_tok")) * 0.5)
      .withColumn("level", expr("CAST(FLOOR(quality * 256) AS BIGINT)"))
      .select(col("source"), col("doc_id"), col("quality"), col("level"))
    val within = base.withColumn("wrn",
      row_number().over(
        w.partitionBy(col("source"), col("level")).orderBy(col("doc_id"))).cast(LongType))
    val offs = base.groupBy(col("source"), col("level")).agg(count(lit(1)).as("c"))
      .withColumn("off", coalesce(
        sum(col("c")).over(w.partitionBy(col("source")).orderBy(col("level"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("source"), col("level"), col("off"))
    val nSrc = base.groupBy(col("source")).agg(count(lit(1)).as("n_source"))
    within.join(broadcast(offs), Seq("source", "level"))
      .join(broadcast(nSrc), "source")
      .withColumn("rank", col("off") + col("wrn"))
      .withColumn("pct",
        expr("CAST(rank AS DOUBLE) / CAST(n_source AS DOUBLE)"))
      .select(col("source"), col("doc_id"), col("quality"), col("level"),
        col("rank"), col("pct"))
      .orderBy(col("source"), col("doc_id"))
  }

  /** Per-group cap for the deterministic group sample (q157). */
  val GroupSampleK = 5

  /** Deterministic k-per-group subsample (q157) — the per-language /
    * per-source CAP every mixture recipe needs ("at most N docs from X"):
    * keep each group's k smallest `md5('grp:' || doc_id)` ranks. Hash
    * ranks make it a uniform random sample that is reproducible across
    * engines, retries and partitionings (the [[stratifiedSample]]
    * argument), and the native TopKPerKey operator bounds the work: ≤ k
    * rows per group per partition cross the wire, no per-group sort — on
    * a 100 TB corpus with a handful of languages this is the difference
    * between a metadata shuffle and re-sorting the corpus (q34's
    * low-cardinality-key analysis). */
  def groupSample(s: SparkSession, dir: String): DataFrame = {
    val keyed = Tables(s, dir, "documents")
      .select(col("lang"), col("doc_id"),
        md5(concat(lit("grp:"), col("doc_id").cast(StringType))).as("sk"))
    graft.plans.TopK.topKPerKey(keyed, GroupSampleK,
        Seq("lang"), Seq(graft.plans.TopK.Ord("sk"), graft.plans.TopK.Ord("doc_id")))
      .select(col("lang"), col("rank"), col("doc_id"), col("sk"))
      .orderBy(col("lang"), col("rank"))
  }

  val KmvK = 32

  /** Bottom-k (KMV) distinct-count sketch per source (q121, Bar-Yossef et
    * al. 2002): estimate each source's vocabulary size from only its k
    * smallest token hashes — D̂ = (k−1)/v where v is the k-th smallest
    * hash mapped to [0,1). Unlike HLL (whose register layout differs
    * engine to engine), the bottom-k sketch is a DETERMINISTIC function of
    * the data — both engines compute the identical estimate bit for bit —
    * which is what makes an approximate-cardinality operator gateable
    * here, and mergeable in production (union of sketches = sketch of
    * union: keep the k smallest of the merged candidates).
    *
    * Scale shape: the candidate set reduces to distinct (source, token)
    * once, then the native TopKPerKey physical operator (q16's) keeps a
    * bounded k-row heap per source — no per-source sort, no full-group
    * materialization. The [0,1) mapping reads 15 hex nibbles as an exact
    * BIGINT (< 2⁶⁰) and divides by 2⁶⁰ — a power of two, so the scaling
    * is exact in both engines. n_distinct is carried alongside to expose
    * the estimator's error, which is the point of the panel. */
  def vocabSketch(s: SparkSession, dir: String): DataFrame = {
    val sigs = Tables(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .distinct()
      .withColumn("h", md5(col("tok")))
    val bottom = graft.plans.TopK.topKPerKey(
      sigs.select(col("source"), col("h")), KmvK,
      Seq("source"), Seq(graft.plans.TopK.Ord("h")))
    def nibSum(c: String): String =
      (1 to 15).map { i =>
        val pow = java.math.BigInteger.valueOf(16L).pow(15 - i)
        s"CAST(instr('0123456789abcdef', substr($c, $i, 1)) - 1 AS BIGINT) * $pow"
      }.mkString(" + ")
    val kth = bottom.groupBy(col("source"))
      .agg(max(struct(col("rank"), col("h"))).as("m"), count(lit(1)).as("k"))
      .select(col("source"), col("k"), col("m.h").as("kth_h"))
      .withColumn("kth_frac", expr(
        s"CAST(${nibSum("kth_h")} AS DOUBLE) / CAST(1152921504606846976 AS DOUBLE)"))
    val exact = sigs.groupBy(col("source")).agg(count(lit(1)).as("n_distinct"))
    exact.join(kth, "source")
      .withColumn("estimate", expr("CAST(k - 1 AS DOUBLE) / kth_frac"))
      .withColumn("err_ratio", expr("estimate / CAST(n_distinct AS DOUBLE)"))
      .select(col("source"), col("n_distinct"), col("k"), col("kth_frac"),
        col("estimate"), col("err_ratio"))
      .orderBy(col("source"))
  }

  /** KMV set OPERATIONS between per-source vocabulary sketches (q156,
    * Beyer et al., SIGMOD 2007): for every source pair, the merged
    * bottom-k sketch estimates |A ∪ B| (as (k−1)/v over the merged k-th
    * hash), the fraction of merged-sketch members present in BOTH
    * originals estimates Jaccard, and their product estimates |A ∩ B| —
    * overlap analytics (shared vocabulary, near-duplicate sources, cross
    * contamination) from sketches alone, without ever joining the
    * underlying sets. The estimates sit next to the exact values so the
    * panel exposes its own error, like q121.
    *
    * The determinism argument is q121's: a bottom-k sketch is a pure
    * function of the data, so every derived estimate is bitwise identical
    * in any engine — unlike HLL-family sketch unions. Mergeability is the
    * production story at 100 TB: per-partition/per-day sketches union by
    * keeping the k smallest hashes, so the pairwise panel runs on
    * |sources|² × k metadata rows, never on the vocabularies.
    *
    * Scale shape: one distinct (source, token) reduce (map-side combine),
    * the bounded TopKPerKey heap per source, then everything downstream is
    * sketch-sized (|sources|² × 2k rows); the exact columns are
    * vocabulary-keyed joins with map-side-combined counts — the same cost
    * class as q96's drift grid. */
  def kmvSetOps(s: SparkSession, dir: String): DataFrame =
    kmvSetOpsFrom(Tables(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .distinct())

  /** [[kmvSetOps]]'s core over an explicit distinct (source, tok) frame —
    * split out so the small-sketch estimator case (a source pair with
    * fewer than [[KmvK]] distinct hashes, absent from the sf fixtures) is
    * testable directly. */
  private[graft] def kmvSetOpsFrom(v: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val sigs = v.withColumn("h", md5(col("tok")))
    val bottom = graft.plans.TopK.topKPerKey(
        sigs.select(col("source"), col("h")), KmvK,
        Seq("source"), Seq(graft.plans.TopK.Ord("h")))
      .select(col("source"), col("h"))
    val sources = v.select(col("source")).distinct()
    val pairs = sources.toDF("sa").crossJoin(sources.toDF("sb"))
      .filter(col("sa") < col("sb"))
    val tagged = broadcast(pairs).join(bottom, col("source") === col("sa"))
      .select(col("sa"), col("sb"), col("h"), lit(1L).as("ina"), lit(0L).as("inb"))
      .union(broadcast(pairs).join(bottom, col("source") === col("sb"))
        .select(col("sa"), col("sb"), col("h"), lit(0L).as("ina"), lit(1L).as("inb")))
      .groupBy(col("sa"), col("sb"), col("h"))
      .agg(max(col("ina")).as("ina"), max(col("inb")).as("inb"))
    val merged = tagged.withColumn("rn",
        row_number().over(w.partitionBy(col("sa"), col("sb")).orderBy(col("h"))))
      .filter(col("rn") <= KmvK)
    def nibSum(c: String): String =
      (1 to 15).map { i =>
        val pow = java.math.BigInteger.valueOf(16L).pow(15 - i)
        s"CAST(instr('0123456789abcdef', substr($c, $i, 1)) - 1 AS BIGINT) * $pow"
      }.mkString(" + ")
    val est = merged.groupBy(col("sa"), col("sb"))
      .agg(count(lit(1)).as("km"),
        sum(col("ina") * col("inb")).as("nboth"),
        max(col("h")).as("kth_h"))
      .withColumn("kth_frac", expr(
        s"CAST(${nibSum("kth_h")} AS DOUBLE) / CAST(1152921504606846976 AS DOUBLE)"))
    val exactCounts = v.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val exactInter = broadcast(pairs)
      .join(v.toDF("sa", "tok"), "sa")
      .join(v.toDF("sb", "tok2").withColumnRenamed("tok2", "tok"), Seq("sb", "tok"))
      .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("exact_inter"))
    est
      .join(exactCounts.toDF("sa", "na"), "sa")
      .join(exactCounts.toDF("sb", "nb"), "sb")
      .join(exactInter, Seq("sa", "sb"), "left")
      .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
      // Beyer et al. small-set case: the (km−1)/kth_frac estimator is only
      // valid for a FULL sketch; with km < KmvK the merged sketch already
      // holds the entire union, so the union IS km exactly.
      .withColumn("union_est", when(col("km") < KmvK, col("km").cast(DoubleType))
        .otherwise((col("km") - lit(1L)).cast(DoubleType) / col("kth_frac")))
      .select(col("sa").as("source_a"), col("sb").as("source_b"), col("km").as("k"),
        (col("nboth").cast(DoubleType) / col("km")).as("jaccard_est"),
        col("union_est"),
        ((col("nboth").cast(DoubleType) / col("km")) * col("union_est"))
          .as("inter_est"),
        (col("exact_inter").cast(DoubleType) /
          (col("na") + col("nb") - col("exact_inter")).cast(DoubleType))
          .as("jaccard_exact"),
        (col("na") + col("nb") - col("exact_inter")).as("union_exact"),
        col("exact_inter"))
      .orderBy(col("source_a"), col("source_b"))
  }

  // ------------------------------------------------------- BM25 retrieval

  /** Fixed literal query term sets — the retrieval benchmark shape (a
    * handful of keyword queries against the whole corpus). */
  val bm25Queries: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("scan", "filter", "table"),
    1L -> Seq("join", "merge", "window"),
    2L -> Seq("stream", "batch", "data"),
    3L -> Seq("vector", "hash", "group"))
  val Bm25TopN = 10

  /** Per-term BM25 score with k1=1.2, b=0.75 — SAME text in Spark and
    * DuckDB so the double arithmetic is bit-identical (+,−,×,/ are
    * IEEE-correctly-rounded in every engine). The idf keeps the classic
    * BM25 argument (n−df+0.5)/(df+0.5)+1 but WITHOUT the outer ln():
    * logarithms are libm-dependent and break bitwise cross-engine parity
    * (same discipline as q35's ratio idf and the lift-based q111). The
    * rational idf is a monotone transform of the standard one, so ranking
    * behavior per term is preserved; absolute scores are not ln-scaled. */
  private[graft] def bm25TermScore(tf: String, df: String, dl: String,
      nDocs: String, avgdl: String): String =
    s"((CAST($nDocs AS DOUBLE) - CAST($df AS DOUBLE) + 0.5) / (CAST($df AS DOUBLE) + 0.5) + 1.0)" +
      s" * ((CAST($tf AS DOUBLE) * 2.2) / (CAST($tf AS DOUBLE)" +
      s" + 1.2 * (0.25 + 0.75 * CAST($dl AS DOUBLE) / $avgdl)))"

  /** BM25 top-10 per query over the corpus (q112) — the lexical ranked-
    * retrieval operator proper (q90's hybrid fusion uses a raw tf·idf
    * product; this is the calibrated tf-saturating, length-normalized
    * scorer a retrieval user expects).
    *
    * Scale shape: tf/df/dl are the standard one-shuffle-each inverted-
    * index side tables a deployment precomputes; the query set is tiny and
    * BROADCASTS into the df lookup and then into the tf postings probe, so
    * the corpus-sized side never reshuffles for the probe — per-query work
    * is O(postings of its terms), never a corpus scan. The dl (doc-norm)
    * join keys on doc_id over exactly the matched postings, and the final
    * top-k is a per-query window over candidate docs only. Summation over
    * a query's matched terms uses the floor-quantized DECIMAL(38,0)
    * accumulator (order-independent, cross-engine exact). */
  /** The batch lexical-index build: one postings table
    * (doc_id, tok, tf, dl) from two token-keyed aggregations — the
    * one-time corpus-wide shuffle a deployment pays to build the index.
    * graft.streaming.StreamLex maintains the SAME table incrementally
    * (per-arriving-doc, stateless) and StreamLexSpec proves the two
    * builds row-identical. */
  private[graft] def lexPostings(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    tf.join(dl, "doc_id")
      .select(col("doc_id"), col("tok"), col("tf"), col("dl"))
  }

  /** BM25 search over ANY postings table — batch-built or stream-built,
    * the caller should not be able to tell. df and the corpus stats
    * derive from the postings themselves (distinct doc norms / token
    * document counts), so the index file is self-contained. */
  private[graft] def bm25Over(postings: DataFrame, s: SparkSession): DataFrame = {
    import s.implicits._
    val dfreq = postings.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val dl = postings.select(col("doc_id"), col("dl")).distinct()
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("n_toks"))
      .withColumn("avgdl", expr("CAST(n_toks AS DOUBLE) / CAST(n_docs AS DOUBLE)"))
      .select(col("n_docs"), col("avgdl"))
    val q = bm25Queries.flatMap { case (qid, ts) => ts.map(qid -> _) }
      .toDF("query_id", "tok")
    val qd = broadcast(q).join(dfreq, "tok")
    val scored = broadcast(qd).join(postings, "tok")
      .crossJoin(broadcast(stats))
      .withColumn("p", expr(bm25TermScore("tf", "df", "dl", "n_docs", "avgdl")))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(expr("CAST(SUM(CAST(FLOOR(p * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12")
        .as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= Bm25TopN)
      .select(col("query_id"), col("rn"), col("doc_id"), col("score"))
      .orderBy(col("query_id"), col("rn"))
  }

  def bm25TopK(s: SparkSession, dir: String): DataFrame =
    bm25Over(lexPostings(Tables(s, dir, "documents")), s)

  /** Count-min sketch geometry for q132: [[CmsDepth]] independent md5-keyed
    * hash rows × [[CmsWidth]] cells. Width 16 (one hex nibble) is sized to
    * FORCE collisions on this corpus so the estimate/exact gap is a real
    * measurement; production sizes width ≈ e/ε for target overcount ε·N. */
  val CmsDepth = 4
  val CmsWidth = 16
  val CmsTopK = 20

  private[graft] def cmsHash(i: Int, instrFn: String, word: String): String =
    s"($instrFn('0123456789abcdef', substr(md5(concat('cms$i:', $word)), 1, 1)) - 1)"

  /** Count-min sketch heavy hitters (q132): the mergeable frequency
    * structure a 100 TB term-stats job actually ships — each executor
    * sketches its partition into a depth×width integer grid, grids merge
    * by cell-wise addition (one tiny reduce, never a vocab-sized shuffle),
    * and any term's count is estimated as the MIN over its depth cells
    * (overcount-only error ≤ ε·N with prob 1-δ). The panel reports the
    * top-[[CmsTopK]] true heavy hitters with exact count, CMS estimate and
    * the realized overcount — the validation a user sizing depth/width
    * reads. Deterministic: hashes are md5 nibbles, all math integer.
    *
    * The gate form computes cells from the exact word-count table (so the
    * DuckDB mirror is the same aggregation); the streaming/mapPartitions
    * form would sketch rows directly — identical cell contents by
    * additivity. */
  def cmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val wc = Tables(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val withH = (0 until CmsDepth).map(i =>
      wc.select(col("word"), col("cnt"), lit(i).as("r"),
        expr(cmsHash(i, "instr", "word")).cast(LongType).as("h"))).reduce(_ union _)
    val cells = withH.groupBy(col("r"), col("h")).agg(sum(col("cnt")).as("total"))
    withH.join(cells, Seq("r", "h"))
      .groupBy(col("word"))
      .agg(max(col("cnt")).as("n_exact"), min(col("total")).as("cms_est"))
      .select(col("word"), col("n_exact"), col("cms_est"),
        (col("cms_est") - col("n_exact")).as("overcount"))
      .orderBy(col("n_exact").desc, col("word"))
      .limit(CmsTopK)
  }

  /** DuckDB mirror of [[cmsHeavyHitters]]. */
  private[ops] def cmsOracleSql: String = {
    val wh = (0 until CmsDepth).map(i =>
      s"SELECT word, cnt, $i AS r, ${cmsHash(i, "strpos", "word")} AS h FROM wc")
      .mkString("\n  UNION ALL ")
    s"""WITH wc AS (
       |  SELECT word, COUNT(*) AS cnt FROM (
       |    SELECT unnest(string_split(text, ' ')) AS word FROM documents) w
       |  WHERE word <> '' GROUP BY word),
       |wh AS (
       |  $wh),
       |cells AS (SELECT r, h, CAST(SUM(cnt) AS BIGINT) AS total
       |          FROM wh GROUP BY r, h)
       |SELECT wh.word, CAST(MAX(wh.cnt) AS BIGINT) AS n_exact,
       |  CAST(MIN(c.total) AS BIGINT) AS cms_est,
       |  CAST(MIN(c.total) - MAX(wh.cnt) AS BIGINT) AS overcount
       |FROM wh JOIN cells c ON c.r = wh.r AND c.h = wh.h
       |GROUP BY wh.word
       |ORDER BY n_exact DESC, word LIMIT $CmsTopK""".stripMargin
  }
}

object TextOps {
  import TextOpsImpl._

  private val stopSql = stopwords.map(s => s"'$s'").mkString("(", ", ", ")")

  def queries: Seq[Q] = Seq(
    Q("q30_text_tokens", tokenCounts, Some(
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("q31_text_quality", qualityScore, Some(
      s"""WITH t AS (
         |  SELECT doc_id, length(text) AS n_chars,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x IN $stopSql)) AS BIGINT) AS n_stop
         |  FROM documents)
         |SELECT doc_id, n_tok, n_stop,
         |  CAST(n_stop AS DOUBLE) / n_tok AS stop_ratio,
         |  (CAST(n_chars AS DOUBLE) - (n_tok - 1)) / n_tok AS avg_tok_len,
         |  least(CAST(n_tok AS DOUBLE) / 50.0, 1.0) * 0.5
         |    + (1.0 - CAST(n_stop AS DOUBLE) / n_tok) * 0.5 AS quality
         |FROM t ORDER BY doc_id""".stripMargin), headline = true),

    Q("q32_text_langid", languageId, Some {
      val scores = langMarkers.map { case (lang, ms) =>
        s"CAST(len(list_filter(string_split(text, ' '), x -> x IN ${ms.map(m => s"'$m'").mkString("(", ", ", ")")})) AS BIGINT) AS score_$lang"
      }.mkString(",\n    ")
      s"""WITH t AS (SELECT doc_id, $scores FROM documents)
         |SELECT doc_id, score_en, score_es, score_de,
         |  CASE WHEN greatest(score_en, score_es, score_de) = 0 THEN 'und'
         |       WHEN score_en >= score_es AND score_en >= score_de THEN 'en'
         |       WHEN score_es >= score_de THEN 'es'
         |       ELSE 'de' END AS pred_lang
         |FROM t ORDER BY doc_id""".stripMargin
    }),

    Q("q34_text_top_terms", topTermsPerLang, Some(
      """WITH tf AS (
        |  SELECT lang, tok, COUNT(*) AS tf FROM (
        |    SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY lang, tok),
        |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY tf DESC, tok) AS BIGINT) AS rn FROM tf)
        |SELECT lang, rn, tok, tf FROM r WHERE rn <= 5 ORDER BY lang, rn""".stripMargin)),

    Q("q33_text_fingerprint", fingerprint, Some(
      """SELECT doc_id,
        |  list_min(list_transform(generate_series(1, length(text) - 4),
        |    i -> md5(substr(text, i, 5)))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("q101_text_winnow", winnowFingerprints, Some(
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |psh AS (
         |  SELECT doc_id, CAST(len(t) AS BIGINT) AS ntok, i AS pos,
         |    md5(t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]) AS h
         |  FROM t, unnest(generate_series(1, len(t) - ${WinnowK - 1})) AS u(i)
         |  WHERE len(t) >= $WinnowK),
         |win AS (
         |  SELECT doc_id, pos, ntok,
         |    MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING) AS fp
         |  FROM psh)
         |SELECT DISTINCT doc_id, fp FROM win
         |WHERE pos <= ntok - ${WinnowK - 1} - ${WinnowW - 1}
         |ORDER BY doc_id, fp""".stripMargin)),

    Q("q102_text_winnow_pairs", winnowSharedPassages, Some(
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |psh AS (
         |  SELECT doc_id, CAST(len(t) AS BIGINT) AS ntok, i AS pos,
         |    md5(t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]) AS h
         |  FROM t, unnest(generate_series(1, len(t) - ${WinnowK - 1})) AS u(i)
         |  WHERE len(t) >= $WinnowK),
         |win AS (
         |  SELECT doc_id, pos, ntok,
         |    MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING) AS fp
         |  FROM psh),
         |fp AS (SELECT DISTINCT doc_id, fp FROM win
         |       WHERE pos <= ntok - ${WinnowK - 1} - ${WinnowW - 1}),
         |rare AS (SELECT fp FROM fp GROUP BY fp HAVING COUNT(*) <= $WinnowDfCap),
         |k AS (SELECT f.doc_id, f.fp FROM fp f JOIN rare USING (fp))
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_shared
         |FROM k a JOIN k b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING COUNT(*) >= $WinnowMinShared
         |ORDER BY a_id, b_id""".stripMargin)),

    Q("q35_text_tfidf", tfidfTopTerms, Some(
      """WITH tf AS (
        |  SELECT doc_id, tok, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY doc_id, tok),
        |dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |sc AS (
        |  SELECT t.doc_id, t.tok, t.tf, d.df,
        |    CAST(t.tf AS DOUBLE) * (CAST(n.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE)) AS tfidf
        |  FROM tf t JOIN dfreq d USING (tok) CROSS JOIN n),
        |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, tok) AS BIGINT) AS rn FROM sc)
        |SELECT doc_id, rn, tok, tf, df, tfidf FROM r WHERE rn <= 3
        |ORDER BY doc_id, rn""".stripMargin)),

    Q("q36_text_sample", stratifiedSample, Some {
      val byteSql =
        "(strpos('0123456789abcdef', substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16" +
          " + (strpos('0123456789abcdef', substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)"
      val thresholdSql = "CASE " + stratifiedThresholdCases + " ELSE 256 END"
      s"""SELECT doc_id, lang, bucket FROM (
         |  SELECT doc_id, lang, CAST($byteSql AS BIGINT) AS bucket,
         |    CAST($thresholdSql AS BIGINT) AS threshold
         |  FROM documents)
         |WHERE bucket < threshold ORDER BY doc_id""".stripMargin
    }),

    Q("q38_text_len_quantiles", lengthQuantiles, Some {
      // CAST(p AS DOUBLE): DuckDB parses bare 0.9 as DECIMAL (exact
      // arithmetic) while Spark's lit(0.9) is a double — the rank fraction
      // must be computed in double on BOTH engines to match bitwise
      def pd(p: Double) = s"CAST($p AS DOUBLE)"
      val loHi = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99).flatMap { case (tag, p) =>
        Seq(
          s"MAX(CASE WHEN cum - c + 1 <= FLOOR((n-1)*${pd(p)})+1 AND FLOOR((n-1)*${pd(p)})+1 <= cum THEN v END) AS ${tag}_lo",
          s"MAX(CASE WHEN cum - c + 1 <= CEIL((n-1)*${pd(p)})+1 AND CEIL((n-1)*${pd(p)})+1 <= cum THEN v END) AS ${tag}_hi")
      }.mkString(",\n    ")
      val interps = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99).map { case (tag, p) =>
        s"CAST(${tag}_lo AS DOUBLE) + (CAST(${tag}_hi AS DOUBLE) - CAST(${tag}_lo AS DOUBLE)) * ((n-1)*${pd(p)} - FLOOR((n-1)*${pd(p)})) AS $tag"
      }.mkString(",\n  ")
      s"""WITH t AS (
         |  SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS v FROM documents),
         |vc AS (SELECT lang, v, COUNT(*) AS c FROM t GROUP BY lang, v),
         |cum AS (
         |  SELECT lang, v, c,
         |    SUM(c) OVER (PARTITION BY lang ORDER BY v) AS cum,
         |    SUM(c) OVER (PARTITION BY lang) AS n
         |  FROM vc),
         |a AS (SELECT lang, CAST(MAX(n) AS BIGINT) AS n,
         |    $loHi
         |  FROM cum GROUP BY lang)
         |SELECT lang, n,
         |  $interps
         |FROM a ORDER BY lang""".stripMargin
    }),

    Q("q39_text_chunks", chunkDocuments, Some {
      val n = s"1 + CAST(floor((greatest(length(text) - $ChunkSize, 0) + ${ChunkStride - 1}) / ${ChunkStride}.0) AS BIGINT)"
      s"""WITH c AS (
         |  SELECT doc_id, text,
         |    unnest(generate_series(0, ($n) - 1)) AS chunk_id
         |  FROM documents)
         |SELECT doc_id, chunk_id,
         |  chunk_id * $ChunkStride + 1 AS chunk_start,
         |  substr(text, CAST(chunk_id * $ChunkStride + 1 AS INT), $ChunkSize) AS chunk_text,
         |  CAST(length(substr(text, CAST(chunk_id * $ChunkStride + 1 AS INT), $ChunkSize)) AS BIGINT) AS chunk_chars
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin
    }),

    Q("q49_curation_pipeline", curationPipeline, Some {
      val byteSql =
        "(strpos('0123456789abcdef', substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16" +
          " + (strpos('0123456789abcdef', substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)"
      val thresholdSql = "CASE " + stratifiedThresholdCases + " ELSE 256 END"
      s"""WITH t AS (
         |  SELECT doc_id, lang, text,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x IN $stopSql)) AS BIGINT) AS n_stop
         |  FROM documents),
         |q AS (
         |  SELECT * FROM (
         |    SELECT doc_id, lang, text, n_tok,
         |      least(CAST(n_tok AS DOUBLE) / 50.0, 1.0) * 0.5
         |        + (1.0 - CAST(n_stop AS DOUBLE) / n_tok) * 0.5 AS quality
         |    FROM t)
         |  WHERE quality >= $CurationQualityMin),
         |ded AS (SELECT doc_id FROM (
         |  SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |  FROM q) WHERE rn = 1),
         |samp AS (
         |  SELECT q.doc_id, q.lang, q.n_tok, q.quality
         |  FROM q JOIN ded USING (doc_id)
         |  WHERE CAST($byteSql AS BIGINT) < ($thresholdSql)),
         |packed AS (
         |  SELECT *, SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id) AS cum FROM samp)
         |SELECT doc_id, lang, n_tok, quality,
         |  CAST(FLOOR((cum - n_tok) / 512) AS BIGINT) AS bin
         |FROM packed ORDER BY lang, doc_id""".stripMargin
    }),

    Q("q72_text_truncate", truncateTokens, Some(
      s"""SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |  least(CAST(len(string_split(text, ' ')) AS BIGINT), ${TruncateTokens}) AS kept_tok,
         |  array_to_string(list_slice(string_split(text, ' '), 1, $TruncateTokens), ' ') AS truncated,
         |  CAST(length(array_to_string(list_slice(string_split(text, ' '), 1, $TruncateTokens), ' ')) AS BIGINT) AS truncated_chars
         |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("q170_text_temperature_mix", temperatureMixture, Some {
      val hash16 = (1 to 4).map { p =>
        s"(strpos('0123456789abcdef', substr(md5('tmp:' || CAST(doc_id AS VARCHAR)), $p, 1)) - 1) * ${1 << (4 * (4 - p))}"
      }.mkString(" + ")
      s"""WITH per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_avail
         |  FROM documents GROUP BY source),
         |tot AS (SELECT CAST(SUM(n_avail) AS BIGINT) AS n_total FROM per),
         |sh AS (SELECT source, n_avail,
         |    CAST(n_avail AS DOUBLE) / CAST(n_total AS DOUBLE) AS share,
         |    sqrt(CAST(n_avail AS DOUBLE) / CAST(n_total AS DOUBLE)) AS w,
         |    n_total
         |  FROM per, tot),
         |sw AS (SELECT CAST(SUM(CAST(FLOOR(w * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS sumw
         |  FROM sh),
         |rates AS (SELECT source, n_avail, share, w / sumw AS target_share,
         |    LEAST(1.0, (w / sumw) * CAST(n_total AS DOUBLE) / CAST(n_avail AS DOUBLE)) AS keep_rate
         |  FROM sh, sw),
         |kept AS (
         |  SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_kept
         |  FROM documents d JOIN rates r USING (source)
         |  WHERE CAST($hash16 AS DOUBLE) / 65536.0 < r.keep_rate
         |  GROUP BY d.source)
         |SELECT r.source, r.n_avail, r.share, r.target_share, r.keep_rate,
         |  COALESCE(k.n_kept, 0) AS n_kept
         |FROM rates r LEFT JOIN kept k USING (source)
         |ORDER BY r.source""".stripMargin
    }),

    Q("q80_text_mixture", mixtureSample, Some {
      val hash16 = (1 to 4).map { p =>
        s"(strpos('0123456789abcdef', substr(md5('mix:' || CAST(doc_id AS VARCHAR)), $p, 1)) - 1) * ${1 << (4 * (4 - p))}"
      }.mkString(" + ")
      s"""WITH per AS (
         |  SELECT source, COUNT(*) AS n_avail,
         |    CASE WHEN CAST(substr(source, 4, 10) AS INT) % 2 = 0 THEN 2.0 ELSE 1.0 END AS w
         |  FROM documents GROUP BY source),
         |tot AS (SELECT SUM(w) AS sumw FROM per),
         |sh AS (SELECT source, n_avail, w / sumw AS target_share,
         |    n_avail / (w / sumw) AS feasible FROM per, tot),
         |tm AS (SELECT MIN(feasible) AS t_total FROM sh),
         |rates AS (SELECT source, n_avail, target_share,
         |    least(1.0, target_share * t_total / n_avail) AS keep_rate FROM sh, tm),
         |kept AS (
         |  SELECT d.source, COUNT(*) AS n_kept
         |  FROM documents d JOIN rates r USING (source)
         |  WHERE CAST($hash16 AS DOUBLE) / 65536.0 < r.keep_rate
         |  GROUP BY d.source)
         |SELECT r.source, r.n_avail, r.target_share, r.keep_rate,
         |  CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
         |FROM rates r LEFT JOIN kept k ON k.source = r.source
         |ORDER BY r.source""".stripMargin
    }),

    Q("q73_text_shuffle", deterministicShuffle, Some {
      val byte = "(strpos('0123456789abcdef', substr(skey, 1, 1)) - 1) * 16" +
        " + (strpos('0123456789abcdef', substr(skey, 2, 1)) - 1)"
      s"""WITH k AS (
         |  SELECT doc_id, md5('shuf:' || CAST(doc_id AS VARCHAR)) AS skey
         |  FROM documents),
         |b AS (SELECT doc_id, skey, CAST($byte AS BIGINT) AS bucket FROM k),
         |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY bucket
         |    ORDER BY skey, doc_id) AS BIGINT) AS rn FROM b),
         |sz AS (SELECT bucket, COUNT(*) AS c FROM b GROUP BY bucket),
         |off AS (SELECT bucket, COALESCE(SUM(c) OVER (ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off FROM sz)
         |SELECT doc_id, skey AS shuffle_key, CAST(off + rn AS BIGINT) AS shuffle_pos
         |FROM r JOIN off USING (bucket)
         |ORDER BY shuffle_pos""".stripMargin
    }),

    Q("q71_text_cdc_chunks", contentDefinedChunks, Some {
      def byteOf(h: String) =
        s"(strpos('0123456789abcdef', substr($h, 1, 1)) - 1) * 16" +
          s" + (strpos('0123456789abcdef', substr($h, 2, 1)) - 1)"
      s"""WITH pos AS (
         |  SELECT doc_id, text, length(text) AS len,
         |    unnest(generate_series(1, greatest(length(text) - ${CdcWindow - 1}, 1))) AS i
         |  FROM documents),
         |b AS (
         |  SELECT doc_id, text, len, i FROM pos
         |  WHERE i = 1 OR ${byteOf(s"md5(substr(text, CAST(i AS INT), $CdcWindow))")} < $CdcBoundaryMax),
         |c AS (
         |  SELECT doc_id, text, len, i,
         |    LEAD(i) OVER (PARTITION BY doc_id ORDER BY i) AS nxt,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS BIGINT) AS chunk_idx
         |  FROM b)
         |SELECT doc_id, chunk_idx, CAST(i AS BIGINT) AS chunk_start,
         |  CAST(coalesce(nxt - 1, len) - i + 1 AS BIGINT) AS chunk_len,
         |  md5(substr(text, CAST(i AS INT), CAST(coalesce(nxt - 1, len) - i + 1 AS INT))) AS chunk_md5
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin
    }),

    Q("q48_text_repetition", repetitionSignals, Some(
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS tok,
        |    unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok),
        |stats AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
        |    COUNT(*) AS n_distinct FROM tf GROUP BY doc_id),
        |tt AS (SELECT doc_id, tok AS top_tok, c AS top_c FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, tok) AS rn
        |  FROM tf) WHERE rn = 1),
        |bg AS (
        |  SELECT doc_id,
        |    tok || ' ' || LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
        |  FROM toks),
        |bf AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg
        |  WHERE bigram IS NOT NULL GROUP BY doc_id, bigram),
        |tb AS (SELECT doc_id, bigram AS top_bigram, c AS top_bc FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, bigram) AS rn
        |  FROM bf) WHERE rn = 1)
        |SELECT s.doc_id, n_tok, n_distinct,
        |  CAST(n_distinct AS DOUBLE) / n_tok AS distinct_ratio,
        |  top_tok, top_c AS top_tok_n,
        |  CAST(top_c AS DOUBLE) / n_tok AS top_tok_frac,
        |  top_bigram, top_bc AS top_bigram_n,
        |  CAST(top_bc AS DOUBLE) / (n_tok - 1) AS top_bigram_frac
        |FROM stats s JOIN tt USING (doc_id) JOIN tb USING (doc_id)
        |ORDER BY doc_id""".stripMargin)),

    Q("q37_text_seq_packing", sequencePacking, Some(
      """SELECT doc_id, lang, n_tok,
        |  CAST(FLOOR((cum - n_tok) / 512) AS BIGINT) AS bin
        |FROM (
        |  SELECT doc_id, lang, n_tok,
        |    SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id) AS cum
        |  FROM (
        |    SELECT doc_id, lang,
        |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |    FROM documents))
        |ORDER BY lang, doc_id""".stripMargin)),

    Q("q82_text_classifier", qualityClassifier, Some(
      s"""WITH t AS (
         |  SELECT doc_id, length(text) AS n_chars,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x IN $stopSql)) AS BIGINT) AS n_stop,
         |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_dis
         |  FROM documents),
         |f AS (
         |  SELECT doc_id, n_tok,
         |    least(CAST(n_tok AS DOUBLE) / 50.0, 1.0) AS len_sat,
         |    CAST(n_stop AS DOUBLE) / n_tok AS stop_ratio,
         |    CAST(n_dis AS DOUBLE) / n_tok AS distinct_ratio,
         |    (CAST(n_chars AS DOUBLE) - (n_tok - 1)) / n_tok AS avg_tok_len
         |  FROM t),
         |sc AS (
         |  SELECT doc_id, n_tok, len_sat, stop_ratio, distinct_ratio, avg_tok_len,
         |    $ClfBias + len_sat * 2.0 - stop_ratio * 1.5
         |      + distinct_ratio * 1.0 + avg_tok_len * 0.25 AS logit
         |  FROM f)
         |SELECT doc_id, n_tok, len_sat, stop_ratio, distinct_ratio, avg_tok_len,
         |  logit, logit >= 0.0 AS keep
         |FROM sc ORDER BY doc_id""".stripMargin)),

    Q("q84_text_rep_ngrams", repeatedNgrams, Some(
      s"""WITH d AS (
         |  SELECT doc_id, string_split(text, ' ') AS t,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, i,
         |    md5(array_to_string(list_slice(t, i, i + ${RepN - 1}), ' ')) AS gram
         |  FROM d, unnest(generate_series(1, n_tok - ${RepN - 1})) AS u(i)
         |  WHERE n_tok >= $RepN),
         |rep AS (SELECT gram FROM g GROUP BY gram
         |  HAVING COUNT(DISTINCT doc_id) >= $RepMinDocs),
         |hits AS (SELECT g.doc_id, g.i FROM g JOIN rep USING (gram)),
         |spans AS (SELECT doc_id, COUNT(*) AS n_rep_spans FROM hits GROUP BY doc_id),
         |cov AS (SELECT doc_id, COUNT(*) AS n_cov_tok FROM (
         |  SELECT DISTINCT doc_id, p
         |  FROM hits, unnest(generate_series(i, i + ${RepN - 1})) AS v(p))
         |  GROUP BY doc_id)
         |SELECT d.doc_id, d.n_tok,
         |  greatest(d.n_tok - ${RepN - 1}, 0) AS n_grams,
         |  CAST(COALESCE(s.n_rep_spans, 0) AS BIGINT) AS n_rep_spans,
         |  CAST(COALESCE(c.n_cov_tok, 0) AS BIGINT) AS n_cov_tok,
         |  CAST(COALESCE(c.n_cov_tok, 0) AS DOUBLE) / d.n_tok AS cov_frac
         |FROM d LEFT JOIN spans s USING (doc_id) LEFT JOIN cov c USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin)),

    Q("q88_text_passage_removal", removeRepeatedPassages, Some(
      s"""WITH d AS (
         |  SELECT doc_id, string_split(text, ' ') AS t,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, i,
         |    md5(array_to_string(list_slice(t, i, i + ${RepN - 1}), ' ')) AS gram
         |  FROM d, unnest(generate_series(1, n_tok - ${RepN - 1})) AS u(i)
         |  WHERE n_tok >= $RepN),
         |rep AS (SELECT gram FROM g GROUP BY gram
         |  HAVING COUNT(DISTINCT doc_id) >= $RepMinDocs),
         |cov AS (SELECT DISTINCT doc_id, p
         |  FROM g JOIN rep USING (gram), unnest(generate_series(i, i + ${RepN - 1})) AS v(p)),
         |toks AS (SELECT doc_id, CAST(p AS BIGINT) AS p, t[p] AS tok
         |  FROM d, unnest(generate_series(1, CAST(len(t) AS BIGINT))) AS u(p)),
         |kept AS (SELECT toks.doc_id, toks.p, toks.tok FROM toks
         |  ANTI JOIN cov ON cov.doc_id = toks.doc_id AND cov.p = toks.p),
         |cl AS (SELECT doc_id, COUNT(*) AS n_kept,
         |    string_agg(tok, ' ' ORDER BY p) AS cleaned
         |  FROM kept GROUP BY doc_id)
         |SELECT d.doc_id, d.n_tok,
         |  CAST(COALESCE(cl.n_kept, 0) AS BIGINT) AS n_kept,
         |  md5(COALESCE(cl.cleaned, '')) AS cleaned_md5
         |FROM d LEFT JOIN cl USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin)),

    Q("q91_text_lm_score", lmScore, Some(
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (SELECT tok, COUNT(*) AS tf FROM toks GROUP BY tok),
        |n AS (SELECT COUNT(*) AS n_total FROM toks),
        |probs AS (SELECT tok,
        |    CAST(tf AS DOUBLE) / CAST(n.n_total AS DOUBLE) AS p
        |  FROM tf CROSS JOIN n),
        |d AS (
        |  SELECT t.doc_id, COUNT(*) AS n_tok,
        |    CAST(SUM(CAST(FLOOR(p.p * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS sum_p,
        |    MIN(p.p) AS min_p
        |  FROM toks t JOIN probs p USING (tok)
        |  GROUP BY t.doc_id)
        |SELECT doc_id, n_tok, sum_p / n_tok AS mean_p, min_p
        |FROM d ORDER BY doc_id""".stripMargin)),

    Q("q98_text_oov", oovRate, Some(
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |vocab AS (SELECT DISTINCT tok FROM toks WHERE doc_id % 2 = 0),
        |inc AS (
        |  SELECT t.doc_id, CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM toks t LEFT JOIN vocab v USING (tok) WHERE t.doc_id % 2 = 1)
        |SELECT doc_id, COUNT(*) AS n_tok, CAST(SUM(oov) AS BIGINT) AS n_oov,
        |  CAST(SUM(oov) AS DOUBLE) / COUNT(*) AS oov_rate
        |FROM inc GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("q106_pii_scrub", piiSupplierScrub, Some {
      val countCols = PiiPatterns.map { case (nm, re, _) =>
        s"CAST(len(regexp_extract_all(s_name, '$re')) AS BIGINT) AS n_$nm"
      }.mkString(",\n  ")
      val redacted = PiiPatterns.foldLeft("s_name") { case (c, (_, re, tag)) =>
        s"regexp_replace($c, '$re', '$tag', 'g')"
      }
      val total = PiiPatterns.map { case (nm, _, _) => s"n_$nm" }.mkString(" + ")
      s"""SELECT s_suppkey, n_email, n_phone, n_ipv4, n_idrun, redacted FROM (
         |  SELECT s_suppkey,
         |  $countCols,
         |  $redacted AS redacted
         |  FROM supplier)
         |WHERE $total > 0 ORDER BY s_suppkey""".stripMargin
    }),

    Q("q107_text_split", trainSplit, Some {
      val byteSql =
        "(strpos('0123456789abcdef', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16" +
          " + (strpos('0123456789abcdef', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)"
      val (tr, va) = SplitThresholds
      s"""SELECT doc_id, bucket,
         |  CASE WHEN bucket < $tr THEN 'train'
         |       WHEN bucket < $va THEN 'val' ELSE 'test' END AS split
         |FROM (SELECT doc_id, CAST($byteSql AS BIGINT) AS bucket FROM documents)
         |ORDER BY doc_id""".stripMargin
    }),

    Q("q111_text_collocations", collocations, Some(
      s"""WITH t AS (
         |  SELECT string_split(text, ' ') AS t FROM documents
         |  WHERE len(string_split(text, ' ')) >= 2),
         |b2 AS (
         |  SELECT bg.a AS wa, bg.b AS wb FROM (
         |    SELECT unnest(list_transform(generate_series(1, len(t) - 1),
         |      i -> {'a': t[i], 'b': t[i + 1]})) AS bg
         |    FROM t)),
         |bc AS (SELECT wa, wb, COUNT(*) AS c_ab FROM b2 GROUP BY wa, wb),
         |ua AS (SELECT wa, COUNT(*) AS c_a FROM b2 GROUP BY wa),
         |ub AS (SELECT wb, COUNT(*) AS c_b FROM b2 GROUP BY wb),
         |n AS (SELECT COUNT(*) AS n FROM b2)
         |SELECT wa, wb, c_ab,
         |  (CAST(c_ab AS DOUBLE) / c_a) * (CAST(n AS DOUBLE) / c_b) AS lift
         |FROM bc JOIN ua USING (wa) JOIN ub USING (wb) CROSS JOIN n
         |WHERE c_ab >= $MinBigramCount
         |ORDER BY lift DESC, wa, wb LIMIT $CollocationTopK""".stripMargin)),

    Q("q112_text_bm25", bm25TopK, Some(bm25Sql)),

    Q("q117_text_rerank", (s, dir) => rerankTopK(s, dir), Some {
      val h = "md5('rr:' || CAST(query_id AS VARCHAR) || ':' || text)"
      val byte = s"(strpos('0123456789abcdef', substr($h, 1, 1)) - 1) * 16" +
        s" + (strpos('0123456789abcdef', substr($h, 2, 1)) - 1)"
      s"""WITH sl AS ($bm25Sql),
         |wt AS (
         |  SELECT sl.query_id, sl.rn AS retrieval_rn, sl.doc_id, d.text
         |  FROM sl JOIN documents d USING (doc_id)),
         |sc AS (
         |  SELECT query_id, retrieval_rn, doc_id,
         |    CAST($byte AS DOUBLE) / CAST(256 AS DOUBLE) AS rr_score
         |  FROM wt),
         |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY rr_score DESC, doc_id) AS BIGINT) AS rn FROM sc)
         |SELECT query_id, rn, doc_id, retrieval_rn, rr_score FROM r
         |WHERE rn <= $RerankKeep ORDER BY query_id, rn""".stripMargin
    }),

    Q("q118_text_passage_maxp", passageMaxP, Some {
      val vals = bm25Queries.flatMap { case (qid, ts) =>
        ts.map(t => s"(CAST($qid AS BIGINT), '$t')")
      }.mkString(", ")
      val n = s"1 + CAST(floor((greatest(length(text) - $ChunkSize, 0) + ${ChunkStride - 1}) / ${ChunkStride}.0) AS BIGINT)"
      s"""WITH ch AS (
         |  SELECT doc_id, chunk_id,
         |    substr(text, CAST(chunk_id * $ChunkStride + 1 AS INT), $ChunkSize) AS chunk_text
         |  FROM (SELECT doc_id, text,
         |    unnest(generate_series(0, ($n) - 1)) AS chunk_id FROM documents)),
         |tk AS (SELECT doc_id, chunk_id,
         |    unnest(string_split(chunk_text, ' ')) AS tok FROM ch),
         |tf AS (SELECT doc_id, chunk_id, tok, COUNT(*) AS tf FROM tk
         |  GROUP BY doc_id, chunk_id, tok),
         |dl AS (SELECT doc_id, chunk_id, COUNT(*) AS dl FROM tk
         |  GROUP BY doc_id, chunk_id),
         |dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
         |stats AS (SELECT COUNT(*) AS n_docs,
         |    CAST(CAST(SUM(dl) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
         |  FROM dl),
         |q(query_id, tok) AS (VALUES $vals),
         |scored AS (
         |  SELECT q.query_id, tf.doc_id, tf.chunk_id,
         |    ${bm25TermScore("tf.tf", "dfreq.df", "dl.dl", "stats.n_docs", "stats.avgdl")} AS p
         |  FROM q JOIN dfreq USING (tok) JOIN tf USING (tok)
         |  JOIN dl USING (doc_id, chunk_id), stats),
         |cs AS (SELECT query_id, doc_id, chunk_id,
         |    CAST(SUM(CAST(FLOOR(p * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS score
         |  FROM scored GROUP BY query_id, doc_id, chunk_id),
         |mx AS (SELECT query_id, doc_id, MAX({'score': score, 'nc': -chunk_id}) AS m
         |  FROM cs GROUP BY query_id, doc_id),
         |r AS (SELECT query_id, doc_id, m.score AS score, -(m.nc) AS best_chunk,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY m.score DESC, doc_id) AS BIGINT) AS rn FROM mx)
         |SELECT query_id, rn, doc_id, best_chunk, score FROM r
         |WHERE rn <= $MaxPTopN ORDER BY query_id, rn""".stripMargin
    }),

    Q("q114_curation_funnel", curationFunnel, Some {
      val sampByte =
        "(strpos('0123456789abcdef', substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16" +
          " + (strpos('0123456789abcdef', substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)"
      val splitByte =
        "(strpos('0123456789abcdef', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16" +
          " + (strpos('0123456789abcdef', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)"
      val thresholdSql = "CASE " + stratifiedThresholdCases + " ELSE 256 END"
      val (tr, va) = SplitThresholds
      s"""WITH t AS (
         |  SELECT doc_id, lang, text,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x IN $stopSql)) AS BIGINT) AS n_stop
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, lang, text,
         |    least(CAST(n_tok AS DOUBLE) / 50.0, 1.0) * 0.5
         |      + (1.0 - CAST(n_stop AS DOUBLE) / n_tok) * 0.5 AS quality
         |  FROM t),
         |canon AS (
         |  SELECT doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1 AS is_canon
         |  FROM q WHERE quality >= $CurationQualityMin),
         |s AS (
         |  SELECT q.doc_id, q.lang, q.quality, c.is_canon,
         |    CAST($sampByte AS BIGINT) AS bucket,
         |    CAST($splitByte AS BIGINT) AS sbucket
         |  FROM q LEFT JOIN canon c USING (doc_id))
         |SELECT doc_id, quality,
         |  CASE WHEN quality < $CurationQualityMin THEN 'low_quality'
         |       WHEN NOT is_canon THEN 'exact_dup'
         |       WHEN bucket >= ($thresholdSql) THEN 'sampled_out'
         |       ELSE 'kept' END AS stage,
         |  CASE WHEN quality >= $CurationQualityMin AND is_canon
         |            AND bucket < ($thresholdSql)
         |       THEN (CASE WHEN sbucket < $tr THEN 'train'
         |                  WHEN sbucket < $va THEN 'val' ELSE 'test' END)
         |       ELSE 'none' END AS split
         |FROM s ORDER BY doc_id""".stripMargin
    }),

    Q("q115_text_token_budget", tokenBudgetSelect, Some(
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x IN $stopSql)) AS BIGINT) AS n_stop
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, source, n_tok,
         |    least(CAST(n_tok AS DOUBLE) / 50.0, 1.0) * 0.5
         |      + (1.0 - CAST(n_stop AS DOUBLE) / n_tok) * 0.5 AS quality
         |  FROM t),
         |lv AS (SELECT doc_id, source, n_tok,
         |    CAST(FLOOR(quality * 256) AS BIGINT) AS level FROM q),
         |c AS (SELECT *, CAST(SUM(n_tok) OVER (PARTITION BY source
         |    ORDER BY level DESC, doc_id) AS BIGINT) AS cum_tokens FROM lv)
         |SELECT source, doc_id, n_tok, level, cum_tokens FROM c
         |WHERE cum_tokens <= $TokenBudget ORDER BY source, doc_id""".stripMargin)),

    Q("q116_text_bigram_lm", bigramLmScore, Some(
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |uni AS (SELECT tok, COUNT(*) AS tf FROM tk GROUP BY tok),
        |nt AS (SELECT COUNT(*) AS n_total FROM tk),
        |t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |      WHERE len(string_split(text, ' ')) >= 2),
        |big AS (SELECT doc_id, bg.a AS wa, bg.b AS wb FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
        |    i -> {'a': t[i], 'b': t[i + 1]})) AS bg FROM t)),
        |bc AS (SELECT wa, wb, COUNT(*) AS c_ab FROM big GROUP BY wa, wb),
        |ca AS (SELECT wa, COUNT(*) AS c_a FROM big GROUP BY wa),
        |p AS (SELECT big.doc_id,
        |    0.75 * (CAST(c_ab AS DOUBLE) / CAST(c_a AS DOUBLE))
        |      + 0.25 * (CAST(tf AS DOUBLE) / CAST(n_total AS DOUBLE)) AS p
        |  FROM big JOIN bc USING (wa, wb) JOIN ca USING (wa)
        |  JOIN uni ON uni.tok = big.wb, nt)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(CAST(FLOOR(p * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12 / COUNT(*) AS mean_p,
        |  MIN(p) AS min_p
        |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("q132_text_cms", cmsHeavyHitters, Some(cmsOracleSql)),

    Q("q157_text_group_sample", groupSample, Some(
      s"""SELECT lang, rank, doc_id, sk FROM (
         |  SELECT lang, doc_id, md5('grp:' || CAST(doc_id AS VARCHAR)) AS sk,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
         |      ORDER BY md5('grp:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rank
         |  FROM documents) t
         |WHERE rank <= $GroupSampleK ORDER BY lang, rank""".stripMargin)),

    Q("q156_text_vocab_setops", kmvSetOps, Some {
      val nibSum = (1 to 15).map { i =>
        val pow = java.math.BigInteger.valueOf(16L).pow(15 - i)
        s"CAST(strpos('0123456789abcdef', substr(kth_h, $i, 1)) - 1 AS BIGINT) * $pow"
      }.mkString(" + ")
      s"""WITH v AS (SELECT DISTINCT source, tok FROM (
         |    SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)),
         |hh AS (SELECT source, md5(tok) AS h FROM v),
         |r AS (SELECT source, h,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn FROM hh),
         |bot AS (SELECT source, h FROM r WHERE rn <= $KmvK),
         |srcs AS (SELECT DISTINCT source FROM v),
         |prs AS (SELECT a.source AS sa, b.source AS sb
         |  FROM srcs a, srcs b WHERE a.source < b.source),
         |tag AS (
         |  SELECT sa, sb, h, MAX(ina) AS ina, MAX(inb) AS inb FROM (
         |    SELECT p.sa, p.sb, b.h, 1 AS ina, 0 AS inb
         |    FROM prs p JOIN bot b ON b.source = p.sa
         |    UNION ALL
         |    SELECT p.sa, p.sb, b.h, 0, 1
         |    FROM prs p JOIN bot b ON b.source = p.sb) t
         |  GROUP BY sa, sb, h),
         |mg AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY sa, sb ORDER BY h) AS rn
         |  FROM tag),
         |est AS (SELECT sa, sb, CAST(COUNT(*) AS BIGINT) AS km,
         |    CAST(SUM(ina * inb) AS BIGINT) AS nboth, MAX(h) AS kth_h
         |  FROM mg WHERE rn <= $KmvK GROUP BY sa, sb),
         |ef AS (SELECT sa, sb, km, nboth,
         |    CAST($nibSum AS DOUBLE) / CAST(1152921504606846976 AS DOUBLE) AS kth_frac
         |  FROM est),
         |eu AS (SELECT sa, sb, km, nboth, kth_frac,
         |    CASE WHEN km < $KmvK THEN CAST(km AS DOUBLE)
         |         ELSE CAST(km - 1 AS DOUBLE) / kth_frac END AS union_est
         |  FROM ef),
         |ec AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY source),
         |ei AS (SELECT p.sa, p.sb, CAST(COUNT(*) AS BIGINT) AS exact_inter
         |  FROM prs p JOIN v a ON a.source = p.sa
         |  JOIN v b ON b.source = p.sb AND b.tok = a.tok
         |  GROUP BY p.sa, p.sb)
         |SELECT eu.sa AS source_a, eu.sb AS source_b, eu.km AS k,
         |  CAST(nboth AS DOUBLE) / km AS jaccard_est,
         |  union_est,
         |  (CAST(nboth AS DOUBLE) / km) * union_est AS inter_est,
         |  CAST(COALESCE(ei.exact_inter, 0) AS DOUBLE)
         |    / CAST(na.n + nb.n - COALESCE(ei.exact_inter, 0) AS DOUBLE) AS jaccard_exact,
         |  CAST(na.n + nb.n - COALESCE(ei.exact_inter, 0) AS BIGINT) AS union_exact,
         |  CAST(COALESCE(ei.exact_inter, 0) AS BIGINT) AS exact_inter
         |FROM eu JOIN ec na ON na.source = eu.sa JOIN ec nb ON nb.source = eu.sb
         |LEFT JOIN ei ON ei.sa = eu.sa AND ei.sb = eu.sb
         |ORDER BY source_a, source_b""".stripMargin
    }),

    Q("q121_text_vocab_sketch", vocabSketch, Some {
      val nibSum = (1 to 15).map { i =>
        val pow = java.math.BigInteger.valueOf(16L).pow(15 - i)
        s"CAST(strpos('0123456789abcdef', substr(kth_h, $i, 1)) - 1 AS BIGINT) * $pow"
      }.mkString(" + ")
      s"""WITH v AS (SELECT DISTINCT source, tok FROM (
         |    SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)),
         |hh AS (SELECT source, md5(tok) AS h FROM v),
         |r AS (SELECT source, h,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn FROM hh),
         |b AS (SELECT source, MAX({'rank': rn, 'h': h}) AS m,
         |    CAST(COUNT(*) AS BIGINT) AS k
         |  FROM r WHERE rn <= $KmvK GROUP BY source),
         |e AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_distinct FROM v GROUP BY source),
         |kt AS (SELECT source, k, m.h AS kth_h FROM b),
         |kf AS (SELECT source, k, kth_h,
         |    CAST($nibSum AS DOUBLE) / CAST(1152921504606846976 AS DOUBLE) AS kth_frac
         |  FROM kt)
         |SELECT e.source, e.n_distinct, kf.k, kf.kth_frac,
         |  CAST(kf.k - 1 AS DOUBLE) / kf.kth_frac AS estimate,
         |  (CAST(kf.k - 1 AS DOUBLE) / kf.kth_frac) / CAST(e.n_distinct AS DOUBLE) AS err_ratio
         |FROM e JOIN kf USING (source) ORDER BY source""".stripMargin
    }),

    Q("q122_text_quality_calibration", qualityCalibration, Some(
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x IN $stopSql)) AS BIGINT) AS n_stop
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, source,
         |    least(CAST(n_tok AS DOUBLE) / 50.0, 1.0) * 0.5
         |      + (1.0 - CAST(n_stop AS DOUBLE) / n_tok) * 0.5 AS quality
         |  FROM t),
         |lv AS (SELECT doc_id, source, quality,
         |    CAST(FLOOR(quality * 256) AS BIGINT) AS level FROM q),
         |r AS (SELECT *,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY level, doc_id) AS BIGINT) AS rank,
         |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_source
         |  FROM lv)
         |SELECT source, doc_id, quality, level, rank,
         |  CAST(rank AS DOUBLE) / CAST(n_source AS DOUBLE) AS pct
         |FROM r ORDER BY source, doc_id""".stripMargin)),

    Q("q96_text_vocab_drift", vocabDrift, Some(
      """WITH toks AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tfc AS (SELECT tok, COUNT(*) AS tfc FROM toks GROUP BY tok),
        |ntc AS (SELECT COUNT(*) AS ntc FROM toks),
        |tfs AS (SELECT source, tok, COUNT(*) AS tfs FROM toks GROUP BY source, tok),
        |nts AS (SELECT source, COUNT(*) AS nts FROM toks GROUP BY source),
        |grid AS (SELECT n.source, c.tok, n.nts, c.tfc FROM tfc c CROSS JOIN nts n),
        |ad AS (
        |  SELECT g.source, g.nts,
        |    ABS(COALESCE(CAST(s.tfs AS DOUBLE), 0.0) / CAST(g.nts AS DOUBLE)
        |      - CAST(g.tfc AS DOUBLE) / CAST(ntc.ntc AS DOUBLE)) AS ad
        |  FROM grid g LEFT JOIN tfs s ON g.source = s.source AND g.tok = s.tok
        |  CROSS JOIN ntc)
        |SELECT source, MAX(nts) AS n_tok,
        |  CAST(SUM(CAST(FLOOR(ad * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12 / 2.0 AS tv
        |FROM ad GROUP BY source ORDER BY source""".stripMargin)),

    Q("q95_text_dsir_select", dsirSelect, Some(
      s"""WITH toks AS (
         |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok FROM documents),
         |tft AS (SELECT tok, COUNT(*) AS tft FROM toks WHERE source = 'src0' GROUP BY tok),
         |ntt AS (SELECT COUNT(*) AS ntt FROM toks WHERE source = 'src0'),
         |tfa AS (SELECT tok, COUNT(*) AS tfa FROM toks GROUP BY tok),
         |nta AS (SELECT COUNT(*) AS nta FROM toks),
         |probs AS (SELECT tok,
         |    COALESCE(CAST(tft AS DOUBLE), 0.0) / CAST(ntt.ntt AS DOUBLE) AS pt,
         |    CAST(tfa AS DOUBLE) / CAST(nta.nta AS DOUBLE) AS pa
         |  FROM tfa LEFT JOIN tft USING (tok) CROSS JOIN ntt CROSS JOIN nta),
         |scored AS (
         |  SELECT t.doc_id, COUNT(*) AS n_tok,
         |    CAST(SUM(CAST(FLOOR(p.pt * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS sum_pt,
         |    CAST(SUM(CAST(FLOOR(p.pa * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS sum_pa
         |  FROM toks t JOIN probs p USING (tok)
         |  WHERE t.source <> 'src0'
         |  GROUP BY t.doc_id),
         |top AS (
         |  SELECT doc_id, n_tok, sum_pt / sum_pa AS ratio FROM scored
         |  ORDER BY ratio DESC, doc_id LIMIT $DsirKeep)
         |SELECT doc_id, n_tok, ratio FROM top ORDER BY doc_id""".stripMargin)),

    Q("q92_dedup_snapshot", snapshotDedup, Some {
      def byteOf(h: String) =
        s"(strpos('0123456789abcdef', substr($h, 1, 1)) - 1) * 16" +
          s" + (strpos('0123456789abcdef', substr($h, 2, 1)) - 1)"
      s"""WITH pos AS (
         |  SELECT doc_id, text, length(text) AS len,
         |    unnest(generate_series(1, greatest(length(text) - ${CdcWindow - 1}, 1))) AS i
         |  FROM documents),
         |b AS (
         |  SELECT doc_id, text, len, i FROM pos
         |  WHERE i = 1 OR ${byteOf(s"md5(substr(text, CAST(i AS INT), $CdcWindow))")} < $CdcBoundaryMax),
         |c AS (
         |  SELECT doc_id, text, len, i,
         |    LEAD(i) OVER (PARTITION BY doc_id ORDER BY i) AS nxt
         |  FROM b),
         |ch AS (
         |  SELECT doc_id,
         |    md5(substr(text, CAST(i AS INT), CAST(coalesce(nxt - 1, len) - i + 1 AS INT))) AS chunk_md5
         |  FROM c),
         |snap AS (SELECT DISTINCT chunk_md5 FROM ch WHERE doc_id % 2 = 0),
         |inc AS (SELECT doc_id, chunk_md5 FROM ch WHERE doc_id % 2 = 1),
         |j AS (
         |  SELECT i.doc_id,
         |    CASE WHEN s.chunk_md5 IS NOT NULL THEN 1 ELSE 0 END AS dup
         |  FROM inc i LEFT JOIN snap s USING (chunk_md5))
         |SELECT doc_id, COUNT(*) AS n_chunks,
         |  CAST(SUM(dup) AS BIGINT) AS n_dup_chunks,
         |  CAST(SUM(dup) AS DOUBLE) / COUNT(*) AS dup_frac
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin
    }),

    Q("q86_corpus_report", corpusReport, Some(
      s"""WITH t AS (
         |  SELECT doc_id, source, lang, text,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x IN $stopSql)) AS BIGINT) AS n_stop
         |  FROM documents),
         |q AS (SELECT *,
         |    least(CAST(n_tok AS DOUBLE) / 50.0, 1.0) * 0.5
         |      + (1.0 - CAST(n_stop AS DOUBLE) / n_tok) * 0.5 AS quality
         |  FROM t),
         |per AS (
         |  SELECT source, COUNT(*) AS n_docs,
         |    COUNT(DISTINCT md5(text)) AS n_unique_texts,
         |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         |    CAST(SUM(CAST(length(text) AS BIGINT)) AS BIGINT) AS n_chars,
         |    CAST(SUM(CAST(FLOOR(quality * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS qsum
         |  FROM q GROUP BY source),
         |lc AS (SELECT source, lang, COUNT(*) AS c FROM q GROUP BY source, lang),
         |ls AS (SELECT source,
         |    CAST(SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) AS DOUBLE) AS sumsq
         |  FROM lc GROUP BY source)
         |SELECT p.source, p.n_docs, p.n_unique_texts,
         |  1.0 - CAST(p.n_unique_texts AS DOUBLE) / p.n_docs AS dup_rate,
         |  p.n_tokens,
         |  CAST(p.n_tokens AS DOUBLE) / p.n_docs AS avg_tokens,
         |  CAST(p.n_chars AS DOUBLE) / p.n_docs AS avg_chars,
         |  p.qsum / p.n_docs AS avg_quality,
         |  1.0 - l.sumsq / (CAST(p.n_docs AS DOUBLE) * p.n_docs) AS lang_gini
         |FROM per p JOIN ls l USING (source)
         |ORDER BY p.source""".stripMargin))
  )

  private def stratifiedThresholdCases: String =
    stratifiedThresholds.map { case (l, t) => s"WHEN lang = '$l' THEN $t" }.mkString(" ")

  private def stratifiedThresholds = TextOpsImpl.SampleThresholds

  /** DuckDB mirror of [[TextOpsImpl.bm25TopK]] — q112's oracle, reused as
    * the shortlist stage inside q117's. */
  private lazy val bm25Sql: String = {
    val vals = bm25Queries.flatMap { case (qid, ts) =>
      ts.map(t => s"(CAST($qid AS BIGINT), '$t')")
    }.mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
       |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
       |dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
       |stats AS (
       |  SELECT nd.n_docs, CAST(nt.n_toks AS DOUBLE) / CAST(nd.n_docs AS DOUBLE) AS avgdl
       |  FROM (SELECT COUNT(*) AS n_docs FROM documents) nd,
       |       (SELECT COUNT(*) AS n_toks FROM toks) nt),
       |q(query_id, tok) AS (VALUES $vals),
       |scored AS (
       |  SELECT q.query_id, tf.doc_id,
       |    ${bm25TermScore("tf.tf", "dfreq.df", "dl.dl", "stats.n_docs", "stats.avgdl")} AS p
       |  FROM q JOIN dfreq USING (tok) JOIN tf USING (tok) JOIN dl USING (doc_id), stats),
       |agg AS (SELECT query_id, doc_id,
       |    CAST(SUM(CAST(FLOOR(p * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS score
       |  FROM scored GROUP BY query_id, doc_id),
       |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, doc_id) AS BIGINT) AS rn FROM agg)
       |SELECT query_id, rn, doc_id, score FROM r WHERE rn <= $Bm25TopN
       |ORDER BY query_id, rn""".stripMargin
  }
}
