package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB shape:
  *
  *  - exact: one hash-shuffle on md5(text) — the canonical-doc group-by.
  *  - n-gram Jaccard: candidate generation via equi-join on *rare* shingles
  *    (document frequency ≤ DF_CAP). Joining on all shingles of a dense
  *    vocabulary is quadratic; DF-capping is the standard prefix-filtering
  *    move and bounds the join to Σ min(df, cap)² per shingle.
  *  - MinHash+LSH: 8 minhash signatures → 4 bands of 2 → bucket join with a
  *    bucket-size cap. Shuffle cost is O(docs × bands), never all-pairs.
  *  - SimHash: 16-bit signature from per-token hashes; near-dup buckets come
  *    from signature equality / small hamming radius.
  *
  * Portable hashing: md5 hex strings are byte-identical across Spark and
  * DuckDB, and lexicographic MIN over fixed-width lowercase hex equals
  * numeric min — so MinHash needs no integer conversion anywhere.
  */
object DedupOpsImpl {

  val DfCap = 20
  val BucketCap = 50

  /** doc_id + deduplicated 3-token shingles (word 3-grams). Memoized CACHED
    * view per (session, dir) — the Jaccard, MinHash-LSH, pipeline and
    * contamination queries all start here, so one materialization serves
    * them all within a Verify/Bench session (~a few MB per 10⁵ docs; at
    * real scale this is the stage you'd persist to storage once per corpus
    * snapshot instead). Invalidation: [[clearCaches]], like every other
    * index memo in the repo. */
  def shingles(s: SparkSession, dir: String): DataFrame =
    graft.ops.Memo.getOrCache(shinglesCache, s, dir, _ =>
      Tables(s, dir, "documents")
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          explode(expr(
            """array_distinct(filter(transform(sequence(1, size(toks)),
              |  i -> concat(try_element_at(toks, i), ' ', try_element_at(toks, i + 1),
              |              ' ', try_element_at(toks, i + 2))),
              |  x -> x IS NOT NULL))""".stripMargin)).as("sh"))
        .cache())

  private val shinglesCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Exact dedup: canonical doc per identical text (min doc_id wins). */
  def exact(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("canonical_doc"), count(lit(1)).as("n_copies"))
      .orderBy(col("canonical_doc"))

  /** Near-dup pairs by n-gram Jaccard ≥ 0.5 over the rare-shingle space.
    *
    * Memoized CACHED pair set per (session, dir): the verified pair graph is
    * tiny (near-dup docs only) but its generator is the DF-capped self-join,
    * and SIX consumers start here (q41, q45, q46/q67 components, q100 recall
    * panel ×2, q110 leakage) — without the memo each re-ran the join
    * (r4 bench: q110 9.0 s, q100 5.1 s, mostly this plan). */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame =
    graft.ops.Memo.getOrCache(ngramPairsCache, s, dir, _ =>
      // localCheckpoint, not .cache(): the pair set is tiny but its plan is
      // the DF-capped self-join over the shingle view — consumers composing
      // several memoized views (q100's four-generator panel) would re-pay
      // analysis of each embedded join tree on every call
      ngramJaccardPlan(s, dir).localCheckpoint())

  private val ngramPairsCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def ngramJaccardPlan(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
    val rare = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= DfCap).select("sh")
    val docsh = sh.join(rare, "sh")
    val sizes = docsh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val pairs = docsh.as("a").join(docsh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n", "na"), "a_id")
      .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n", "nb"), "b_id")
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .withColumn("jaccard", col("inter").cast(DoubleType) / col("uni"))
      .filter(col("jaccard") >= 0.5)
      .select(col("a_id"), col("b_id"), col("inter"), col("uni"), col("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  val ContainmentMin = 0.8

  /** Containment (asymmetric Jaccard) near-dup pairs:
    * inter / min(|A|, |B|) ≥ [[ContainmentMin]] over the rare-shingle
    * space — catches SUBSET duplicates (one doc quoted or embedded inside a
    * larger one) that symmetric Jaccard dilutes below threshold whenever
    * the sizes differ a lot. Candidate generation is the identical
    * DF-capped equi-join as [[ngramJaccard]], so the cost bound is
    * unchanged; `contained_id` names the smaller (covered) document, size
    * ties break to a_id. */
  def containmentPairs(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
    val rare = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= DfCap).select("sh")
    containmentFromShingles(sh.join(rare, "sh"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** The containment pair math over any (doc_id, sh) frame (already
    * DF-capped by the caller) — factored out so specs can drive it with
    * constructed subset-duplicates, which the gate corpus lacks. */
  private[graft] def containmentFromShingles(docsh: DataFrame): DataFrame = {
    val sizes = docsh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    docsh.as("a").join(docsh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.toDF("a_id", "na"), "a_id")
      .join(sizes.toDF("b_id", "nb"), "b_id")
      .withColumn("containment",
        col("inter").cast(DoubleType) / least(col("na"), col("nb")))
      .filter(col("containment") >= ContainmentMin)
      .withColumn("contained_id",
        when(col("na") <= col("nb"), col("a_id")).otherwise(col("b_id")))
      .select(col("a_id"), col("b_id"), col("inter"), col("na"), col("nb"),
        col("containment"), col("contained_id"))
  }

  /** Per-doc MinHash signature — 2 md5 calls per shingle instead of 8
    * (hashing dominated round-1 bench: q42+q45 were 40% of total): the 8
    * lanes are disjoint 8-hex-char (32-bit) windows of md5(sh) and
    * md5('1:' || sh). A 32-bit lane keeps E[min] ≈ 2³²/shingles well away
    * from saturation for billion-shingle documents (16-bit windows would
    * pin every large doc's min to 0). Window derivation is oracle-portable
    * (DuckDB takes the same substrings of the same digests) and
    * lexicographic MIN over fixed-width lowercase hex equals numeric min,
    * so each lane is still an independent uniform min-hash. */
  def minhashSignatures(s: SparkSession, dir: String): DataFrame = {
    val withDigests = shingles(s, dir)
      .withColumn("d1", md5(col("sh")))
      .withColumn("d2", md5(concat(lit("1:"), col("sh"))))
    val lanes = (0 until 8).map { i =>
      min(substring(col(if (i < 4) "d1" else "d2"), 1 + 8 * (i % 4), 8)).as(s"h$i")
    }
    withDigests.groupBy(col("doc_id")).agg(lanes.head, lanes.tail: _*)
  }

  /** LSH candidate pairs: 4 bands × 2 rows; same band hash → candidate.
    * Buckets larger than BucketCap are dropped (standard LSH cap — they are
    * stop-shingle artifacts and would produce quadratic pair blowup).
    * Memoized cached pair set, same rationale as [[ngramJaccard]]
    * (consumers: q42, q45 verify, q100 panel ×2, q123 S-curve). */
  def minhashLsh(s: SparkSession, dir: String): DataFrame =
    graft.ops.Memo.getOrCache(lshPairsCache, s, dir, _ =>
      minhashLshPlan(s, dir).localCheckpoint())

  private val lshPairsCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def minhashLshPlan(s: SparkSession, dir: String): DataFrame = {
    val sig = minhashSignatures(s, dir)
      .withColumn("bands", array(
        (0 until 4).map(b => struct(lit(b).as("band"),
          md5(concat(col(s"h${2 * b}"), col(s"h${2 * b + 1}"))).as("bh"))): _*))
      .select(col("doc_id"), explode(col("bands")).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
    val okBuckets = sig.groupBy(col("band"), col("bh")).agg(count(lit(1)).as("n"))
      .filter(col("n") <= BucketCap).select("band", "bh")
    val bucketed = sig.join(okBuckets, Seq("band", "bh"))
    bucketed.as("a").join(bucketed.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
      .orderBy(col("a_id"), col("b_id"))
  }

  /** q201: the FULL LSH candidate generator driven by the native
    * signature — q200's one-pass minhash8 feeds the same 4-band × capped-
    * bucket pair join as q42, and the pair set must equal q42's exactly
    * (same oracle). This is the hot-path composition a 100 TB dedup run
    * ships: the only corpus-sized shuffle left is the band-bucket join;
    * the signature stage is a codegen'd projection. */
  def minhashLshNative(s: SparkSession, dir: String): DataFrame = {
    val sig = minhash8Native(s, dir)
    val bands = sig.withColumn("bands", array(
        (0 until 4).map(b => struct(lit(b).as("band"),
          md5(concat(col(s"h${2 * b}"), col(s"h${2 * b + 1}"))).as("bh"))): _*))
      .select(col("doc_id"), explode(col("bands")).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
    val okBuckets = bands.groupBy(col("band"), col("bh")).agg(count(lit(1)).as("n"))
      .filter(col("n") <= BucketCap).select("band", "bh")
    val bucketed = bands.join(okBuckets, Seq("band", "bh"))
    bucketed.as("a").join(bucketed.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
      .orderBy(col("a_id"), col("b_id"))
  }

  /** 16-bit SimHash over distinct tokens; bit j comes from nibble j/4 of the
    * token's md5 (nibble decoded portably via strpos on the hex alphabet).
    * Memoized cached (doc_id, simhash) view — q43 and the q100 panel's
    * simhash-bucket generator share one 16-lane aggregation. */
  def simhash(s: SparkSession, dir: String): DataFrame =
    graft.ops.Memo.getOrCache(simhashCache, s, dir, _ =>
      simhashPlan(s, dir).localCheckpoint())

  private val simhashCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def simhashPlan(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tk"))
      .withColumn("h", md5(col("tk")))
    val bitSums = (0 until 16).map { j =>
      val pos = j / 4 + 1
      val shift = 1 << (3 - j % 4)
      sum(expr(
        s"CASE WHEN pmod((instr('0123456789abcdef', substr(h, $pos, 1)) - 1) div $shift, 2) = 1 " +
          s"THEN 1 ELSE -1 END")).as(s"s$j")
    }
    tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 16).map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
      .orderBy(col("doc_id"))
  }

  /** End-to-end corpus dedup — the composition a real pipeline runs:
    * 1. exact dedup (min doc_id per identical text);
    * 2. LSH candidate pairs (q42 semantics) verified by rare-shingle
    *    Jaccard ≥ 0.5 (q41 semantics);
    * 3. drop the higher doc_id of every verified pair.
    * Output: the kept document ids. All stages shuffle on hash/bucket keys —
    * never all-pairs — so the composition scales like its parts. */
  def dedupPipeline(s: SparkSession, dir: String): DataFrame = {
    val keepExact = exact(s, dir).select(col("canonical_doc").as("doc_id"))
    val verified = ngramJaccard(s, dir).select(col("a_id"), col("b_id"))
      .join(minhashLsh(s, dir), Seq("a_id", "b_id"))
    val dropped = verified.select(col("b_id").as("doc_id")).distinct()
    keepExact.join(dropped, Seq("doc_id"), "left_anti")
      .orderBy(col("doc_id"))
  }

  /** Connected components over the verified near-dup pairs — turning
    * pairwise duplicates into duplicate CLUSTERS (the form a real dedup
    * actually keeps: one canonical doc per component, not per pair).
    *
    * Iterative min-label propagation: each round every node adopts the
    * minimum label among itself and its neighbors; converged when no label
    * changes. The driver loop runs on the PAIR graph only (near-dup docs,
    * a vanishing fraction of the corpus — the 100 TB corpus itself never
    * enters the loop), each round is one equi-join + aggregation, and
    * `localCheckpoint` truncates lineage so plan size stays constant across
    * rounds (at cluster scale: checkpoint to storage). Rounds needed =
    * component diameter, which for near-dup clusters is tiny.
    * Deterministic: min() propagation has a unique fixpoint. */
  /** Memoized CACHED shingle-pair component map per (session, dir): q46 and
    * q67 share one label-propagation run instead of re-iterating the same
    * pair graph. Same immutable-dir assumption and invalidation hook
    * ([[clearCaches]]) as the vector-side index memos. */
  private val componentsCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Unpersist and drop the memoized shingle views and component maps. */
  def clearCaches(): Unit = {
    graft.ops.Memo.clear(shinglesCache)
    graft.ops.Memo.clear(componentsCache)
    graft.ops.Memo.clear(ngramPairsCache)
    graft.ops.Memo.clear(lshPairsCache)
    graft.ops.Memo.clear(simhashCache)
    graft.ops.Memo.clear(truthPairsCache)
    graft.ops.Memo.clearAny(docCountCache)(_ => Seq.empty)
  }

  private def shingleComponents(s: SparkSession, dir: String): DataFrame =
    graft.ops.Memo.getOrCache(componentsCache, s, dir, _ =>
      connectedComponents(ngramJaccard(s, dir).select(col("a_id"), col("b_id"))).cache())

  def dedupComponents(s: SparkSession, dir: String): DataFrame =
    shingleComponents(s, dir)
      .select(col("id").as("doc_id"), col("comp").as("component"))
      .orderBy(col("doc_id"))

  /** Cluster-size histogram over the near-dup components — the shape report
    * a dedup run is judged by (what fraction of the corpus sits in dup
    * clusters, and whether one giant cluster dominates, which usually means
    * boilerplate leaked past the caps). Singletons (docs in no pair) are
    * reported as the cluster_size = 1 row so the histogram partitions the
    * whole corpus.
    *
    * Scale shape: two aggregations over the component map (pair-graph
    * sized, already memoized) plus two single-row count frames — the corpus
    * itself contributes one count. */
  def dedupClusterSizes(s: SparkSession, dir: String): DataFrame = {
    val comp = shingleComponents(s, dir)
    val hist = comp.groupBy(col("comp")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))
    val singles = Tables(s, dir, "documents").agg(count(lit(1)).as("n_total"))
      .crossJoin(broadcast(comp.agg(count(lit(1)).as("n_in"))))
      .select(lit(1L).as("cluster_size"),
        (col("n_total") - col("n_in")).as("n_clusters"),
        (col("n_total") - col("n_in")).as("n_docs"))
    hist.union(singles).orderBy(col("cluster_size"))
  }

  /** The step that FINISHES a dedup pipeline: inside every near-dup
    * cluster, keep the highest-QUALITY member (not the arbitrary min-id) —
    * quality-aware canonicalization is what production curation does, since
    * near-dup clusters usually mix a clean original with truncated or
    * boilerplated copies. Tie on quality → smaller doc_id.
    *
    * Scale shape: the component map is pair-graph-sized (broadcast); the
    * quality score is the same narrow scan as q31; the per-component
    * window partitions on component id (bounded by cluster size, itself
    * capped by the LSH bucket caps upstream). The 100 TB corpus is scanned
    * once and never shuffled — only component members reach the window. */
  def dedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    val comps = shingleComponents(s, dir)
      .select(col("id").as("doc_id"), col("comp").as("component"))
    val quality = TextOpsImpl.qualityScore(s, dir).select(col("doc_id"), col("quality"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component")).orderBy(col("quality").desc, col("doc_id"))
    broadcast(comps).join(quality, "doc_id")
      .withColumn("rn", row_number().over(w))
      .select(col("doc_id"), col("component"), col("quality"),
        (col("rn") === 1).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Generic min-label propagation over an (a, b) pair DataFrame (first two
    * columns are the edge endpoints). Returns (id, comp) for every node.
    * Shared by the shingle-based (q46) and embedding-based (q58) duplicate
    * clustering — the pair graph is tiny relative to the corpus, so the
    * driver loop is over metadata-scale data only. */
  /** Cross-split near-dup LEAKAGE audit: verified near-dup pairs (the
    * DF-capped rare-shingle Jaccard pairs of q41) whose endpoints were
    * assigned to DIFFERENT q107 splits — each such pair is an eval
    * document whose near-copy the model trains on: the contamination mode
    * that survives exact-hash-per-document splitting and silently
    * inflates eval scores. Because the split is a pure function of the id
    * (q107's design point), the audit recomputes membership inline — no
    * assignment-table join.
    *
    * Scale shape: the pair graph is the bounded q41 artifact; the split
    * columns are narrow expressions over its two id columns. Cost beyond
    * the shared pair generation is nil. */
  def splitLeakage(s: SparkSession, dir: String): DataFrame =
    ngramJaccard(s, dir)
      .withColumn("split_a", TextOpsImpl.splitNameCol(TextOpsImpl.splitBucketExpr("a_id")))
      .withColumn("split_b", TextOpsImpl.splitNameCol(TextOpsImpl.splitBucketExpr("b_id")))
      .filter(col("split_a") =!= col("split_b"))
      .select(col("a_id"), col("b_id"), col("split_a"), col("split_b"), col("jaccard"))
      .orderBy(col("a_id"), col("b_id"))

  def connectedComponents(pairs: DataFrame): DataFrame = {
    val p = pairs.toDF("a", "b")
    val edges = p.union(p.select(col("b"), col("a")))
      .toDF("src", "dst").localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id")).localCheckpoint()
    var changed = 1L
    var round = 0
    while (changed > 0) {
      round += 1
      // runs to convergence, no round cap: every round strictly decreases at
      // least one label (bounded below by the component minimum), so
      // termination is guaranteed — a silent cap would instead return WRONG
      // components for long chains.
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("comp").as("ncomp")), "dst")
        .groupBy(col("src").as("id")).agg(min(col("ncomp")).as("nmin"))
      val updated = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("comp").as("old"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"))
        .localCheckpoint()
      // pointer jump (round 16, measured this time): comp(u) <- comp(comp(u))
      // over the MATERIALIZED round, collapsing label chains so convergence
      // takes O(log diameter)-ish rounds instead of O(diameter) — q109's
      // pair graph needed 27 neighbor-min-only rounds (14 with the jump).
      // The round-15 attempt hung the bench because it self-joined an
      // UNCHECKPOINTED `updated` (the join subtree was duplicated and
      // re-planned on a lineage that doubled per round, ~4-5x cost growth
      // each iteration at sf0.1); here both sides of the self-join read the
      // SAME LogicalRDD leaf of this round's checkpoint, so every round's
      // plan is the same constant shape. The jump only starts at round 3:
      // most callers' graphs (near-dup clusters) converge in 2-4 rounds,
      // where an extra labels-self-join per round costs more than the
      // rounds it saves (measured: index:dedup_components 0.76 -> 1.42 s
      // with jump-from-round-1; only deep graphs like q109's amortize it).
      // Soundness: labels only decrease and comp(v) <= v always holds, so
      // the jump stays within the component and above its minimum — same
      // monotone fixpoint, reached in fewer rounds. `changed` compares the
      // round's FINAL labels against its start: 0 means the neighbor-min
      // step itself moved nothing (a jump can only move labels the min step
      // or an earlier jump already lowered), i.e. the true CC fixpoint.
      val next =
        if (round < 3) updated
        else {
          val jumped = updated
            .join(updated.select(col("id").as("jid"), col("comp").as("jcomp")),
              col("comp") === col("jid"), "left")
            .select(col("id"), col("old"),
              coalesce(col("jcomp"), col("comp")).as("comp"))
            .localCheckpoint()
          graft.ops.Memo.unpersistAll(updated) // jumped is materialized; free the half-round
          jumped
        }
      changed = next.filter(col("comp") =!= col("old")).count()
      // roll: free the previous round's checkpoint blocks now that the new
      // round is materialized — the loop holds one round of storage, ever
      labels = graft.ops.Memo.roll(labels, next).select(col("id"), col("comp"))
    }
    graft.ops.Memo.unpersistAll(edges)
    labels
  }

  /** Shard count for [[dedupShards]] (q133). */
  val NumShards = 8

  /** Dedup-AWARE shard assignment (q133): partition the corpus into
    * [[NumShards]] shards such that every near-dup cluster lands WHOLLY in
    * one shard — the layout that lets dedup (and keep-best
    * canonicalization) run shard-LOCAL at 100 TB with no cross-shard pair
    * work or reconciliation pass. Shard = md5 nibble of the cluster's
    * component id (singletons hash their own doc_id), so placement is a
    * pure function of the component map: cluster-atomic by construction,
    * md5-uniform in expectation. Output is the per-shard balance report
    * (docs, clustered docs, clusters) a layout owner reads; the
    * cluster-atomicity invariant itself is pinned by spec (every component
    * maps to exactly one shard, by construction of the hash).
    *
    * Scale shape: the component map is pair-graph-sized (broadcast); the
    * corpus is scanned once with a narrow hash projection and one
    * [[NumShards]]-row aggregation — repartitioning the actual bytes by
    * the same key is the writer's `repartition(shard)` away. */
  def dedupShards(s: SparkSession, dir: String): DataFrame = {
    val comp = shingleComponents(s, dir).select(col("id").as("doc_id"), col("comp"))
    val docs = Tables(s, dir, "documents").select(col("doc_id"))
    docs.join(broadcast(comp), Seq("doc_id"), "left")
      .withColumn("shard", expr(
        s"(instr('0123456789abcdef', substr(md5(concat('shard:', " +
          s"CAST(coalesce(comp, doc_id) AS STRING))), 1, 1)) - 1) % $NumShards")
        .cast(LongType))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("comp").isNotNull, 1L).otherwise(0L)).as("n_clustered"),
        countDistinct(col("comp")).as("n_clusters"))
      .orderBy(col("shard"))
  }

  /** Train/benchmark contamination check: which training documents share
    * content (3-token shingles) with a held-out set (doc_id % 50 == 0 here;
    * in production, the eval benchmarks). The held-out distinct-shingle set
    * is an equi-join key — at 100 TB the holdout side is benchmark-sized
    * and broadcastable, so the corpus is scanned once with a map-side hash
    * probe and never shuffles. Output: per contaminated doc, its shingle
    * count, contaminated-shingle count and rate. */
  def contamination(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
    val holdout = sh.filter(pmod(col("doc_id"), lit(50L)) === 0L)
      .select(col("sh")).distinct()
    sh.filter(pmod(col("doc_id"), lit(50L)) =!= 0L)
      .join(broadcast(holdout.withColumn("hit", lit(1L))), Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"), sum(coalesce(col("hit"), lit(0L))).as("n_cont"))
      .filter(col("n_cont") > 0)
      .withColumn("rate", col("n_cont").cast(DoubleType) / col("n_sh"))
      .orderBy(col("doc_id"))
  }

  /** Bloom estimate/size for [[bloomDecontaminate]] — sized generously for
    * the gate's holdout; production sizes from holdout stats (numBits ≈
    * 1.44 · n · log2(1/fpp)). 1 MiB of bits regardless of holdout size. */
  val BloomEstItems = 1000000L
  val BloomNumBits = 8388608L

  /** DECONTAMINATION at membership-sketch scale — the clean-corpus
    * complement of [[contamination]], restructured for the regime where the
    * holdout's distinct-shingle set is too big to broadcast raw (billions
    * of shingles × ~30 bytes): aggregate the holdout into a Bloom filter
    * (Spark's own `bloom_filter_agg` — two-phase distributive, ships one
    * `numBits/8`-byte sketch ≈ 1 MiB here), probe every corpus shingle with
    * the codegen'd `might_contain` scalar-subquery predicate (no join, no
    * shuffle — the sketch rides the closure like a broadcast var), and only
    * the bloom-surviving shingles enter the exact verification join that
    * removes false positives. No false negatives means the output is
    * EXACTLY the no-bloom result — the oracle computes it with a plain
    * anti-join — while the expensive stage touches `fpp × corpus` shingles
    * instead of all of them. Output: (doc_id, n_sh) of documents with zero
    * holdout overlap, i.e. the corpus that is safe to train on. */
  def bloomDecontaminate(s: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.install(s)
    shingles(s, dir).createOrReplaceTempView("graft_q94_shingles")
    s.sql(
      s"""WITH hold AS (
         |  SELECT DISTINCT sh FROM graft_q94_shingles WHERE doc_id % 50 = 0),
         |bloom AS (
         |  SELECT bloom_filter_agg(xxhash64(sh),
         |    CAST($BloomEstItems AS BIGINT), CAST($BloomNumBits AS BIGINT)) AS bf
         |  FROM hold),
         |corpus AS (
         |  SELECT doc_id, sh FROM graft_q94_shingles WHERE doc_id % 50 <> 0),
         |screened AS (
         |  SELECT doc_id, sh FROM corpus
         |  WHERE might_contain((SELECT bf FROM bloom), xxhash64(sh))),
         |contaminated AS (
         |  SELECT /*+ BROADCAST(hold) */ DISTINCT s.doc_id
         |  FROM screened s JOIN hold USING (sh))
         |SELECT /*+ BROADCAST(contaminated) */ c.doc_id, COUNT(*) AS n_sh
         |FROM corpus c LEFT ANTI JOIN contaminated t ON c.doc_id = t.doc_id
         |GROUP BY c.doc_id
         |ORDER BY c.doc_id""".stripMargin)
  }

  /** Target SIZE of the deterministic doc sample the recall panel's exact
    * ground truth runs on. A constant FRACTION does not survive scale on a
    * near-dup-heavy corpus: 10× docs multiplies both the sampled doc count
    * and each shingle's in-sample df, so the uncapped truth self-join grows
    * ~100× (measured in the sf1 sweep: the truth build went 2.2 s → 81.6 s
    * under the old 75 %-of-docs rule). A constant target keeps truth cost
    * flat at any corpus size — a recall estimate's error is a function of
    * absolute sample size anyway. 3750 = 75 % of the 5 000-doc sf0.1
    * corpus, making the sf0.1 threshold exactly the historical byte rule
    * (h16 < 49152), so recorded results there are unchanged. */
  val RecallSampleTarget = 3750L

  /** Keep iff h16(doc_id) × n_docs < target × 2¹⁶, where h16 is the first
    * 16 bits of md5('rcl:'||doc_id): a pure function of the id plus ONE
    * corpus-count scalar, so both join sides apply it as a narrow filter,
    * never a join. The comparison is an exact integer cross-multiply
    * (no division), so both engines agree bitwise at any n. */
  private def inRecallSample(idCol: String, nDocs: Long): org.apache.spark.sql.Column = {
    def nib(i: Int) =
      s"(instr('0123456789abcdef', substr(md5(concat('rcl:', CAST($idCol AS STRING))), $i, 1)) - 1)"
    val h16 = s"(${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)})"
    expr(s"CAST($h16 AS BIGINT) * CAST($nDocs AS BIGINT) < ${RecallSampleTarget * 65536L}L")
  }

  /** Corpus doc count feeding [[inRecallSample]] — one count() per
    * (session, dir), memoized with the standard purge hygiene. */
  private val docCountCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), java.lang.Long]()
  private[graft] def docCount(s: SparkSession, dir: String): Long =
    graft.ops.Memo.getOrCacheAny[java.lang.Long](docCountCache, s, dir,
      d => java.lang.Long.valueOf(graft.Tables(s, d, "documents").count()))

  /** Recall/precision panel for the near-dup candidate generators — the
    * dedup-side sibling of the q77 ANN recall panel: every generator here
    * (DF-capped Jaccard, banded MinHash-LSH, SimHash equality, the verified
    * pipeline pair set) reproduces its own DEFINITION bitwise, which says
    * nothing about what the caps and bands LOSE against true Jaccard ≥ 0.5.
    * This measures exactly that, per method.
    *
    * Ground truth is the uncapped inverted-index Jaccard — the computation
    * the caps exist to avoid — so it runs on a deterministic hash SAMPLE of
    * the corpus ([[inRecallSample]]): truth cost is bounded by the sample's
    * Σ df², the sampled truth set stays broadcast-sized, and the measured
    * generators are the already-audited production plans with one extra
    * narrow id filter. That is the honest 100 TB shape for a recall audit:
    * exact-on-a-sample, never exact-on-the-corpus.
    *
    * One row per method: (method, truth_pairs, found_pairs, true_found,
    * recall, precision); both ratios are single double divisions of exact
    * counts (cross-engine safe). */
  /** The sampled EXACT-Jaccard pair enumeration (a_id, b_id, j) shared by
    * the q100 recall panel and the q123 S-curve — memoized cached view so
    * the uncapped (sample-bounded) self-join runs once per (session, dir). */
  private[graft] def recallTruthPairs(s: SparkSession, dir: String): DataFrame =
    graft.ops.Memo.getOrCache(truthPairsCache, s, dir, { _ =>
      val ssh = shingles(s, dir).filter(inRecallSample("doc_id", docCount(s, dir)))
      val sizes = ssh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      ssh.as("a").join(ssh.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(count(lit(1)).as("inter"))
        .join(sizes.toDF("a_id", "na"), "a_id")
        .join(sizes.toDF("b_id", "nb"), "b_id")
        .withColumn("j",
          col("inter").cast(DoubleType) / (col("na") + col("nb") - col("inter")))
        .select(col("a_id"), col("b_id"), col("j"))
        .localCheckpoint()
    })

  private val truthPairsCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def dedupRecall(s: SparkSession, dir: String): DataFrame = {
    val truth = recallTruthPairs(s, dir).filter(col("j") >= 0.5)
      .select(col("a_id"), col("b_id"))

    val simPairs = {
      val sig = simhash(s, dir)
      val ok = sig.groupBy(col("simhash")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") <= BucketCap).select("simhash")
      val bucketed = sig.join(ok, "simhash")
      bucketed.as("a").join(bucketed.as("b"),
          col("a.simhash") === col("b.simhash") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
    }
    val verified = ngramJaccard(s, dir).select("a_id", "b_id")
      .join(minhashLsh(s, dir), Seq("a_id", "b_id"))

    val methods: Seq[(String, DataFrame)] = Seq(
      "minhash_lsh" -> minhashLsh(s, dir).select("a_id", "b_id"),
      "ngram_capped" -> ngramJaccard(s, dir).select("a_id", "b_id"),
      "pipeline_verified" -> verified,
      "simhash_identical" -> simPairs)
    val n = docCount(s, dir)
    val found = methods.map { case (m, df) =>
      df.filter(inRecallSample("a_id", n) && inRecallSample("b_id", n))
        .select(lit(m).as("method"), col("a_id"), col("b_id"))
    }.reduce(_ union _)

    val hits = found
      .join(broadcast(truth.withColumn("hit", lit(1L))), Seq("a_id", "b_id"), "left")
      .groupBy(col("method"))
      .agg(count(lit(1)).as("found_pairs"),
        sum(coalesce(col("hit"), lit(0L))).as("true_found"))
    val tot = truth.agg(count(lit(1)).as("truth_pairs"))
    hits.crossJoin(broadcast(tot))
      .select(col("method"), col("truth_pairs"), col("found_pairs"), col("true_found"),
        (col("true_found").cast(DoubleType) / col("truth_pairs")).as("recall"),
        (col("true_found").cast(DoubleType) / col("found_pairs")).as("precision"))
      .orderBy(col("method"))
  }

  /** S-curve validation for the MinHash-LSH banding — the measurement that
    * justifies the (bands=4, rows=2) choice instead of asserting it: per
    * exact-Jaccard bucket over the q100 recall sample, the EMPIRICAL
    * collision rate of the production (capped) band join next to the
    * ANALYTIC MinHash expectation 1-(1-j²)⁴. Where the curves agree, the
    * banding behaves like the textbook model; where the empirical rate
    * falls below it, the bucket cap (or lane correlation) is eating
    * candidates — exactly the drift a curation owner re-tunes b/r against.
    *
    * Scale shape: the truth side is the same exact-on-a-sample pair
    * enumeration q100 runs (cost bounded by the sample's Σ df², never the
    * corpus); the empirical side is the already-audited q42 generator with
    * two extra narrow id filters; the final attach broadcasts the sampled
    * candidate set. The analytic mean uses the floor-quantized
    * DECIMAL(38,0) sum discipline so the per-bucket average is
    * order-independent and bitwise cross-engine. */
  def lshScurve(s: SparkSession, dir: String): DataFrame = {
    val pairs = recallTruthPairs(s, dir)
    val collided = {
      val n = docCount(s, dir)
      minhashLsh(s, dir)
        .filter(inRecallSample("a_id", n) && inRecallSample("b_id", n))
        .withColumn("hit", lit(1L))
    }
    pairs.join(broadcast(collided), Seq("a_id", "b_id"), "left")
      // (1-j²)⁴ via explicit squarings — the same IEEE association the
      // oracle SQL spells out, so the analytic column is bitwise portable
      .withColumn("p", expr(
        "1.0 - ((1.0 - j*j)*(1.0 - j*j)) * ((1.0 - j*j)*(1.0 - j*j))"))
      .withColumn("bucket", expr("CAST(LEAST(FLOOR(j * 10), 9) AS BIGINT)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(coalesce(col("hit"), lit(0L))).as("collided"),
        expr("CAST(SUM(coalesce(hit, 0)) AS DOUBLE) / COUNT(*)").as("emp_rate"),
        expr("CAST(SUM(CAST(FLOOR(p * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12 / COUNT(*)")
          .as("analytic_rate"))
      .orderBy(col("bucket"))
  }

  /** The (bands, rows-per-band) geometries the sweep executes: the
    * production (4, 2) plus the recall-lean (8, 1) and precision-lean
    * (2, 4) splits of the same 8 minhash lanes. */
  val BandGeometries: Seq[(Int, Int)] = Seq((2, 4), (4, 2), (8, 1))

  /** Candidate pairs under an arbitrary bands × rowsPerBand split of the 8
    * lanes — [[minhashLshPlan]] generalized; same bucket cap, same
    * distinct-pair shape, so every geometry inherits the audited
    * buckets × cap² fan-out bound. */
  private def bandPairsGeom(s: SparkSession, dir: String,
      bands: Int, rows: Int): DataFrame = {
    val sig = minhashSignatures(s, dir)
      .withColumn("bands", array(
        (0 until bands).map(b => struct(lit(b).as("band"),
          md5(concat((0 until rows).map(r => col(s"h${b * rows + r}")): _*)).as("bh"))): _*))
      .select(col("doc_id"), explode(col("bands")).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
    val ok = sig.groupBy(col("band"), col("bh")).agg(count(lit(1)).as("n"))
      .filter(col("n") <= BucketCap).select("band", "bh")
    val bucketed = sig.join(ok, Seq("band", "bh"))
    bucketed.as("a").join(bucketed.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
  }

  /** q155: the banding-geometry SWEEP — q123's S-curve validates the
    * production (4, 2) banding against theory; this EXECUTES the
    * alternative geometries over the same corpus and measures each against
    * the sampled exact-Jaccard truth (j ≥ 0.5): recall, precision, and the
    * candidate volume the verifier must then pay for. The b/r trade is THE
    * tuning knob of MinHash dedup (more, narrower bands ⇒ recall up,
    * candidates up); a curation owner re-tunes it from exactly this panel.
    *
    * Scale shape: three band joins, each the audited capped-bucket
    * generator; the truth set is the memoized sample-bounded enumeration
    * (broadcast-sized), and the panel is |geometries| rows. */
  /** Memoized: the panel is |geometries| rows behind three band joins,
    * and q196's selection re-reads it — without the memo the sweep ran
    * twice per session (4.3 s each at sf0.1). */
  def lshBandSweep(s: SparkSession, dir: String): DataFrame =
    graft.ops.Memo.getOrCache(bandSweepCache, s, dir, _ =>
      lshBandSweepPlan(s, dir).localCheckpoint())

  private val bandSweepCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private[graft] def lshBandSweepPlan(s: SparkSession, dir: String): DataFrame = {
    val n = docCount(s, dir)
    val truth = recallTruthPairs(s, dir).filter(col("j") >= 0.5)
      .select(col("a_id"), col("b_id"))
    val truthB = broadcast(truth.withColumn("hit", lit(1L)))
    // the three geometries are INDEPENDENT band joins over the memoized
    // signature view — submit them concurrently from the driver (Par, the
    // ANN-panel pattern): each reduces to a one-row aggregate, results
    // fold in declaration order, values identical to the sequential union
    val perGeom = graft.ops.Par.map(BandGeometries) { case (b, r) =>
      bandPairsGeom(s, dir, b, r)
        .filter(inRecallSample("a_id", n) && inRecallSample("b_id", n))
        .join(truthB, Seq("a_id", "b_id"), "left")
        .agg(count(lit(1)).as("found_pairs"),
          sum(coalesce(col("hit"), lit(0L))).as("true_found"))
        .select(lit(b.toLong).as("bands"), lit(r.toLong).as("rows_per_band"),
          col("found_pairs"), col("true_found"))
        .localCheckpoint()
    }
    val hits = perGeom.reduce(_ unionByName _)
      .filter(col("found_pairs") > 0) // groupBy parity: empty geometry = no row
    val tot = truth.agg(count(lit(1)).as("truth_pairs"))
    hits.crossJoin(broadcast(tot))
      .select(col("bands"), col("rows_per_band"), col("truth_pairs"),
        col("found_pairs"), col("true_found"),
        (col("true_found").cast(DoubleType) / col("truth_pairs")).as("recall"),
        (col("true_found").cast(DoubleType) / col("found_pairs")).as("precision"))
      .orderBy(col("bands"))
  }

  /** q171: CROSS-SOURCE duplication matrix — the provenance view of the
    * verified near-dup pair graph: for every (source_a ≤ source_b) pair,
    * how many duplicate pairs span them, how many distinct docs on each
    * side are implicated, and the mean Jaccard. Within-source rows are
    * boilerplate/templating; CROSS-source rows are syndication, scraping
    * overlap, or licensing leakage — the table a corpus owner reads to
    * decide which source to drop. Costs nothing beyond the memoized q41
    * pair graph it reads: two broadcast-able id→source lookups (the pair
    * set is metadata-sized) and a |source-pairs|-row aggregate. */
  /** q196: CLOSE THE TUNER LOOP over the q155 panel — pick the banding
    * geometry maximizing `recall − 0.01 · candidates/truth` (recall paid
    * for by verifier volume; the λ prices one exact-Jaccard verification
    * against a point of recall). Measurement → selection → production
    * config as one queryable artifact: re-run it after a corpus shift and
    * the chosen row IS the new config, no human in the loop. Ties break
    * (score, then fewer bands = cheaper) — a total order. Costs one
    * |geometries|-row window over the memoized panel. */
  def bandSelect(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("bands"))
    lshBandSweep(s, dir)
      .withColumn("score", expr(
        "recall - 0.01 * (CAST(found_pairs AS DOUBLE) / CAST(truth_pairs AS DOUBLE))"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("bands"), col("rows_per_band"), col("truth_pairs"),
        col("found_pairs"), col("true_found"), col("recall"),
        col("precision"), col("score"))
  }

  /** q203: per-document N-GRAM COMMONNESS — the fraction of a document's
    * distinct shingle OCCURRENCES that are corpus-wide repeats:
    * (Σ df − n) / Σ df over the doc's shingles, where df is each
    * shingle's document frequency. 0 = every 3-gram is unique to this
    * doc; → 1 = pure boilerplate assembled from phrases the corpus
    * already contains everywhere. The doc-LEVEL aggregate complement of
    * q88's passage removal (which cuts individual high-df passages): a
    * curation owner thresholds this score to drop template-generated
    * docs wholesale before paying for pairwise dedup. Chosen over a
    * df==1 "novelty share" because singletons vanish as the corpus
    * grows (sf0.01 → sf0.1 drops singleton share from 58% to <1%) while
    * the repeat-mass ratio stays discriminative at any scale.
    *
    * Determinism: BIGINT counts and sums, one final double division
    * (denominator ≥ 1 by construction — every doc has ≥ 1 shingle with
    * df ≥ 1). Scale shape: reuses the memoized shingle view; df is one
    * hash aggregate on the shingle key and the rejoin shuffles on the
    * SAME key (exchange reuse), then a per-doc aggregate — two shuffles
    * total, both on keys the dedup family already pays for; never a
    * pair join. */
  def ngramCommonness(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
    val dfreq = sh.groupBy(col("sh")).agg(count(lit(1)).cast(LongType).as("df"))
    val src = Tables(s, dir, "documents").select(col("doc_id"), col("source"))
    sh.join(dfreq, "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast(LongType).as("n_shingles"),
        sum(col("df")).cast(LongType).as("sum_df"))
      .join(src, "doc_id")
      .select(col("doc_id"), col("source"), col("n_shingles"), col("sum_df"),
        ((col("sum_df") - col("n_shingles")).cast(DoubleType) /
          col("sum_df").cast(DoubleType)).as("repeat_share"))
      .orderBy(col("doc_id"))
  }

  def crossSourceDup(s: SparkSession, dir: String): DataFrame = {
    val src = Tables(s, dir, "documents").select(col("doc_id"), col("source"))
    val pairs = ngramJaccard(s, dir).select(col("a_id"), col("b_id"), col("jaccard"))
      .join(src.toDF("a_id", "sa"), "a_id")
      .join(src.toDF("b_id", "sb"), "b_id")
      .withColumn("source_a", least(col("sa"), col("sb")))
      .withColumn("source_b", greatest(col("sa"), col("sb")))
    pairs.groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("a_id")).as("n_docs_a"),
        countDistinct(col("b_id")).as("n_docs_b"),
        expr("CAST(SUM(CAST(FLOOR(jaccard * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12 / COUNT(*)")
          .as("mean_jaccard"),
        sum(when(col("sa") === col("sb"), 1L).otherwise(0L)).as("within_source"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** q200: the 8-lane MinHash signature via the native codegen'd
    * expression (graft.expr.MinHashExpr) — one pass over each row's
    * shingle array, no explode and no doc-keyed aggregate (the relational
    * form shuffles corpus × shingles rows into a group-MIN). The eight
    * element_at projections CSE into a single evaluation under
    * whole-stage codegen's subexpression elimination. Same DuckDB oracle
    * as the relational lanes: native == relational, bitwise. */
  def minhash8Native(s: SparkSession, dir: String): DataFrame = {
    // memoized ARRAY form: the expression evaluates exactly once per row
    // (single reference in the checkpointed plan — lane projections below
    // read columnar data, so no CSE assumption is needed); q200 gates it
    // and q201 composes it into the pair join
    val mh = graft.ops.Memo.getOrCache(minhash8Cache, s, dir, _ =>
      minhash8NativePlan(s, dir).localCheckpoint())
    mh.filter(element_at(col("mh"), 1).isNotNull) // shingle-less docs
      .select(col("doc_id") +: (0 until 8).map(i =>
        element_at(col("mh"), i + 1).as(s"h$i")): _*)
      .orderBy(col("doc_id"))
  }

  private val minhash8Cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private[graft] def minhash8NativePlan(s: SparkSession, dir: String): DataFrame = {
    // local[32] reads the corpus as ONE split, serializing the hash work
    // onto one core; a real deployment has thousands of input splits, so
    // the round-robin here just models that parallelism locally
    val arr = Tables(s, dir, "documents").repartition(32)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("shs", expr(
        """array_distinct(filter(transform(sequence(1, size(toks)),
          |  i -> concat(try_element_at(toks, i), ' ', try_element_at(toks, i + 1),
          |              ' ', try_element_at(toks, i + 2))),
          |  x -> x IS NOT NULL))""".stripMargin))
    // NO size(shs) filter here: a predicate on shs makes Catalyst
    // substitute (= recompute) the whole shingle HOF inside the filter;
    // an empty shingle set yields all-null lanes, so the shingle-less
    // docs drop via a cheap null check on the MEMOIZED frame instead
    arr.select(col("doc_id"),
      graft.expr.MinHashFunctions.minhash8(col("shs")).as("mh"))
  }

  /** Same signature via the native codegen'd Catalyst expression
    * (graft.expr.SimHashExpr) — one pass per row, no explode/shuffle at all;
    * this is the hot-path form for 100 TB corpora. 48 bits so the DuckDB
    * oracle stays in signed-BIGINT range. */
  def simhashNative(s: SparkSession, dir: String): DataFrame =
    graft.Tables(s, dir, "documents")
      .select(col("doc_id"),
        graft.expr.SimHashFunctions.simhash(array_distinct(split(col("text"), " ")), 48)
          .as("simhash"))
      .orderBy(col("doc_id"))
}

object DedupOps {
  import DedupOpsImpl._

  /** DuckDB mirror of [[DedupOpsImpl.minhashSignatures]]'s lane windows. */
  private val laneSql: String = (0 until 8).map { i =>
    val src = if (i < 4) "md5(sh)" else "md5('1:' || sh)"
    s"MIN(substr($src, ${1 + 8 * (i % 4)}, 8)) AS h$i"
  }.mkString(", ")

  /** Shared DuckDB shingle CTE (mirror of [[DedupOpsImpl.shingles]]). */
  private val shingleSql =
    """sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_filter(list_transform(
      |    generate_series(1, len(t)),
      |    i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]),
      |    x -> x IS NOT NULL))) AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))""".stripMargin

  /** DuckDB mirror of the banding sweep — shared by q155 (the panel)
    * and q196 (the argmax selection over it). */
  private[graft] lazy val bandSweepOracle: String = {
      def rb(id: String) = {
        def nib(i: Int) =
          s"(strpos('0123456789abcdef', substr(md5('rcl:' || CAST($id AS VARCHAR)), $i, 1)) - 1)"
        s"(${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)})" +
          s" * (SELECT COUNT(*) FROM documents) < ${RecallSampleTarget * 65536L}"
      }
      val geoms = BandGeometries.zipWithIndex.map { case ((b, r), g) =>
        val bandsSel = (0 until b).map(bi =>
          s"SELECT doc_id, $bi AS band, md5(${(0 until r).map(ri => s"h${bi * r + ri}").mkString(" || ")}) AS bh FROM sig")
          .mkString(" UNION ALL ")
        s"""bands$g AS ($bandsSel),
           |ok$g AS (SELECT band, bh FROM bands$g GROUP BY band, bh HAVING COUNT(*) <= $BucketCap),
           |bk$g AS (SELECT b.doc_id, b.band, b.bh FROM bands$g b JOIN ok$g USING (band, bh)),
           |f$g AS (
           |  SELECT CAST($b AS BIGINT) AS bands, CAST($r AS BIGINT) AS rows_per_band, a_id, b_id
           |  FROM (
           |    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
           |    FROM bk$g a JOIN bk$g b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id) c
           |  WHERE ${rb("a_id")} AND ${rb("b_id")})""".stripMargin
      }.mkString(",\n")
      val unionAll = BandGeometries.indices
        .map(g => s"SELECT * FROM f$g").mkString(" UNION ALL ")
      s"""WITH $shingleSql,
         |ssh AS (SELECT doc_id, sh.sh FROM sh WHERE ${rb("doc_id")}),
         |tsizes AS (SELECT doc_id, COUNT(*) AS n FROM ssh GROUP BY doc_id),
         |truth AS (
         |  SELECT a_id, b_id FROM (
         |    SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
         |    FROM ssh a JOIN ssh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |    GROUP BY 1, 2) p
         |  JOIN tsizes na ON na.doc_id = a_id JOIN tsizes nb ON nb.doc_id = b_id
         |  WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.5),
         |sig AS (SELECT doc_id, $laneSql FROM sh GROUP BY doc_id),
         |$geoms,
         |found AS ($unionAll),
         |hits AS (
         |  SELECT bands, rows_per_band, CAST(COUNT(*) AS BIGINT) AS found_pairs,
         |    CAST(SUM(CASE WHEN t.a_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS true_found
         |  FROM found f LEFT JOIN truth t ON t.a_id = f.a_id AND t.b_id = f.b_id
         |  GROUP BY 1, 2),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS truth_pairs FROM truth)
         |SELECT bands, rows_per_band, truth_pairs, found_pairs, true_found,
         |  CAST(true_found AS DOUBLE) / truth_pairs AS recall,
         |  CAST(true_found AS DOUBLE) / found_pairs AS precision
         |FROM hits, tot ORDER BY bands""".stripMargin
  }

  def queries: Seq[Q] = Seq(
    Q("q40_dedup_exact", exact, Some(
      """SELECT md5(text) AS text_hash, MIN(doc_id) AS canonical_doc, COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY canonical_doc""".stripMargin)),

    Q("q41_dedup_ngram_jaccard", ngramJaccard, Some(
      s"""WITH $shingleSql,
         |rare AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= $DfCap),
         |docsh AS (SELECT s.doc_id, s.sh FROM sh s JOIN rare USING (sh)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM docsh GROUP BY doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
         |  FROM docsh a JOIN docsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT a_id, b_id, inter, na.n + nb.n - inter AS uni,
         |  CAST(inter AS DOUBLE) / (na.n + nb.n - inter) AS jaccard
         |FROM pairs
         |JOIN sizes na ON na.doc_id = a_id
         |JOIN sizes nb ON nb.doc_id = b_id
         |WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.5
         |ORDER BY a_id, b_id""".stripMargin), headline = true),

    Q("q133_dedup_shards", dedupShards, Some(
      s"""WITH RECURSIVE $shingleSql,
         |rare AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= $DfCap),
         |docsh AS (SELECT s.doc_id, s.sh FROM sh s JOIN rare USING (sh)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM docsh GROUP BY doc_id),
         |jp AS (
         |  SELECT a_id, b_id FROM (
         |    SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
         |    FROM docsh a JOIN docsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |    GROUP BY 1, 2) p
         |  JOIN sizes na ON na.doc_id = a_id JOIN sizes nb ON nb.doc_id = b_id
         |  WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.5),
         |nodes AS MATERIALIZED (SELECT a_id AS id FROM jp UNION SELECT b_id FROM jp),
         |edges AS MATERIALIZED (SELECT a_id AS src, b_id AS dst FROM jp
         |          UNION ALL SELECT b_id, a_id FROM jp),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
         |comp AS (SELECT id AS doc_id, MIN(r) AS comp FROM reach GROUP BY id),
         |a AS (
         |  SELECT d.doc_id, c.comp,
         |    (strpos('0123456789abcdef', substr(md5('shard:' ||
         |      CAST(COALESCE(c.comp, d.doc_id) AS VARCHAR)), 1, 1)) - 1) % $NumShards
         |      AS shard
         |  FROM documents d LEFT JOIN comp c USING (doc_id))
         |SELECT CAST(shard AS BIGINT) AS shard, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN comp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clustered,
         |  CAST(COUNT(DISTINCT comp) AS BIGINT) AS n_clusters
         |FROM a GROUP BY shard ORDER BY shard""".stripMargin)),

    Q("q110_dedup_split_leakage", splitLeakage, Some {
      def splitSql(id: String) = {
        val byteSql =
          s"(strpos('0123456789abcdef', substr(md5('split:' || CAST($id AS VARCHAR)), 1, 1)) - 1) * 16" +
            s" + (strpos('0123456789abcdef', substr(md5('split:' || CAST($id AS VARCHAR)), 2, 1)) - 1)"
        val (tr, va) = TextOpsImpl.SplitThresholds
        s"CASE WHEN ($byteSql) < $tr THEN 'train' WHEN ($byteSql) < $va THEN 'val' ELSE 'test' END"
      }
      s"""WITH $shingleSql,
         |rare AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= $DfCap),
         |docsh AS (SELECT s.doc_id, s.sh FROM sh s JOIN rare USING (sh)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM docsh GROUP BY doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
         |  FROM docsh a JOIN docsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |jp AS (
         |  SELECT a_id, b_id,
         |    CAST(inter AS DOUBLE) / (na.n + nb.n - inter) AS jaccard
         |  FROM pairs
         |  JOIN sizes na ON na.doc_id = a_id
         |  JOIN sizes nb ON nb.doc_id = b_id
         |  WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.5)
         |SELECT a_id, b_id,
         |  ${splitSql("a_id")} AS split_a,
         |  ${splitSql("b_id")} AS split_b,
         |  jaccard
         |FROM jp
         |WHERE ${splitSql("a_id")} <> ${splitSql("b_id")}
         |ORDER BY a_id, b_id""".stripMargin
    }),

    Q("q42_dedup_minhash_lsh", minhashLsh, Some {
      val bands = (0 until 4).map(b => s"SELECT doc_id, $b AS band, md5(h${2 * b} || h${2 * b + 1}) AS bh FROM sig")
        .mkString(" UNION ALL ")
      s"""WITH $shingleSql,
         |sig AS (SELECT doc_id, $laneSql FROM sh GROUP BY doc_id),
         |bands AS ($bands),
         |ok AS (SELECT band, bh FROM bands GROUP BY band, bh HAVING COUNT(*) <= $BucketCap),
         |bk AS (SELECT b.doc_id, b.band, b.bh FROM bands b JOIN ok USING (band, bh))
         |SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |FROM bk a JOIN bk b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
         |ORDER BY a_id, b_id""".stripMargin
    }, headline = true),

    Q("q43_dedup_simhash", simhash, Some {
      val sums = (0 until 16).map { j =>
        val pos = j / 4 + 1
        val shift = 1 << (3 - j % 4)
        s"SUM(CASE WHEN ((strpos('0123456789abcdef', substr(h, $pos, 1)) - 1) // $shift) % 2 = 1 THEN 1 ELSE -1 END) AS s$j"
      }.mkString(", ")
      val bits = (0 until 16).map(j => s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
      s"""WITH tok AS (
         |  SELECT doc_id, md5(tk) AS h FROM (
         |    SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tk
         |    FROM documents)),
         |sums AS (SELECT doc_id, $sums FROM tok GROUP BY doc_id)
         |SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM sums ORDER BY doc_id""".stripMargin
    }),

    Q("q45_dedup_pipeline", dedupPipeline, Some {
      val bands = (0 until 4).map(b => s"SELECT doc_id, $b AS band, md5(h${2 * b} || h${2 * b + 1}) AS bh FROM sig")
        .mkString(" UNION ALL ")
      s"""WITH $shingleSql,
         |keep_exact AS (
         |  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |rare AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= $DfCap),
         |docsh AS (SELECT s.doc_id, s.sh FROM sh s JOIN rare USING (sh)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM docsh GROUP BY doc_id),
         |jpairs AS (
         |  SELECT a_id, b_id FROM (
         |    SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
         |    FROM docsh a JOIN docsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |    GROUP BY 1, 2) p
         |  JOIN sizes na ON na.doc_id = a_id JOIN sizes nb ON nb.doc_id = b_id
         |  WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.5),
         |sig AS (SELECT doc_id, $laneSql FROM sh GROUP BY doc_id),
         |bands AS ($bands),
         |ok AS (SELECT band, bh FROM bands GROUP BY band, bh HAVING COUNT(*) <= $BucketCap),
         |bk AS (SELECT b.doc_id, b.band, b.bh FROM bands b JOIN ok USING (band, bh)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bk a JOIN bk b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |dropped AS (
         |  SELECT DISTINCT j.b_id AS doc_id FROM jpairs j JOIN cand c
         |    ON j.a_id = c.a_id AND j.b_id = c.b_id)
         |SELECT doc_id FROM keep_exact
         |WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
         |ORDER BY doc_id""".stripMargin
    }, headline = true),

    Q("q46_dedup_components", dedupComponents, Some(
      s"""WITH RECURSIVE $shingleSql,
         |rare AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= $DfCap),
         |docsh AS (SELECT s.doc_id, s.sh FROM sh s JOIN rare USING (sh)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM docsh GROUP BY doc_id),
         |jp AS (
         |  SELECT a_id, b_id FROM (
         |    SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
         |    FROM docsh a JOIN docsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |    GROUP BY 1, 2) p
         |  JOIN sizes na ON na.doc_id = a_id JOIN sizes nb ON nb.doc_id = b_id
         |  WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.5),
         |nodes AS MATERIALIZED (SELECT a_id AS id FROM jp UNION SELECT b_id FROM jp),
         |edges AS MATERIALIZED (SELECT a_id AS src, b_id AS dst FROM jp
         |          UNION ALL SELECT b_id, a_id FROM jp),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id)
         |SELECT id AS doc_id, MIN(r) AS component FROM reach
         |GROUP BY id ORDER BY doc_id""".stripMargin)),

    Q("q67_dedup_keep_best", dedupKeepBest, Some {
      val stopSql = TextOpsImpl.stopwords.map(s => s"'$s'").mkString("(", ", ", ")")
      s"""WITH RECURSIVE $shingleSql,
         |rare AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= $DfCap),
         |docsh AS (SELECT s.doc_id, s.sh FROM sh s JOIN rare USING (sh)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM docsh GROUP BY doc_id),
         |jp AS (
         |  SELECT a_id, b_id FROM (
         |    SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
         |    FROM docsh a JOIN docsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |    GROUP BY 1, 2) p
         |  JOIN sizes na ON na.doc_id = a_id JOIN sizes nb ON nb.doc_id = b_id
         |  WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.5),
         |nodes AS MATERIALIZED (SELECT a_id AS id FROM jp UNION SELECT b_id FROM jp),
         |edges AS MATERIALIZED (SELECT a_id AS src, b_id AS dst FROM jp
         |          UNION ALL SELECT b_id, a_id FROM jp),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
         |comps AS (SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id),
         |qual AS (
         |  SELECT doc_id,
         |    least(CAST(n_tok AS DOUBLE) / 50.0, 1.0) * 0.5
         |      + (1.0 - CAST(n_stop AS DOUBLE) / n_tok) * 0.5 AS quality
         |  FROM (
         |    SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |      CAST(len(list_filter(string_split(text, ' '), x -> x IN $stopSql)) AS BIGINT) AS n_stop
         |    FROM documents)),
         |j AS (SELECT c.doc_id, c.component, q.quality
         |  FROM comps c JOIN qual q USING (doc_id)),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY component
         |    ORDER BY quality DESC, doc_id) AS rn FROM j)
         |SELECT doc_id, component, quality, rn = 1 AS keep FROM r
         |ORDER BY doc_id""".stripMargin
    }),

    Q("q105_dedup_cluster_sizes", dedupClusterSizes, Some(
      s"""WITH RECURSIVE $shingleSql,
         |rare AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= $DfCap),
         |docsh AS (SELECT s.doc_id, s.sh FROM sh s JOIN rare USING (sh)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM docsh GROUP BY doc_id),
         |jp AS (
         |  SELECT a_id, b_id FROM (
         |    SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
         |    FROM docsh a JOIN docsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |    GROUP BY 1, 2) p
         |  JOIN sizes na ON na.doc_id = a_id JOIN sizes nb ON nb.doc_id = b_id
         |  WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.5),
         |nodes AS MATERIALIZED (SELECT a_id AS id FROM jp UNION SELECT b_id FROM jp),
         |edges AS MATERIALIZED (SELECT a_id AS src, b_id AS dst FROM jp
         |          UNION ALL SELECT b_id, a_id FROM jp),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
         |comp AS (SELECT id, MIN(r) AS c FROM reach GROUP BY id),
         |csz AS (SELECT c, COUNT(*) AS cluster_size FROM comp GROUP BY c),
         |hist AS (
         |  SELECT cluster_size, COUNT(*) AS n_clusters,
         |    cluster_size * COUNT(*) AS n_docs
         |  FROM csz GROUP BY cluster_size)
         |SELECT * FROM hist
         |UNION ALL
         |SELECT CAST(1 AS BIGINT),
         |  (SELECT COUNT(*) FROM documents) - (SELECT COUNT(*) FROM comp),
         |  (SELECT COUNT(*) FROM documents) - (SELECT COUNT(*) FROM comp)
         |ORDER BY cluster_size""".stripMargin)),

    Q("q47_dedup_contamination", contamination, Some(
      s"""WITH $shingleSql,
         |hold AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 50 = 0),
         |train AS (SELECT doc_id, sh.sh, CASE WHEN hold.sh IS NOT NULL THEN 1 ELSE 0 END AS hit
         |          FROM sh LEFT JOIN hold USING (sh) WHERE doc_id % 50 <> 0)
         |SELECT doc_id, COUNT(*) AS n_sh, CAST(SUM(hit) AS BIGINT) AS n_cont,
         |  CAST(SUM(hit) AS DOUBLE) / COUNT(*) AS rate
         |FROM train GROUP BY doc_id HAVING SUM(hit) > 0
         |ORDER BY doc_id""".stripMargin)),

    Q("q94_dedup_bloom_decon", bloomDecontaminate, Some(
      s"""WITH $shingleSql,
         |hold AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 50 = 0),
         |corpus AS (SELECT doc_id, sh.sh FROM sh WHERE doc_id % 50 <> 0),
         |cont AS (SELECT DISTINCT c.doc_id FROM corpus c JOIN hold USING (sh))
         |SELECT doc_id, COUNT(*) AS n_sh FROM corpus
         |WHERE doc_id NOT IN (SELECT doc_id FROM cont)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("q44_dedup_simhash_native", simhashNative, Some {
      val sums = (0 until 48).map { j =>
        val pos = j / 4 + 1
        val shift = 1 << (3 - j % 4)
        s"SUM(CASE WHEN ((strpos('0123456789abcdef', substr(h, $pos, 1)) - 1) // $shift) % 2 = 1 THEN 1 ELSE -1 END) AS s$j"
      }.mkString(", ")
      val bits = (0 until 48).map(j => s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
      s"""WITH tok AS (
         |  SELECT doc_id, md5(tk) AS h FROM (
         |    SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tk
         |    FROM documents)),
         |sums AS (SELECT doc_id, $sums FROM tok GROUP BY doc_id)
         |SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM sums ORDER BY doc_id""".stripMargin
    }),

    Q("q103_dedup_containment", containmentPairs, Some(
      s"""WITH $shingleSql,
         |rare AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= $DfCap),
         |docsh AS (SELECT s.doc_id, s.sh FROM sh s JOIN rare USING (sh)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM docsh GROUP BY doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
         |  FROM docsh a JOIN docsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT a_id, b_id, inter, na.n AS na, nb.n AS nb,
         |  CAST(inter AS DOUBLE) / least(na.n, nb.n) AS containment,
         |  CASE WHEN na.n <= nb.n THEN a_id ELSE b_id END AS contained_id
         |FROM pairs
         |JOIN sizes na ON na.doc_id = a_id
         |JOIN sizes nb ON nb.doc_id = b_id
         |WHERE CAST(inter AS DOUBLE) / least(na.n, nb.n) >= $ContainmentMin
         |ORDER BY a_id, b_id""".stripMargin)),

    Q("q100_dedup_recall", dedupRecall, Some {
      def rb(id: String) =
        {
          def nib(i: Int) =
            s"(strpos('0123456789abcdef', substr(md5('rcl:' || CAST($id AS VARCHAR)), $i, 1)) - 1)"
          s"(${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)})" +
            s" * (SELECT COUNT(*) FROM documents) < ${RecallSampleTarget * 65536L}"
        }
      val bands = (0 until 4).map(b =>
        s"SELECT doc_id, $b AS band, md5(h${2 * b} || h${2 * b + 1}) AS bh FROM sig")
        .mkString(" UNION ALL ")
      val sums = (0 until 16).map { j =>
        val pos = j / 4 + 1
        val shift = 1 << (3 - j % 4)
        s"SUM(CASE WHEN ((strpos('0123456789abcdef', substr(h, $pos, 1)) - 1) // $shift) % 2 = 1 THEN 1 ELSE -1 END) AS s$j"
      }.mkString(", ")
      val bits = (0 until 16).map(j => s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
      s"""WITH $shingleSql,
         |ssh AS (SELECT doc_id, sh.sh FROM sh WHERE ${rb("doc_id")}),
         |tsizes AS (SELECT doc_id, COUNT(*) AS n FROM ssh GROUP BY doc_id),
         |truth AS (
         |  SELECT a_id, b_id FROM (
         |    SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
         |    FROM ssh a JOIN ssh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |    GROUP BY 1, 2) p
         |  JOIN tsizes na ON na.doc_id = a_id JOIN tsizes nb ON nb.doc_id = b_id
         |  WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.5),
         |rare AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= $DfCap),
         |docsh AS (SELECT s.doc_id, s.sh FROM sh s JOIN rare USING (sh)),
         |csizes AS (SELECT doc_id, COUNT(*) AS n FROM docsh GROUP BY doc_id),
         |jpairs AS (
         |  SELECT a_id, b_id FROM (
         |    SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
         |    FROM docsh a JOIN docsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |    GROUP BY 1, 2) p
         |  JOIN csizes na ON na.doc_id = a_id JOIN csizes nb ON nb.doc_id = b_id
         |  WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.5),
         |sig AS (SELECT doc_id, $laneSql FROM sh GROUP BY doc_id),
         |bands AS ($bands),
         |ok AS (SELECT band, bh FROM bands GROUP BY band, bh HAVING COUNT(*) <= $BucketCap),
         |bk AS (SELECT b.doc_id, b.band, b.bh FROM bands b JOIN ok USING (band, bh)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bk a JOIN bk b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |ver AS (SELECT a_id, b_id FROM jpairs JOIN cand USING (a_id, b_id)),
         |stok AS (
         |  SELECT doc_id, md5(tk) AS h FROM (
         |    SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tk
         |    FROM documents)),
         |ssums AS (SELECT doc_id, $sums FROM stok GROUP BY doc_id),
         |simsig AS (SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM ssums),
         |sok AS (SELECT simhash FROM simsig GROUP BY simhash HAVING COUNT(*) <= $BucketCap),
         |sbk AS (SELECT s.doc_id, s.simhash FROM simsig s JOIN sok USING (simhash)),
         |spairs AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM sbk a JOIN sbk b ON a.simhash = b.simhash AND a.doc_id < b.doc_id),
         |found AS (
         |  SELECT 'minhash_lsh' AS method, a_id, b_id FROM cand
         |    WHERE ${rb("a_id")} AND ${rb("b_id")}
         |  UNION ALL
         |  SELECT 'ngram_capped', a_id, b_id FROM jpairs
         |    WHERE ${rb("a_id")} AND ${rb("b_id")}
         |  UNION ALL
         |  SELECT 'pipeline_verified', a_id, b_id FROM ver
         |    WHERE ${rb("a_id")} AND ${rb("b_id")}
         |  UNION ALL
         |  SELECT 'simhash_identical', a_id, b_id FROM spairs
         |    WHERE ${rb("a_id")} AND ${rb("b_id")})
         |SELECT f.method,
         |  (SELECT COUNT(*) FROM truth) AS truth_pairs,
         |  COUNT(*) AS found_pairs,
         |  CAST(SUM(CASE WHEN t.a_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS true_found,
         |  CAST(SUM(CASE WHEN t.a_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / (SELECT COUNT(*) FROM truth) AS recall,
         |  CAST(SUM(CASE WHEN t.a_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / COUNT(*) AS precision
         |FROM found f LEFT JOIN truth t USING (a_id, b_id)
         |GROUP BY f.method ORDER BY f.method""".stripMargin
    }),

    Q("q171_dedup_source_matrix", crossSourceDup, Some(
      s"""WITH $shingleSql,
         |rare AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= $DfCap),
         |docsh AS (SELECT s.doc_id, s.sh FROM sh s JOIN rare USING (sh)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM docsh GROUP BY doc_id),
         |jp AS (
         |  SELECT a_id, b_id, CAST(inter AS DOUBLE) / (na.n + nb.n - inter) AS jaccard
         |  FROM (
         |    SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
         |    FROM docsh a JOIN docsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |    GROUP BY 1, 2) p
         |  JOIN sizes na ON na.doc_id = a_id JOIN sizes nb ON nb.doc_id = b_id
         |  WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.5),
         |tagged AS (
         |  SELECT j.a_id, j.b_id, j.jaccard, da.source AS sa, db.source AS sb,
         |    LEAST(da.source, db.source) AS source_a,
         |    GREATEST(da.source, db.source) AS source_b
         |  FROM jp j
         |  JOIN documents da ON da.doc_id = j.a_id
         |  JOIN documents db ON db.doc_id = j.b_id)
         |SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(COUNT(DISTINCT a_id) AS BIGINT) AS n_docs_a,
         |  CAST(COUNT(DISTINCT b_id) AS BIGINT) AS n_docs_b,
         |  CAST(SUM(CAST(FLOOR(jaccard * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12 / COUNT(*)
         |    AS mean_jaccard,
         |  CAST(SUM(CASE WHEN sa = sb THEN 1 ELSE 0 END) AS BIGINT) AS within_source
         |FROM tagged
         |GROUP BY source_a, source_b
         |ORDER BY source_a, source_b""".stripMargin)),

    Q("q155_dedup_band_sweep", lshBandSweep, Some(bandSweepOracle)),

    Q("q200_dedup_minhash_native", DedupOpsImpl.minhash8Native, Some(
      s"""WITH $shingleSql
         |SELECT doc_id, $laneSql
         |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // identical oracle to q42 on purpose: the native-signature LSH must
    // produce exactly the relational pipeline's candidate set
    Q("q201_dedup_lsh_native", DedupOpsImpl.minhashLshNative, Some {
      val bands = (0 until 4).map(b => s"SELECT doc_id, $b AS band, md5(h${2 * b} || h${2 * b + 1}) AS bh FROM sig")
        .mkString(" UNION ALL ")
      s"""WITH $shingleSql,
         |sig AS (SELECT doc_id, $laneSql FROM sh GROUP BY doc_id),
         |bands AS ($bands),
         |ok AS (SELECT band, bh FROM bands GROUP BY band, bh HAVING COUNT(*) <= $BucketCap),
         |bk AS (SELECT b.doc_id, b.band, b.bh FROM bands b JOIN ok USING (band, bh))
         |SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |FROM bk a JOIN bk b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
         |ORDER BY a_id, b_id""".stripMargin
    }),

    Q("q196_dedup_band_select", DedupOpsImpl.bandSelect, Some(
      s"""SELECT bands, rows_per_band, truth_pairs, found_pairs, true_found,
         |  recall, precision, score
         |FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, bands)
         |      AS BIGINT) AS rn
         |  FROM (
         |    SELECT *, recall - 0.01 *
         |      (CAST(found_pairs AS DOUBLE) / CAST(truth_pairs AS DOUBLE)) AS score
         |    FROM ($bandSweepOracle) panel) scored) ranked
         |WHERE rn = 1""".stripMargin)),

    Q("q123_dedup_scurve", lshScurve, Some {
      def rb(id: String) =
        {
          def nib(i: Int) =
            s"(strpos('0123456789abcdef', substr(md5('rcl:' || CAST($id AS VARCHAR)), $i, 1)) - 1)"
          s"(${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)})" +
            s" * (SELECT COUNT(*) FROM documents) < ${RecallSampleTarget * 65536L}"
        }
      val bands = (0 until 4).map(b =>
        s"SELECT doc_id, $b AS band, md5(h${2 * b} || h${2 * b + 1}) AS bh FROM sig")
        .mkString(" UNION ALL ")
      s"""WITH $shingleSql,
         |ssh AS (SELECT doc_id, sh.sh FROM sh WHERE ${rb("doc_id")}),
         |tsizes AS (SELECT doc_id, COUNT(*) AS n FROM ssh GROUP BY doc_id),
         |tp AS (
         |  SELECT a_id, b_id,
         |    CAST(inter AS DOUBLE) / (na.n + nb.n - inter) AS j
         |  FROM (
         |    SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
         |    FROM ssh a JOIN ssh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |    GROUP BY 1, 2) p
         |  JOIN tsizes na ON na.doc_id = a_id JOIN tsizes nb ON nb.doc_id = b_id),
         |sig AS (SELECT doc_id, $laneSql FROM sh GROUP BY doc_id),
         |bands AS ($bands),
         |ok AS (SELECT band, bh FROM bands GROUP BY band, bh HAVING COUNT(*) <= $BucketCap),
         |bk AS (SELECT b.doc_id, b.band, b.bh FROM bands b JOIN ok USING (band, bh)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bk a JOIN bk b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |scand AS (SELECT a_id, b_id FROM cand WHERE ${rb("a_id")} AND ${rb("b_id")}),
         |scored AS (
         |  SELECT CAST(LEAST(FLOOR(tp.j * 10), 9) AS BIGINT) AS bucket,
         |    CASE WHEN c.a_id IS NOT NULL THEN 1 ELSE 0 END AS hit,
         |    1.0 - ((1.0 - tp.j*tp.j)*(1.0 - tp.j*tp.j)) * ((1.0 - tp.j*tp.j)*(1.0 - tp.j*tp.j)) AS p
         |  FROM tp LEFT JOIN scand c USING (a_id, b_id))
         |SELECT bucket, COUNT(*) AS n_pairs,
         |  CAST(SUM(hit) AS BIGINT) AS collided,
         |  CAST(SUM(hit) AS DOUBLE) / COUNT(*) AS emp_rate,
         |  CAST(SUM(CAST(FLOOR(p * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12 / COUNT(*) AS analytic_rate
         |FROM scored GROUP BY bucket ORDER BY bucket""".stripMargin
    }),

    Q("q203_ngram_commonness", DedupOpsImpl.ngramCommonness, Some(
      s"""WITH $shingleSql,
         |dfreq AS (SELECT sh AS shx, CAST(COUNT(*) AS BIGINT) AS df
         |          FROM sh GROUP BY 1),
         |agg AS (
         |  SELECT s2.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
         |    CAST(SUM(f.df) AS BIGINT) AS sum_df
         |  FROM sh s2 JOIN dfreq f ON s2.sh = f.shx
         |  GROUP BY s2.doc_id)
         |SELECT a.doc_id, d.source, a.n_shingles, a.sum_df,
         |  CAST(a.sum_df - a.n_shingles AS DOUBLE) / CAST(a.sum_df AS DOUBLE)
         |    AS repeat_share
         |FROM agg a JOIN documents d ON d.doc_id = a.doc_id
         |ORDER BY a.doc_id""".stripMargin))
  )
}
