package graft.ops

import graft.SparkSpec

/** The invalidation contract of every memoized index view (shingles,
  * components, IVF assignment, PQ codes, k-means assignment): after
  * clearCaches, the session's cache manager holds ZERO cached plans — no
  * view outlives the explicit invalidation hook (the r3 finding: the
  * shingle cache was built per call and never covered by any hook). */
class CacheHygieneSpec extends SparkSpec {

  test("clearCaches leaves zero cached plans in the cache manager") {
    val dir = "/root/testdata/sf0.001"
    // start from a clean slate (earlier suites in this JVM may have
    // populated memos or left transient caches)
    DedupOpsImpl.clearCaches()
    VectorOpsImpl.clearCaches()
    TextOpsImpl.clearCaches()
    spark.sharedState.cacheManager.clearCache()

    // populate every memoized cached view
    DedupOpsImpl.dedupComponents(spark, dir).count()  // shingles + components
    TextOpsImpl.winnowSharedPassages(spark, dir).count() // winnow index
    VectorOpsImpl.ivfTopK(spark, dir).count()         // assignment view
    VectorOpsImpl.pqAdcTopK(spark, dir).count()       // PQ codes view
    VectorOpsImpl.kmeansIvfTopK(spark, dir).count()   // learned-assignment view
    VectorOpsImpl.kmeansIvfPqTopK(spark, dir).count() // learned-codes view
    VectorOpsImpl.embedNearDupComponents(spark, dir).count() // embed component map
    assert(!spark.sharedState.cacheManager.isEmpty, "views must actually cache")

    DedupOpsImpl.clearCaches()
    VectorOpsImpl.clearCaches()
    TextOpsImpl.clearCaches()
    assert(spark.sharedState.cacheManager.isEmpty,
      "clearCaches must unpersist every memoized view")

    // memos rebuild correctly after invalidation
    assert(VectorOpsImpl.ivfTopK(spark, dir).count() > 0)
    DedupOpsImpl.clearCaches()
    VectorOpsImpl.clearCaches()
    TextOpsImpl.clearCaches()
  }

  test("clearCaches releases localCheckpoint blocks, not just cached plans") {
    val dir = "/root/testdata/sf0.001"
    def clearAll(): Unit = {
      DedupOpsImpl.clearCaches(); VectorOpsImpl.clearCaches()
      TextOpsImpl.clearCaches(); BpeOpsImpl.clearCaches()
      UnigramOpsImpl.clearCaches()
    }
    clearAll()
    // snapshot instead of asserting emptiness: other suites sharing this
    // JVM may legitimately hold persisted RDDs of their own
    val before = spark.sparkContext.getPersistentRDDs.keySet

    // checkpoint-backed memos: BPE + unigram learning loops, PageRank
    BpeOpsImpl.bpeMerges(spark, dir).count()
    UnigramOpsImpl.unigramVocab(spark, dir).count()
    VectorOpsImpl.knnPagerank(spark, dir).count()
    val during = spark.sparkContext.getPersistentRDDs.keySet
    assert((during -- before).nonEmpty,
      "the memos under test must actually persist checkpoint RDD blocks")

    clearAll()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"clearCaches leaked checkpoint RDD blocks: ids ${(after -- before).toSeq.sorted}")
  }
}
