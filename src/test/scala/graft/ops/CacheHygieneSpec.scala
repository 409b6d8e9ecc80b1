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

  test("eviction bound: tracked cached views never exceed the budget; victims rebuild") {
    val dir = "/root/testdata/sf0.001"
    def clearAll(): Unit = {
      DedupOpsImpl.clearCaches(); VectorOpsImpl.clearCaches()
      TextOpsImpl.clearCaches()
    }
    clearAll()
    spark.conf.set("graft.memo.maxCachedViews", "3")
    try {
      // build 7+ distinct cached views — far over the budget of 3
      DedupOpsImpl.dedupComponents(spark, dir).count()
      TextOpsImpl.winnowSharedPassages(spark, dir).count()
      VectorOpsImpl.ivfTopK(spark, dir).count()
      VectorOpsImpl.pqAdcTopK(spark, dir).count()
      VectorOpsImpl.kmeansIvfTopK(spark, dir).count()
      VectorOpsImpl.kmeansIvfPqTopK(spark, dir).count()
      VectorOpsImpl.embedNearDupComponents(spark, dir).count()
      assert(Memo.trackedViews <= 3,
        s"a long-lived session must hold at most budget cached views, " +
          s"got ${Memo.trackedViews}")
      // an evicted view rebuilds transparently on the next consumer
      assert(VectorOpsImpl.ivfTopK(spark, dir).count() > 0)
      assert(DedupOpsImpl.dedupComponents(spark, dir).count() >= 0)
      assert(Memo.trackedViews <= 3, "rebuilds must stay within the budget")
    } finally {
      spark.conf.set("graft.memo.maxCachedViews", "64")
      clearAll()
    }
    assert(Memo.trackedViews == 0, "clearCaches must untrack every view")
  }

  test("eviction really unpersists the victim, not just the bookkeeping") {
    import org.apache.spark.storage.StorageLevel
    val m = new java.util.concurrent.ConcurrentHashMap[
      (org.apache.spark.sql.SparkSession, String), org.apache.spark.sql.DataFrame]()
    spark.conf.set("graft.memo.maxCachedViews", "1")
    try {
      val df1 = Memo.getOrCache(m, spark, "ev1",
        _ => { val d = spark.range(100).toDF("n").cache(); d.count(); d })
      assert(df1.storageLevel != StorageLevel.NONE, "fixture must cache")
      Memo.getOrCache(m, spark, "ev2",
        _ => { val d = spark.range(200).toDF("n").cache(); d.count(); d })
      // the round-11 review's finding: remove-then-capture freed nothing —
      // the victim's cached plan must really leave the cache manager
      assert(df1.storageLevel == StorageLevel.NONE,
        "the evicted view must be unpersisted, not only dropped from the map")
      assert(!m.containsKey((spark, "ev1")), "the memo entry must be gone")
    } finally {
      spark.conf.set("graft.memo.maxCachedViews", "512")
      Memo.clear(m)
    }
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
