package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Shared (session, dir)-keyed memo for cached index views (shingles,
  * IVF assignments, PQ codes, component maps).
  *
  * Two hygiene properties beyond a bare ConcurrentHashMap:
  *  - every access first PURGES entries whose SparkSession has stopped, so
  *    a long-lived JVM cycling many sessions never retains dead sessions'
  *    plans (the maps would otherwise hold them strongly forever);
  *  - [[clear]] unpersists before dropping, so the explicit invalidation
  *    hooks ([[VectorOpsImpl.clearCaches]]/[[DedupOpsImpl.clearCaches]])
  *    leave zero cached plans behind.
  *
  * All memos assume corpus dirs are immutable within a JVM (true for the
  * driver's testdata); clear the owning cache when regenerating data under
  * a reused path.
  */
object Memo {

  def getOrCache(cache: ConcurrentHashMap[(SparkSession, String), DataFrame],
      s: SparkSession, dir: String, build: String => DataFrame): DataFrame =
    getOrCacheAny(cache, s, dir, build)

  /** Memo for non-DataFrame values (e.g. BPE's (merge tables, final vocab)
    * tuple) with the same purge-on-access hygiene as [[getOrCache]]. */
  def getOrCacheAny[V](cache: ConcurrentHashMap[(SparkSession, String), V],
      s: SparkSession, dir: String, build: String => V): V = {
    purgeStopped(cache)
    cache.computeIfAbsent((s, dir), { case (_, d) => build(d) })
  }

  /** Drop entries whose session is already stopped — their cached blocks
    * died with the session's executors, so only the map entry remains. */
  private def purgeStopped[V](
      cache: ConcurrentHashMap[(SparkSession, String), V]): Unit =
    cache.keySet.forEach { key =>
      if (key._1.sparkContext.isStopped) cache.remove(key)
    }

  /** Release BOTH storage forms a memoized view can hold: the cache-manager
    * entry (InMemoryRelation, from `.cache()`) and any localCheckpoint
    * block — a persisted RDD referenced by a [[LogicalRDD]] leaf, which
    * `df.unpersist()` alone does NOT free (it only touches the cache
    * manager, so checkpoint blocks would linger until ContextCleaner GC). */
  def unpersistAll(df: DataFrame): Unit = {
    df.unpersist()
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }

  /** Round-swap for iterative driver loops (label propagation, PageRank,
    * BPE merges): `next` must already be an EAGER localCheckpoint — its
    * blocks hold the data — so the previous round's blocks are freed
    * immediately and a loop holds at most one round of checkpoint storage
    * no matter how many rounds it runs. Without this, every round's blocks
    * linger until ContextCleaner GC — at 100 TB that is rounds × corpus of
    * dead storage. */
  def roll(prev: DataFrame, next: DataFrame): DataFrame = {
    unpersistAll(prev)
    next
  }

  /** Unpersist (live sessions only) and drop every entry. */
  def clear(cache: ConcurrentHashMap[(SparkSession, String), DataFrame]): Unit =
    clearAny(cache)(Seq(_))

  /** [[clear]] for arbitrary value types: `dfs` names every DataFrame the
    * value holds so their cached plans and checkpoint blocks are freed. */
  def clearAny[V](cache: ConcurrentHashMap[(SparkSession, String), V])(
      dfs: V => Seq[DataFrame]): Unit = {
    cache.forEach { (key, v) =>
      if (!key._1.sparkContext.isStopped) dfs(v).foreach(unpersistAll)
    }
    cache.clear()
  }
}
