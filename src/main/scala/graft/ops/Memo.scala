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

  // ------------------------------------------------------ eviction bound
  // A long-lived session (a 256-entry bench pass, a streaming driver alive
  // for days) must not accumulate every cached view it ever memoized:
  // each is executor storage, and the memo maps hold them strongly. Every
  // DataFrame-holding memo registers here in ACCESS order; past the budget
  // (`graft.memo.maxCachedViews`, default 512) the least-recently-used
  // entry is unpersisted and dropped from its owning map — the next
  // consumer rebuilds it, trading one recompute for bounded memory.
  // Size the budget ABOVE the concurrent working set: evicting a
  // localCheckpoint-backed view mid-query cannot be recomputed from
  // lineage, so the bound is a safety valve, not a cache policy to run at.
  private final case class Tracked(
      cache: ConcurrentHashMap[(SparkSession, String), _],
      key: (SparkSession, String), dfs: () => Seq[DataFrame])
  /** LRU key: the owning MAP by identity (AbstractMap's content-based
    * equals/hashCode would hash every cached value on every access) plus
    * the memo key. */
  private final class MapId(val m: AnyRef, val k: (SparkSession, String)) {
    override def hashCode(): Int =
      System.identityHashCode(m) * 31 + k.hashCode()
    override def equals(o: Any): Boolean = o match {
      case other: MapId => (other.m eq m) && other.k == k
      case _ => false
    }
  }
  private val lru = new java.util.LinkedHashMap[MapId, Tracked](
    16, 0.75f, true /* access order */)

  private def budgetOf(s: SparkSession): Int =
    scala.util.Try(s.conf.get("graft.memo.maxCachedViews", "512").toInt)
      .getOrElse(512)

  /** Live tracked cached-view count (spec surface). */
  def trackedViews: Int = lru.synchronized(lru.size)

  private def track(s: SparkSession, t: Tracked): Unit = {
    // SELECT victims under the monitor; CAPTURE + REMOVE + UNPERSIST after
    // releasing it. The dfs thunk and cache.remove touch the owning
    // ConcurrentHashMap, whose bins may be held by a long-running
    // computeIfAbsent build — doing that under the lru monitor would stall
    // every memo access in the process behind one slow unpersist, and a
    // build that transitively reaches a tracked getOrCache would DEADLOCK
    // on the monitor (the round-11 advisory).
    val victims = lru.synchronized {
      lru.put(new MapId(t.cache, t.key), t)
      val max = math.max(1, budgetOf(s))
      val out = scala.collection.mutable.ListBuffer[Tracked]()
      val it = lru.entrySet().iterator()
      while (lru.size > max && it.hasNext) {
        out += it.next().getValue
        it.remove()
      }
      out.toList
    }
    victims.foreach { victim =>
      // capture the frames BEFORE dropping the map entry: the dfs thunk
      // reads the owning map, so remove-then-capture would resolve to
      // nothing and the eviction would free zero executor storage (the
      // round-11 review's finding — the bound would be bookkeeping only).
      // The remove is CONDITIONAL on the value we captured: between
      // victim selection (under the monitor) and here, a clear+rebuild
      // can have replaced the entry — unconditional remove+unpersist
      // would free the FRESH build's storage out from under its consumer.
      // A skipped victim stays cached; its rebuild re-tracked itself.
      val raw = victim.cache.asInstanceOf[ConcurrentHashMap[Any, Any]]
      val before = raw.get(victim.key)
      if (before != null) {
        val frames =
          if (victim.key._1.sparkContext.isStopped) Nil else victim.dfs()
        if (raw.remove(victim.key, before)) frames.foreach(unpersistAll)
      }
    }
  }

  private def untrack(cache: ConcurrentHashMap[(SparkSession, String), _]): Unit =
    lru.synchronized {
      val it = lru.entrySet().iterator()
      while (it.hasNext) if (it.next().getValue.cache eq cache) it.remove()
    }

  def getOrCache(cache: ConcurrentHashMap[(SparkSession, String), DataFrame],
      s: SparkSession, dir: String, build: String => DataFrame): DataFrame = {
    val v = getOrCacheAny(cache, s, dir, build)
    track(s, Tracked(cache, (s, dir), () =>
      Option(cache.get((s, dir))).toSeq)) // evict what the map holds THEN
    v
  }

  /** Memo for non-DataFrame values (e.g. BPE's (merge tables, final vocab)
    * tuple) with the same purge-on-access hygiene as [[getOrCache]].
    * Driver-side values (paths, models) cost no executor storage, so they
    * are not subject to the eviction bound. */
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
    untrack(cache) // drop LRU entries so stale thunks never fire later
    cache.forEach { (key, v) =>
      if (!key._1.sparkContext.isStopped) dfs(v).foreach(unpersistAll)
    }
    cache.clear()
  }
}
