package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

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
      s: SparkSession, dir: String, build: String => DataFrame): DataFrame = {
    purgeStopped(cache)
    cache.computeIfAbsent((s, dir), { case (_, d) => build(d) })
  }

  /** Drop entries whose session is already stopped — their cached blocks
    * died with the session's executors, so only the map entry remains. */
  private def purgeStopped(
      cache: ConcurrentHashMap[(SparkSession, String), DataFrame]): Unit =
    cache.keySet.forEach { key =>
      if (key._1.sparkContext.isStopped) cache.remove(key)
    }

  /** Unpersist (live sessions only) and drop every entry. */
  def clear(cache: ConcurrentHashMap[(SparkSession, String), DataFrame]): Unit = {
    cache.forEach { (key, df) =>
      if (!key._1.sparkContext.isStopped) df.unpersist()
    }
    cache.clear()
  }
}
