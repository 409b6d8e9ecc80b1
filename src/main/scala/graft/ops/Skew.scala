package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins (SURVEY build brief: "skewed keys →
  * salting or AQE skew-join"). AQE handles skew in shuffle joins at runtime;
  * salting is the explicit tool when one key dominates a broadcast-infeasible
  * join or when AQE's split granularity isn't enough.
  */
object Skew {

  /** Salted equi-join: the big (skewed) side gets a random-but-deterministic
    * salt in [0, saltFactor); the small side is exploded saltFactor× so every
    * (key, salt) bucket finds its match. One hot key spreads over
    * `saltFactor` reducers instead of melting one.
    *
    * Salt is derived from stable row content (xxhash64 of all big-side
    * columns), not rand(): deterministic under retries and replays —
    * a task retry with rand() would re-partition rows differently and break
    * exactly-once sinks downstream.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(saltFactor)).cast("int"))
    val smallExploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    bigSalted.join(smallExploded, Seq(key, "__salt")).drop("__salt")
  }

  /** Enable RUNTIME BLOOM-FILTER join pruning on a session (Spark's
    * InjectRuntimeFilter): when a shuffle join's small side carries a
    * selective filter, the optimizer builds a Bloom filter over its join
    * keys and pushes `might_contain` onto the BIG side's scan — rows that
    * cannot match are dropped before the shuffle. This is the
    * non-partition-column sibling of dynamic partition pruning (q220):
    * DPP prunes whole partitions via the partition key; the runtime Bloom
    * filter prunes ROWS via any join key. At 100 TB a 1%-selective dim
    * filter turns the fact shuffle from full-table to ~1% + false
    * positives.
    *
    * The thresholds default to cluster scale (application side ≥ 10 GB);
    * `applicationThresholdBytes = 0` arms it for any size — what the
    * RuntimeFilterSpec uses to plan-lock the injection on test data.
    * Session-scoped: call on `spark.newSession()` to leave other work's
    * plans untouched. */
  def enableRuntimeBloomFilters(s: org.apache.spark.sql.SparkSession,
      applicationThresholdBytes: Long = 10L << 30): Unit = {
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      applicationThresholdBytes.toString)
  }
}
