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
}
