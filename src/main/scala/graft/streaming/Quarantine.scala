package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DEAD-LETTER QUARANTINE: per-record expectations over the stream, with
  * failing records ROUTED instead of dropped — the streaming form of the
  * q224 commit-time expectation suite (Delta Live Tables'
  * `expect_or_drop` + quarantine pattern). The reference's answer to bad
  * records is log-and-skip (KeyspacesRecordProcessor catches per-record
  * conversion failures and continues); routing keeps the skip behavior
  * but preserves the records and WHY they failed, so a pipeline owner can
  * replay them after a rule fix instead of re-consuming the stream.
  *
  * Each quarantined row carries `failed_rules` (every rule it broke — one
  * pass computes all rules; a NULL predicate is a failure, the fail-closed
  * F3 discipline). The dead letters land under `epoch=N` dirs written
  * with OVERWRITE, so a replayed micro-batch rewrites its own epoch
  * identically instead of duplicating (idempotent, like the lakehouse
  * sinks' markers — no ledger needed because the write itself is keyed by
  * epoch).
  *
  * Scale shape: the split is two narrow filters over the micro-batch (no
  * shuffle, no extra scan of anything but the batch); dead-letter volume
  * is failure-proportional.
  */
object Quarantine {

  /** Split a batch by the rule set: (passing rows, failing rows +
    * `failed_rules`). */
  def split(batch: DataFrame, rules: Seq[(String, Column)])
      : (DataFrame, DataFrame) = {
    val failed = array_compact(array(rules.map { case (n, p) =>
      when(!coalesce(p, lit(false)), lit(n)).otherwise(lit(null))
    }: _*))
    val flagged = batch.withColumn("__failed_rules", failed)
    (flagged.filter(size(col("__failed_rules")) === 0).drop("__failed_rules"),
      flagged.filter(size(col("__failed_rules")) > 0)
        .withColumnRenamed("__failed_rules", "failed_rules"))
  }

  /** Wrap a sink: passing rows flow through, failing rows land as parquet
    * dead letters under `deadLetterDir/epoch=N`. */
  def sink(deadLetterDir: String, rules: Seq[(String, Column)])
      (inner: Sinks.BatchSink): Sinks.BatchSink = (batch, id) => {
    val (ok, bad) = split(batch, rules)
    bad.write.mode("overwrite").parquet(s"$deadLetterDir/epoch=$id")
    inner(ok, id)
  }
}
