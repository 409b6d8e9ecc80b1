package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec

/** The epoch-ledger wrapper ([[Sinks.idempotent]]) — exactly-once effects
  * from at-least-once delivery for the non-transactional sinks (SQS sends,
  * vector puts): Structured Streaming re-invokes `foreachBatch` with the
  * SAME epoch id when a crash lands between the sink body and the
  * checkpoint commit; a ledgered sink makes that replay a no-op. The spec
  * drives the wrapper exactly the way the engine replays it (same id
  * twice = the post-crash re-invocation).
  */
class IdempotentSinkSpec extends SparkSpec {
  import spark.implicits._

  test("a replayed epoch is a no-op; new epochs still run; the ledger survives 'restart'") {
    val ledger = Files.createTempDirectory("graft_ledger").toString
    val calls = new AtomicInteger(0)
    val sent = scala.collection.mutable.Buffer[Long]()
    val inner: Sinks.BatchSink = (_, id) => { calls.incrementAndGet(); sent += id; () }
    val sink = Sinks.idempotent(ledger)(inner)
    val batch = Seq(1L, 2L).toDF("x")

    sink(batch, 0L)
    sink(batch, 0L) // crash-replay of epoch 0: must not re-send
    assert(calls.get() == 1 && sent.toSeq == Seq(0L),
      s"replayed epoch must be a no-op: calls=${calls.get()}, sent=$sent")

    sink(batch, 1L)
    assert(calls.get() == 2 && sent.toSeq == Seq(0L, 1L))

    // a RESTARTED query builds a fresh sink instance over the same ledger
    // dir (the ledger is filesystem state, like the checkpoint) — replays
    // of committed epochs stay no-ops across the restart
    val restarted = Sinks.idempotent(ledger)(inner)
    restarted(batch, 0L)
    restarted(batch, 1L)
    restarted(batch, 2L)
    assert(calls.get() == 3 && sent.toSeq == Seq(0L, 1L, 2L),
      s"post-restart replays must skip committed epochs: sent=$sent")
  }

  test("config-driven: the exactly-once ledger de-duplicates SQS sends across a re-run") {
    val tmp = Files.createTempDirectory("graft_ledger_cli").toString
    val (logDir, outDir, confPath) = (s"$tmp/log", s"$tmp/out", s"$tmp/conf.hocon")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(confPath),
      """keyspaces-cdc-streams.stream {
        |  source = shardlog
        |  connector {
        |    sink = "sqs"
        |    exactly-once-ledger = true
        |    partition-keys = "user_id"
        |  }
        |}""".stripMargin)
    import org.apache.spark.sql.functions._
    val events = (0 until 40).map(i => (i.toLong, (i % 7).toLong,
      s"t${i % 3}", i / 4.0, new java.sql.Timestamp(1700000000000L + i * 1000L),
      s"""{"k":${(i % 7) * 7}}"""))
      .toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    val env = graft.cdc.CdcSynth.envelope(events)
    val shard = pmod(coalesce(col("image.user_id"), col("oldImage.user_id")), lit(2L))
    graft.sources.ShardLog.record(env, logDir, shard)
    val r1 = graft.StreamMain.run(spark, confPath, logDir, outDir)
    val n1 = r1.sqs.sent.flatten.size
    assert(n1 > 0, "first run must send messages")
    // same checkpoint, no new data: nothing re-sends (and the ledger holds
    // the processed epochs should the checkpoint ever replay one)
    val r2 = graft.StreamMain.run(spark, confPath, logDir, outDir)
    assert(r2.sqs.sent.flatten.isEmpty,
      s"idle re-run must send nothing: ${r2.sqs.sent}")
    val ledgerFiles = new java.io.File(s"$outDir/_ledger/sqs").list()
    assert(ledgerFiles != null && ledgerFiles.nonEmpty,
      "the ledger must record committed epochs")
  }
}
