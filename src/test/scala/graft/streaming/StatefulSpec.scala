package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec

class StatefulSpec extends SparkSpec {
  import spark.implicits._

  private def rec(seq: Int, op: String, userId: Long, arrivalMs: Long): TestCdc = {
    val img = if (Set("DELETE", "REPLICATED_DELETE", "TTL").contains(op)) null
    else TestImage(s"u$userId", userId.toDouble, userId.toInt)
    val old = if (op == "INSERT") null else TestImage(s"u$userId", 0.0, 0)
    TestCdc(if (op == "TTL") "TTL" else "USER",
      TestMeta("media", "movies", op, arrivalMs, f"$seq%020d"), img, old)
  }

  // envelope with a user_id-bearing image for latestImageChanges
  private case class Img(user_id: Long, v: Double)
  private case class Env(origin: String, metadata: TestMeta, image: Img, oldImage: Img)
  private def env(seq: Int, op: String, uid: Long, arrivalMs: Long = 0L): Env =
    Env("USER", TestMeta("ks", "t", op, arrivalMs, f"$seq%020d"),
      if (Set("DELETE", "TTL").contains(op)) null else Img(uid, seq.toDouble),
      if (op == "INSERT") null else Img(uid, 0.0))

  test("watermarked window aggregation drops late data and bounds state") {
    val input = MemoryStream[TestCdc](spark)
    val agg = Stateful.windowedOpCounts(input.toDF(), "10 minutes", "1 hour")
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("winagg")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    val h0 = 1700000000000L - (1700000000000L % 3600000L) // hour bucket start
    try {
      input.addData(rec(1, "INSERT", 1, h0), rec(2, "INSERT", 2, h0 + 60000))
      q.processAllAvailable()
      // advance event time far beyond watermark so the h0 window closes
      input.addData(rec(3, "INSERT", 3, h0 + 5 * 3600000L))
      q.processAllAvailable()
      input.addData(rec(4, "INSERT", 4, h0)) // late beyond watermark -> dropped
      q.processAllAvailable()
      val rows = spark.table("winagg").as[(java.sql.Timestamp, String, Long)].collect()
      val closed = rows.filter(_._1.getTime == h0)
      assert(closed.toSeq == Seq((new java.sql.Timestamp(h0), "INSERT", 2L)),
        s"expected the h0 INSERT window to close with 2 rows (late row dropped), got ${rows.toSeq}")
    } finally q.stop()
  }

  test("session windows merge within the gap, split across it, close at the watermark") {
    val input = MemoryStream[Env](spark)
    val sc = Stateful.sessionCounts(input.toDF(),
      gap = "10 minutes", watermarkDelay = "5 minutes")
    val q = sc.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sessions")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    val t0 = 1700000000000L
    try {
      // user 10: two events 4 min apart (one session); user 20: one event
      input.addData(env(1, "INSERT", 10, t0), env(2, "INSERT", 10, t0 + 240000),
        env(3, "INSERT", 20, t0))
      q.processAllAvailable()
      // a far event advances the watermark past the open sessions' ends
      input.addData(env(4, "INSERT", 10, t0 + 7200000L))
      q.processAllAvailable()
      // and one further still closes THAT session too
      input.addData(env(5, "INSERT", 99, t0 + 36000000L))
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .as[(java.sql.Timestamp, java.sql.Timestamp, Long, Long)].collect()
        .map(r => (r._1.getTime, r._2.getTime, r._3, r._4)).toSeq.sorted
      val gap = 600000L
      assert(rows == Seq(
        (t0, t0 + 240000 + gap, 10L, 2L),            // merged 2-event session
        (t0, t0 + gap, 20L, 1L),                     // single-event session
        (t0 + 7200000L, t0 + 7200000L + gap, 10L, 1L) // split: new session after the gap
      ).sorted, s"unexpected closed sessions: $rows")
    } finally q.stop()
  }

  test("latest-image state machine emits upserts and deletes per key") {
    val input = MemoryStream[Env](spark)
    val changes = Stateful.latestImageChanges(input.toDF())
    val q = changes.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("mvstate")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      input.addData(env(1, "INSERT", 10), env(2, "UPDATE", 10), env(3, "INSERT", 20))
      q.processAllAvailable()
      input.addData(env(4, "DELETE", 20), env(5, "UPDATE", 10))
      q.processAllAvailable()
      input.addData(env(1, "INSERT", 10)) // stale replay: older seq -> ignored
      q.processAllAvailable()
      val out = spark.table("mvstate").as[Stateful.Change].collect()
        .map(c => (c.key, c.op, c.seq.toLong.toInt)).toSeq.sorted
      assert(out == Seq(("10", "UPSERT", 2), ("10", "UPSERT", 5),
        ("20", "DELETE", 4), ("20", "UPSERT", 3)))
    } finally q.stop()
  }

  test("running corpus report accumulates across batches and matches the batch recompute") {
    val input = MemoryStream[(Long, String, String)](spark)
    val docs = input.toDF().toDF("doc_id", "text", "source")
    val q = Stateful.runningCorpusReport(docs)
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("corpusreport").start()
    try {
      input.addData(
        (1L, "the quick brown fox jumps over the lazy dog", "a"),
        (2L, "a b", "a"),
        (3L, "one two three four five", "b"))
      q.processAllAvailable()
      input.addData(
        (4L, "more content for source a arriving in a later batch", "a"),
        (5L, "six seven eight", "b"))
      q.processAllAvailable()
      val rows = spark.table("corpusreport").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      assert(rows("a")._1 == 3L && rows("b")._1 == 2L, s"doc counts: $rows")
      assert(rows("a")._2 == 21L, s"source a tokens 9+2+10: $rows")
      assert(rows("b")._2 == 8L, s"source b tokens 5+3: $rows")
      // the streaming accumulation must agree with a one-shot batch compute
      // over the union of both batches (the audit invariant)
      import spark.implicits._
      val batch = Stateful.runningCorpusReport(Seq(
        (1L, "the quick brown fox jumps over the lazy dog", "a"),
        (2L, "a b", "a"),
        (3L, "one two three four five", "b"),
        (4L, "more content for source a arriving in a later batch", "a"),
        (5L, "six seven eight", "b")).toDF("doc_id", "text", "source"))
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
      rows.foreach { case (src, (_, _, avgQ)) =>
        assert(avgQ == batch(src), s"streaming vs batch avg_quality for $src")
      }
    } finally q.stop()
  }

  test("streaming count-min cells equal the batch sketch over the same documents") {
    val input = MemoryStream[(Long, String)](spark)
    val docs = input.toDF().toDF("doc_id", "text")
    val q = Stateful.runningCmsCells(docs)
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("cmscells").start()
    try {
      input.addData((1L, "alpha beta gamma alpha"), (2L, "beta delta"))
      q.processAllAvailable()
      input.addData((3L, "gamma gamma epsilon alpha"))
      q.processAllAvailable()
      val streamed = spark.table("cmscells").collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      import spark.implicits._
      val batch = Stateful.runningCmsCells(Seq(
        (1L, "alpha beta gamma alpha"), (2L, "beta delta"),
        (3L, "gamma gamma epsilon alpha")).toDF("doc_id", "text"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed === batch,
        "the additive sketch must make stream state == batch grid bitwise")
      // grid state is depth x width bounded regardless of vocabulary
      assert(streamed.size <= graft.ops.TextOpsImpl.CmsDepth * graft.ops.TextOpsImpl.CmsWidth)
      // mass check: every token lands in exactly one cell per hash row
      assert(streamed.values.sum === 40L, "4 hash rows x 10 tokens")
    } finally q.stop()
  }
}
