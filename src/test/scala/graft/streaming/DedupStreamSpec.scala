package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming dedup drops replayed sequence numbers within the watermark") {
    val input = MemoryStream[TestCdc](spark)
    val deduped = Stateful.dedupBySequence(input.toDF(), "1 hour")
    val q = deduped.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedupstream").start()
    def rec(seq: Int, t: Long) = TestCdc("USER",
      TestMeta("ks", "t", "INSERT", t, f"$seq%020d"), TestImage(s"r$seq", 1.0, seq), null)
    try {
      val t0 = 1700000000000L
      input.addData(rec(1, t0), rec(2, t0 + 1000), rec(1, t0 + 2000)) // in-batch replay
      q.processAllAvailable()
      input.addData(rec(2, t0 + 3000), rec(3, t0 + 4000)) // cross-batch replay
      q.processAllAvailable()
      val seqs = spark.table("dedupstream")
        .select($"metadata.stream_sequence_number").as[String]
        .collect().map(_.toLong.toInt).toSeq.sorted
      assert(seqs == Seq(1, 2, 3))
    } finally q.stop()
  }

  test("message id scheme: seq range, epoch suffix only on the final message") {
    assert(Packing.messageId("001", "007", isFinal = false) == "001-007")
    assert(Packing.messageId("008", "009", isFinal = true, clock = () => 1234L) == "008-009-1234")
  }

  test("embed UDF registered by install() is deterministic with configured dims") {
    graft.GraftExtensions.install(spark)
    val r = spark.sql("SELECT embed('hello', 8) AS e, embed('hello', 8) AS e2").head()
    assert(r.getSeq[Float](0).length == 8)
    assert(r.getSeq[Float](0) == r.getSeq[Float](1))
  }
}
