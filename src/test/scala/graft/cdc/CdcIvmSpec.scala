package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.ops.Det

/** The IVM contract behind q161: on a CONSISTENT CDC history (every
  * UPDATE's old image equals the previous new image, every key starts
  * with INSERT), the delta-maintained aggregate view must equal a full
  * recompute over the replayed final state — the invariant that lets a
  * 100 TB deployment update its grouped views from the log without ever
  * re-reading the base table. Also proves the STREAMING form: the live
  * view after several micro-batches equals the batch backfill.
  */
/** Envelope fixture row (top-level: Spark encoders cannot instantiate
  * inner case classes). */
final case class IvmE(key: Long, op: String, seq: String,
    gNew: Option[String], vNew: Option[Double],
    gOld: Option[String], vOld: Option[Double])

class CdcIvmSpec extends SparkSpec {
  import spark.implicits._

  /** 30 keys: INSERT, (k % 3) chained UPDATEs (group may move), every 4th
    * key DELETEd at the end — a consistent per-key history. */
  private def history: Seq[IvmE] = (0L until 30L).flatMap { k =>
    val groups = Seq("a", "b", "c")
    def g(i: Int) = groups(((k + i) % 3).toInt)
    def v(i: Int) = k * 1.0 + i * 0.25
    val nUpd = (k % 3).toInt
    val ins = IvmE(k, "INSERT", "00000", Some(g(0)), Some(v(0)), None, None)
    val upds = (1 to nUpd).map(i =>
      IvmE(k, "UPDATE", f"$i%05d", Some(g(i)), Some(v(i)), Some(g(i - 1)), Some(v(i - 1))))
    val del = if (k % 4 == 0)
      Seq(IvmE(k, "DELETE", f"${nUpd + 1}%05d", None, None, Some(g(nUpd)), Some(v(nUpd))))
    else Nil
    Seq(ins) ++ upds ++ del
  }

  private def toEnvelope(df: DataFrame): DataFrame =
    df.select(
      col("key"), col("seq"),
      struct(col("op").as("stream_operation_type")).as("metadata"),
      when(col("gNew").isNotNull,
        struct(col("gNew").as("event_type"), col("vNew").as("value"))).as("image"),
      when(col("gOld").isNotNull,
        struct(col("gOld").as("event_type"), col("vOld").as("value"))).as("oldImage"))

  private def maintained(env: DataFrame): DataFrame =
    Cdc.aggDeltas(env, _.getField("event_type"), _.getField("value"))
      .groupBy(col("g"))
      .agg(sum(col("dcount")).as("n_live"), Det.dsum(col("dvalue")).as("sum_value"))

  test("delta-maintained view equals a full recompute over the replayed state") {
    val env = toEnvelope(history.toDF())
    val got = maintained(env)
      .as[(String, Long, Double)].collect().toSeq.sortBy(_._1)
    val state = Cdc.replayLatest(env, col("key"), col("seq"))
      .select(col("last.image.event_type").as("g"), col("last.image.value").as("v"))
    val expected = state.groupBy(col("g"))
      .agg(count(lit(1)).as("n_live"), Det.dsum(col("v")).as("sum_value"))
      .as[(String, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got == expected,
      s"IVM invariant: deltas must reproduce the recomputed view\n$got\nvs\n$expected")
    // sanity: deletes really removed mass (7 of 8 deleted keys existed)
    assert(got.map(_._2).sum == 30L - 8L)
  }

  test("a present image with a NULL group keeps its delta (NULL-group view row)") {
    // image presence keyed on the VALUE field so the group can be NULL on
    // a present image — the case the old `g IS NOT NULL` filter dropped,
    // diverging the maintained view from a full recompute.
    val rows = Seq(
      IvmE(1L, "INSERT", "00000", None, Some(2.0), None, None), // NULL group
      IvmE(2L, "INSERT", "00000", Some("a"), Some(3.0), None, None),
      IvmE(2L, "UPDATE", "00001", None, Some(4.0), Some("a"), Some(3.0)))
    val env = rows.toDF().select(
      col("key"), col("seq"),
      struct(col("op").as("stream_operation_type")).as("metadata"),
      when(col("vNew").isNotNull,
        struct(col("gNew").as("event_type"), col("vNew").as("value"))).as("image"),
      when(col("vOld").isNotNull,
        struct(col("gOld").as("event_type"), col("vOld").as("value"))).as("oldImage"))
    val full = maintained(env)
      .as[(Option[String], Long, Double)].collect().toSeq.sortBy(_._1)
    // a vacated group legitimately stays as a zero-mass row until the view
    // compacts it; the recompute-equality contract is on live rows
    val got = full.filter(_._2 != 0L)
    val state = Cdc.replayLatest(env, col("key"), col("seq"))
      .select(col("last.image.event_type").as("g"), col("last.image.value").as("v"))
    val expected = state.groupBy(col("g"))
      .agg(count(lit(1)).as("n_live"), Det.dsum(col("v")).as("sum_value"))
      .as[(Option[String], Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got == expected,
      s"NULL-group deltas must survive to the maintained view\n$got\nvs\n$expected")
    assert(got.exists(_._1.isEmpty), "the NULL group must appear in the view")
    // the moved key (a → NULL) must have left group a empty, not lingering
    assert(!full.exists(r => r._1.contains("a") && r._2 != 0L))
  }

  test("streaming live view over micro-batches equals the batch backfill") {
    val all = history
    val batches = all.grouped((all.size + 2) / 3).toSeq
    val input = MemoryStream[IvmE](spark)
    val live = maintained(toEnvelope(input.toDF()))
    val q = live.writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("ivm_live").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val got = spark.table("ivm_live")
        .as[(String, Long, Double)].collect().toSeq.sortBy(_._1)
      val expected = maintained(toEnvelope(all.toDF()))
        .as[(String, Long, Double)].collect().toSeq.sortBy(_._1)
      assert(got == expected, "live view must equal the batch backfill bitwise")
    } finally q.stop()
  }
}
