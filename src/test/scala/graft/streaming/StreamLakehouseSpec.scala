package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.CdcSynth
import graft.ops.LakehouseOpsImpl

/** Fixture row in the events schema (top-level for Spark encoders). */
final case class LkEvent(event_id: Long, user_id: Long, event_type: String,
    value: Double, ts: Timestamp, props: String)

/** The streaming-lakehouse contract: CDC envelopes drained through
  * [[LakehouseSink.cowSink]] over several micro-batches — with a
  * kill/restart from checkpoint in the middle and an idle no-op re-run at
  * the end — must leave the bucketed parquet table row-equal to the
  * one-shot MERGE replay of the full envelope log (the q179 algebra).
  */
class StreamLakehouseSpec extends SparkSpec {
  import spark.implicits._

  private val NB = 8

  /** event_id % 8 drives the op type (CdcSynth): the id range 0..n mixes
    * INSERTs, UPDATEs, DELETEs, replicated ops, TTL and UNKNOWN, and
    * user_id = id % 17 makes later events update/delete earlier keys. */
  private def events(ids: Seq[Int]): Seq[LkEvent] = ids.map { i =>
    LkEvent(i.toLong, (i % 17).toLong, s"t${i % 3}", i / 4.0,
      new Timestamp(1700000000000L + i * 1000L), s"""{"k":${(i % 17) * 7}}""")
  }

  private def emptyBase: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      LakehouseOpsImpl.tableSchema)

  /** One-shot ground truth: MERGE the whole log into an empty table. */
  private def expected(rows: Seq[LkEvent]): Seq[(Long, String, String, String, Double, Long)] =
    LakehouseOpsImpl.mergeLatest(emptyBase,
      LakehouseOpsImpl.latestUpdates(CdcSynth.envelope(rows.toDF()),
        coalesce(col("image.user_id"), col("oldImage.user_id")),
        col("metadata.stream_sequence_number")))
      .select(col("user_id"), col("last_op"), col("last_seq"),
        col("event_type"), col("value"), col("k"))
      .as[(Long, String, String, String, Double, Long)].collect().toSeq.sorted

  private def table(path: String): Seq[(Long, String, String, String, Double, Long)] =
    spark.read.parquet(path)
      .select(col("user_id"), col("last_op"), col("last_seq"),
        col("event_type"), col("value"), col("k"))
      .as[(Long, String, String, String, Double, Long)].collect().toSeq.sorted

  test("streamed COW merges equal the one-shot replay, survive restart, idle re-run is a no-op") {
    val all = events(0 until 170)
    val batches = Seq(all.slice(0, 60), all.slice(60, 110), all.slice(110, 170))
    val tableDir = Files.createTempDirectory("graft_slake").toString
    val ckptDir = Files.createTempDirectory("graft_slake_ckpt").toString

    def drain(input: MemoryStream[LkEvent]): Unit =
      LakehouseSink.cowSink(CdcSynth.envelope(input.toDF()),
        tableDir, ckptDir, NB).awaitTermination()

    // micro-batch 1 bootstraps the table, then the query STOPS (kill)
    val input = MemoryStream[LkEvent](spark)
    input.addData(batches(0): _*)
    drain(input)
    assert(table(tableDir) == expected(batches(0)),
      "mid-stream table must equal the replay of the envelopes seen so far")

    // cold restart from the SAME checkpoint: remaining batches drain
    input.addData(batches(1): _*)
    input.addData(batches(2): _*)
    drain(input)
    val end = table(tableDir)
    assert(end == expected(all),
      "restarted stream must converge to the one-shot full-log replay")

    // an idle re-run merges nothing and changes nothing (exactly-once state)
    drain(input)
    assert(table(tableDir) == end, "idle re-run must be a no-op")

    // the table really is bucketed (the COW layout, not a flat dump)
    val bucketDirs = new java.io.File(tableDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket=")).map(_.getName)
    assert(bucketDirs.length > 1, s"expected multiple bucket dirs: ${bucketDirs.toSeq}")
  }

  test("config-driven lakehouse sink: COW table state equals the MV sink's, restart included") {
    val tmp = Files.createTempDirectory("graft_lake_cli").toString
    val (logDir, outDir, confPath) = (s"$tmp/log", s"$tmp/out", s"$tmp/conf.hocon")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(confPath),
      """keyspaces-cdc-streams.stream {
        |  source = shardlog
        |  connector {
        |    sink = "lakehouse,mv"
        |    record-format = full
        |    fields-to-include = "user_id,event_type,value,k"
        |    partition-keys = "user_id"
        |    lakehouse-buckets = 8
        |  }
        |}""".stripMargin)
    // the MV sink rejects op UNKNOWN (id % 8 == 7), as the reference does
    val env = CdcSynth.envelope(
      events((0 until 160).filter(_ % 8 != 7).take(120)).toDF())
    val shard = pmod(coalesce(col("image.user_id"), col("oldImage.user_id")), lit(4L))

    def tableState(): Map[Long, Double] =
      spark.read.parquet(s"$outDir/table")
        .select(col("user_id"), col("value"))
        .as[(Long, Double)].collect().toMap
    def mvState(r: graft.StreamMain.RunResult): Map[Long, Double] =
      r.mv.data.map { case (k, v) =>
        k.head.asInstanceOf[Long] -> v("value").asInstanceOf[Double] }.toMap

    graft.sources.ShardLog.record(env.filter(col("event_id") < 60), logDir, shard)
    val r1 = graft.StreamMain.run(spark, confPath, logDir, outDir)
    assert(tableState() == mvState(r1) && tableState().nonEmpty,
      "lakehouse table must carry the same latest-wins state as the MV sink")

    // more records land; a fresh run resumes from the checkpoint and the
    // table converges to the full-log replay (the fresh run's MV table
    // only sees the delta, so it must agree on every key it holds)
    graft.sources.ShardLog.record(env, logDir, shard)
    val r2 = graft.StreamMain.run(spark, confPath, logDir, outDir)
    val full = expected(events((0 until 160).filter(_ % 8 != 7).take(120)))
      .map(t => t._1 -> t._5).toMap
    assert(tableState() == full,
      "after restart + catch-up the table must equal the full-log replay")
    mvState(r2).foreach { case (k, v) =>
      assert(tableState()(k) == v, s"delta-run MV and table must agree on $k")
    }
  }

  test("versioned sink leaves a time-travelable history; replay appends no version") {
    import graft.ops.VersionedTableImpl
    val all = events(0 until 170)
    val batches = Seq(all.slice(0, 60), all.slice(60, 110), all.slice(110, 170))
    val root = Files.createTempDirectory("graft_slake_v").toString
    val ckptDir = Files.createTempDirectory("graft_slake_v_ckpt").toString

    def drain(input: MemoryStream[LkEvent]): Unit =
      LakehouseSink.versionedSink(CdcSynth.envelope(input.toDF()),
        root, ckptDir, NB).awaitTermination()

    val input = MemoryStream[LkEvent](spark)
    input.addData(batches(0): _*)
    drain(input)
    val v1 = VersionedTableImpl.currentVersion(spark, root)
    assert(v1 == 1, s"first drain commits one version: $v1")

    input.addData(batches(1): _*)
    input.addData(batches(2): _*)
    drain(input) // restart from checkpoint: both batches drain (one commit each
                 // or one combined — AvailableNow decides; history only grows)
    val vEnd = VersionedTableImpl.currentVersion(spark, root)
    assert(vEnd > v1, s"later drains append versions: $vEnd")

    // final state equals the one-shot replay; v1 is still the old state
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("user_id"), col("last_op"), col("last_seq"),
        col("event_type"), col("value"), col("k"))
        .as[(Long, String, String, String, Double, Long)].collect().toSeq.sorted
    assert(rows(VersionedTableImpl.readVersion(spark, root, vEnd)) == expected(all))
    assert(rows(VersionedTableImpl.readVersion(spark, root, 1)) ==
      expected(batches(0)), "history is immutable under later streamed commits")

    // idle re-run: no new version (batch markers make history exactly-once)
    drain(input)
    assert(VersionedTableImpl.currentVersion(spark, root) == vEnd,
      "an idle drain must not append versions")

    // the stream's own change feed: v1 -> vEnd classifies the tail's effect
    val feed = VersionedTableImpl.changeFeed(spark, root, 1, vEnd)
    assert(feed.filter(col("change_op") === "UPDATE").count() > 0)
  }

  test("versioned sink over a conditional-create table: stream == replay under pointer commits") {
    import graft.ops.VersionedTableImpl
    val all = events(0 until 120)
    val batches = Seq(all.slice(0, 60), all.slice(60, 120))
    val root = Files.createTempDirectory("graft_slake_ptr").toString
    val ckptDir = Files.createTempDirectory("graft_slake_ptr_ckpt").toString
    VersionedTableImpl.setConditionalCommit(spark, root) // object-store layout

    def drain(input: MemoryStream[LkEvent]): Unit =
      LakehouseSink.versionedSink(CdcSynth.envelope(input.toDF()),
        root, ckptDir, NB).awaitTermination()

    val input = MemoryStream[LkEvent](spark)
    input.addData(batches(0): _*)
    drain(input)
    input.addData(batches(1): _*)
    drain(input) // restart from checkpoint
    val vEnd = VersionedTableImpl.currentVersion(spark, root)
    assert(vEnd >= 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("user_id"), col("last_op"), col("last_seq"),
        col("event_type"), col("value"), col("k"))
        .as[(Long, String, String, String, Double, Long)].collect().toSeq.sorted
    assert(rows(VersionedTableImpl.readVersion(spark, root, vEnd)) == expected(all),
      "pointer-mode streamed commits must equal the one-shot replay")
    assert(rows(VersionedTableImpl.readVersion(spark, root, 1)) ==
      expected(batches(0)), "pointer-mode history stays immutable")
    // every commit point really was a pointer PUT: no visible manifest DIRS
    val vdir = new java.io.File(s"$root/_versions")
    val names = vdir.listFiles().map(_.getName).toSeq
    assert(names.count(_.endsWith(".parquet.ptr")) == vEnd,
      s"one pointer per version expected: $names")
    assert(!names.exists(n => n.matches("v\\d+\\.parquet")),
      s"no rename-mode manifest dir may exist: $names")
    // the feed machinery reads through pointers too
    assert(VersionedTableImpl.changeFeed(spark, root, 1, vEnd).count() > 0)
    // idle drain appends nothing (markers + pointer layout compose)
    drain(input)
    assert(VersionedTableImpl.currentVersion(spark, root) == vEnd)
  }

  test("MOR sink: delta-only epochs converge, history survives restart, compaction bounds files") {
    import graft.ops.MorTableImpl
    val all = events(0 until 170)
    val batches = Seq(all.slice(0, 60), all.slice(60, 110), all.slice(110, 170))
    val root = Files.createTempDirectory("graft_slake_mor").toString
    val ckptDir = Files.createTempDirectory("graft_slake_mor_ckpt").toString
    val threshold = 2

    def drain(input: MemoryStream[LkEvent]): Unit =
      LakehouseSink.morSink(CdcSynth.envelope(input.toDF()),
        root, ckptDir, NB, compactOver = Some(threshold)).awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("user_id"), col("last_op"), col("last_seq"),
        col("event_type"), col("value"), col("k"))
        .as[(Long, String, String, String, Double, Long)].collect().toSeq.sorted

    val input = MemoryStream[LkEvent](spark)
    input.addData(batches(0): _*)
    drain(input)
    val v1 = graft.ops.VersionedTableImpl.currentVersion(spark, root)
    assert(v1 == 1, s"first drain commits one delta version: $v1")
    assert(rows(MorTableImpl.readMor(spark, root, 1)) == expected(batches(0)))

    // cold restart from the same checkpoint: the rest drains as deltas
    input.addData(batches(1): _*)
    input.addData(batches(2): _*)
    drain(input)
    val vEnd = graft.ops.VersionedTableImpl.currentVersion(spark, root)
    assert(vEnd > v1)
    assert(rows(MorTableImpl.readMor(spark, root, vEnd)) == expected(all),
      "restarted MOR stream must converge to the one-shot replay")
    assert(rows(MorTableImpl.readMor(spark, root, 1)) == expected(batches(0)),
      "delta commits and compaction must not rewrite history")

    // the maintenance hook kept every bucket at or under the threshold
    val counts = MorTableImpl.bucketFileCounts(spark, root, vEnd)
    assert(counts.values.forall(_ <= threshold),
      s"compaction must bound per-bucket file counts at $threshold: $counts")

    // idle re-run: no rows, no version (batch markers + metadata-only check)
    drain(input)
    assert(graft.ops.VersionedTableImpl.currentVersion(spark, root) == vEnd,
      "an idle drain must not append versions")
    assert(rows(MorTableImpl.readMor(spark, root, vEnd)) == expected(all))
  }

  test("change data files: per-commit feeds match the batch diff and stream back exactly-once") {
    import graft.ops.VersionedTableImpl
    val all = events(0 until 150)
    val batches = Seq(all.slice(0, 60), all.slice(60, 100), all.slice(100, 150))
    val root = Files.createTempDirectory("graft_slake_f").toString
    val ckptDir = Files.createTempDirectory("graft_slake_f_ckpt").toString

    def drain(input: MemoryStream[LkEvent]): Unit =
      LakehouseSink.versionedSink(CdcSynth.envelope(input.toDF()),
        root, ckptDir, NB).awaitTermination()

    val input = MemoryStream[LkEvent](spark)
    batches.foreach { b => input.addData(b: _*); drain(input) }
    val vEnd = VersionedTableImpl.currentVersion(spark, root)
    assert(vEnd >= 3)

    // every merge version emitted change data files equal to the diff of
    // its own two states (the _feed files ARE the changeFeed, per version)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("user_id"), col("change_op"),
        col("seq_before"), col("seq_after"))
        .as[(Long, String, Option[String], Option[String])].collect().toSeq.sorted
    (1 to vEnd).foreach { v =>
      val stored = spark.read.parquet(s"$root/_feed/v$v.parquet")
      assert(stored.select(col("version")).distinct().as[Long].collect().toSeq == Seq(v.toLong))
      assert(rows(stored) == rows(VersionedTableImpl.changeFeed(spark, root, v - 1, v)),
        s"stored feed v$v must equal the recomputed diff")
    }

    // a downstream consumer streams the history with a PLAIN parquet
    // readStream over _feed — standard file source, checkpointed
    val feedSchema = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$root/_feed").schema
    val streamed = spark.readStream.schema(feedSchema)
      .option("recursiveFileLookup", "true").parquet(s"$root/_feed")
    val got = scala.collection.mutable.Buffer[(Long, String, Option[String], Option[String])]()
    val query = streamed.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= rows(b); () }
      .start()
    query.awaitTermination()
    val batchAll = rows(spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$root/_feed"))
    assert(got.toSeq.sorted == batchAll,
      "the streamed feed must carry exactly the change data files' rows")
  }

  test("CDC loop closes: a stream over the change data files maintains state equal to the table") {
    import graft.ops.VersionedTableImpl
    val all = events(0 until 140)
    val batches = Seq(all.slice(0, 50), all.slice(50, 95), all.slice(95, 140))
    val root = Files.createTempDirectory("graft_slake_loop").toString
    val ckptDir = Files.createTempDirectory("graft_slake_loop_ckpt").toString
    val input = MemoryStream[LkEvent](spark)
    batches.foreach { b =>
      input.addData(b: _*)
      LakehouseSink.versionedSink(CdcSynth.envelope(input.toDF()),
        root, ckptDir, NB).awaitTermination()
    }
    val vEnd = VersionedTableImpl.currentVersion(spark, root)

    // downstream consumer: plain parquet readStream over _feed, folding
    // each micro-batch into a keyed state store (last-writer-wins by feed
    // version — the q209 algebra, applied incrementally)
    val state = scala.collection.mutable.Map[Long, (Long, String, Option[Double])]()
    val feedSchema = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$root/_feed").schema
    val q = spark.readStream.schema(feedSchema)
      .option("recursiveFileLookup", "true").parquet(s"$root/_feed")
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select(col("user_id"), col("version"), col("change_op"),
            col("value_after")).collect() // test-scale fold; prod = MERGE
          .sortBy(r => r.getLong(1))
          .foreach { r =>
            val (k, v, op) = (r.getLong(0), r.getLong(1), r.getString(2))
            if (state.get(k).forall(_._1 <= v))
              if (op == "DELETE") state.remove(k)
              else state(k) = (v, op, if (r.isNullAt(3)) None else Some(r.getDouble(3)))
          }
        ()
      }.start()
    q.awaitTermination()

    val table = VersionedTableImpl.readVersion(spark, root, vEnd)
      .select(col("user_id"), col("value")).as[(Long, Option[Double])]
      .collect().toMap
    assert(state.keySet == table.keySet,
      s"streamed state keys must equal the table's: ${state.keySet} vs ${table.keySet}")
    state.foreach { case (k, (_, _, v)) =>
      assert(v == table(k), s"streamed value for $k must match the table")
    }
  }

  test("config-driven versioned sink: history-keeping table, exactly-once versions across re-runs") {
    import graft.ops.VersionedTableImpl
    val tmp = Files.createTempDirectory("graft_vlake_cli").toString
    val (logDir, outDir, confPath) = (s"$tmp/log", s"$tmp/out", s"$tmp/conf.hocon")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(confPath),
      """keyspaces-cdc-streams.stream {
        |  source = shardlog
        |  connector {
        |    sink = "lakehouse-versioned"
        |    record-format = full
        |    fields-to-include = "user_id,event_type,value,k"
        |    partition-keys = "user_id"
        |    lakehouse-buckets = 8
        |    compact-over-files = 4
        |  }
        |}""".stripMargin)
    val rows = events(0 until 120)
    val env = CdcSynth.envelope(rows.toDF())
    val shard = pmod(coalesce(col("image.user_id"), col("oldImage.user_id")), lit(4L))
    val root = s"$outDir/vtable"

    graft.sources.ShardLog.record(env.filter(col("event_id") < 60), logDir, shard)
    graft.StreamMain.run(spark, confPath, logDir, outDir)
    val v1 = VersionedTableImpl.currentVersion(spark, root)
    assert(v1 >= 1, s"first run commits: $v1")

    graft.sources.ShardLog.record(env, logDir, shard)
    graft.StreamMain.run(spark, confPath, logDir, outDir)
    val vEnd = VersionedTableImpl.currentVersion(spark, root)
    assert(vEnd > v1, "the catch-up run appends versions")
    def state(v: Int) = VersionedTableImpl.readVersion(spark, root, v)
      .select(col("user_id"), col("last_op"), col("last_seq"),
        col("event_type"), col("value"), col("k"))
      .as[(Long, String, String, String, Double, Long)].collect().toSeq.sorted
    assert(state(vEnd) == expected(rows),
      "the current version must equal the one-shot replay")

    // idle re-run: no new versions (markers + below-threshold compaction)
    graft.StreamMain.run(spark, confPath, logDir, outDir)
    assert(VersionedTableImpl.currentVersion(spark, root) == vEnd,
      "an idle re-run must append no versions")

    // GROWTH: a config rollout adds rebucket-to = 16; the next (idle)
    // drain re-lays the table once, state intact, and writers keep their
    // stale lakehouse-buckets = 8 parameter on later drains
    java.nio.file.Files.writeString(java.nio.file.Paths.get(confPath),
      """keyspaces-cdc-streams.stream {
        |  source = shardlog
        |  connector {
        |    sink = "lakehouse-versioned"
        |    record-format = full
        |    fields-to-include = "user_id,event_type,value,k"
        |    partition-keys = "user_id"
        |    lakehouse-buckets = 8
        |    compact-over-files = 4
        |    rebucket-to = 16
        |  }
        |}""".stripMargin)
    graft.StreamMain.run(spark, confPath, logDir, outDir)
    assert(VersionedTableImpl.tableBuckets(spark, root, 0) == 16,
      "the drain-end maintenance re-laid the table over 16 buckets")
    assert(state(VersionedTableImpl.currentVersion(spark, root)) == expected(rows),
      "rebucket is layout-only through the config surface")
    val vReb = VersionedTableImpl.currentVersion(spark, root)
    // a further idle drain: tableBuckets already 16 -> no new version
    graft.StreamMain.run(spark, confPath, logDir, outDir)
    assert(VersionedTableImpl.currentVersion(spark, root) == vReb,
      "rebucket fires once; later drains no-op")
  }

  test("config-driven sweep-stranded-hours reclaims aged crashed-writer garbage; fresh staging survives") {
    import graft.ops.VersionedTableImpl
    val tmp = Files.createTempDirectory("graft_vlake_sweep").toString
    val (logDir, outDir, confPath) = (s"$tmp/log", s"$tmp/out", s"$tmp/conf.hocon")
    def writeConf(extra: String): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(confPath),
        s"""keyspaces-cdc-streams.stream {
           |  source = shardlog
           |  connector {
           |    sink = "lakehouse-versioned"
           |    record-format = full
           |    fields-to-include = "user_id,event_type,value,k"
           |    partition-keys = "user_id"
           |    lakehouse-buckets = 8
           |$extra
           |  }
           |}""".stripMargin)
    writeConf("")
    val rows = events(0 until 40)
    val env = CdcSynth.envelope(rows.toDF())
    val shard = pmod(coalesce(col("image.user_id"), col("oldImage.user_id")), lit(4L))
    graft.sources.ShardLog.record(env, logDir, shard)
    graft.StreamMain.run(spark, confPath, logDir, outDir)
    val root = s"$outDir/vtable"
    val vEnd = VersionedTableImpl.currentVersion(spark, root)
    assert(vEnd >= 1)
    val before = VersionedTableImpl.readVersion(spark, root, vEnd).count()

    // plant crashed-writer garbage (a dead drain's staging + a mid-commit
    // descriptor), aged past the configured threshold — and a FRESH
    // staging dir that must survive (a racing writer mid-commit)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val aged = new org.apache.hadoop.fs.Path(root, ".v_staging_crashed")
    fs.mkdirs(aged)
    fs.create(new org.apache.hadoop.fs.Path(aged, "part-0.parquet"), true).close()
    val agedTmp = new org.apache.hadoop.fs.Path(root, "_versions/.tmp-crashed.parquet")
    fs.create(agedTmp, true).close()
    val past = System.currentTimeMillis() - 2L * 3600 * 1000
    Seq(new org.apache.hadoop.fs.Path(aged, "part-0.parquet"), aged, agedTmp)
      .foreach(p => fs.setTimes(p, past, past))
    val fresh = new org.apache.hadoop.fs.Path(root, ".mor_staging_live")
    fs.mkdirs(fresh)

    // config rollout: sweep-stranded-hours = 1; the idle drain's
    // maintenance reclaims exactly the aged garbage
    writeConf("    sweep-stranded-hours = 1")
    graft.StreamMain.run(spark, confPath, logDir, outDir)
    assert(!fs.exists(aged), "aged crashed staging must be reclaimed")
    assert(!fs.exists(agedTmp), "aged mid-commit descriptor must be reclaimed")
    assert(fs.exists(fresh), "fresh (possibly live) staging must survive")
    assert(VersionedTableImpl.currentVersion(spark, root) == vEnd &&
      VersionedTableImpl.readVersion(spark, root, vEnd).count() == before,
      "the sweep is garbage-only: table state untouched")
  }

  test("config-driven MOR sink: delta commits through the connector surface") {
    import graft.ops.{MorTableImpl, VersionedTableImpl}
    val tmp = Files.createTempDirectory("graft_mor_cli").toString
    val (logDir, outDir, confPath) = (s"$tmp/log", s"$tmp/out", s"$tmp/conf.hocon")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(confPath),
      """keyspaces-cdc-streams.stream {
        |  source = shardlog
        |  connector {
        |    sink = "lakehouse-mor"
        |    record-format = full
        |    fields-to-include = "user_id,event_type,value,k"
        |    partition-keys = "user_id"
        |    lakehouse-buckets = 8
        |    compact-over-files = 2
        |  }
        |}""".stripMargin)
    val rows = events(0 until 120)
    val env = CdcSynth.envelope(rows.toDF())
    val shard = pmod(coalesce(col("image.user_id"), col("oldImage.user_id")), lit(4L))
    val root = s"$outDir/mortable"

    graft.sources.ShardLog.record(env.filter(col("event_id") < 60), logDir, shard)
    val r1 = graft.StreamMain.run(spark, confPath, logDir, outDir)
    assert(r1.reports("lakehouse-mor").contains("merge-on-read"))
    graft.sources.ShardLog.record(env, logDir, shard)
    graft.StreamMain.run(spark, confPath, logDir, outDir)
    val vEnd = VersionedTableImpl.currentVersion(spark, root)
    def state() = MorTableImpl.readMor(spark, root, vEnd)
      .select(col("user_id"), col("last_op"), col("last_seq"),
        col("event_type"), col("value"), col("k"))
      .as[(Long, String, String, String, Double, Long)].collect().toSeq.sorted
    assert(state() == expected(rows),
      "config-driven MOR table must equal the one-shot replay")
    assert(MorTableImpl.bucketFileCounts(spark, root, vEnd).values.forall(_ <= 2),
      "compact-over-files must bound the per-bucket file count")
    // idle re-run appends nothing
    graft.StreamMain.run(spark, confPath, logDir, outDir)
    assert(VersionedTableImpl.currentVersion(spark, root) == vEnd)
  }

  test("streaming compaction maintenance bounds live file counts, preserves state and history") {
    import graft.ops.VersionedTableImpl
    val all = events(0 until 170)
    // five batches all touching the same 17 keys: without maintenance a hot
    // bucket's LIVE file count grows one per epoch
    val batches = Seq(all.slice(0, 40), all.slice(40, 75), all.slice(75, 110),
      all.slice(110, 140), all.slice(140, 170))
    val root = Files.createTempDirectory("graft_slake_c").toString
    val ckptDir = Files.createTempDirectory("graft_slake_c_ckpt").toString

    def drain(input: MemoryStream[LkEvent]): Unit =
      LakehouseSink.versionedSink(CdcSynth.envelope(input.toDF()),
        root, ckptDir, NB, compactOver = Some(1)).awaitTermination()

    def liveCounts(): Map[Long, Long] = {
      val v = VersionedTableImpl.currentVersion(spark, root)
      VersionedTableImpl.manifest(spark, root, v)
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
    }

    // a small record cap splits each merge's bucket rewrite into several
    // files — the multi-file-per-commit layout a wide cluster write
    // produces naturally (one file per task per bucket)
    val prevCap = spark.conf.get("spark.sql.files.maxRecordsPerFile", "0")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "1")
    val input = MemoryStream[LkEvent](spark)
    try batches.foreach { b => input.addData(b: _*); drain(input) }
    finally spark.conf.set("spark.sql.files.maxRecordsPerFile", prevCap)

    // the fragmentation was real: the last MERGE commit (the version just
    // below the final compaction) carried multi-file buckets
    val vEnd0 = VersionedTableImpl.currentVersion(spark, root)
    val preCompact = VersionedTableImpl.manifest(spark, root, vEnd0 - 1)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(preCompact.values.exists(_ > 1),
      s"precondition lost: merges no longer fragment buckets: $preCompact")
    assert(liveCounts().values.forall(_ <= 1),
      s"maintenance must hold every bucket at <= 1 live file: ${liveCounts()}")

    // compaction is pure layout: current state equals the one-shot replay
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("user_id"), col("last_op"), col("last_seq"),
        col("event_type"), col("value"), col("k"))
        .as[(Long, String, String, String, Double, Long)].collect().toSeq.sorted
    val vEnd = VersionedTableImpl.currentVersion(spark, root)
    assert(rows(VersionedTableImpl.readVersion(spark, root, vEnd)) == expected(all),
      "compacted state must equal the full-log replay")

    // time travel still resolves pre-compaction versions (old files kept)
    assert(rows(VersionedTableImpl.readVersion(spark, root, 1)) ==
      expected(batches(0)), "history survives compaction commits")

    // restart-idempotent: an idle drain neither merges nor compacts
    drain(input)
    assert(VersionedTableImpl.currentVersion(spark, root) == vEnd,
      "an idle drain must append neither merge nor compaction versions")
  }

  test("a crash between commit and feed emission loses no feed: replay repairs it") {
    import graft.ops.VersionedTableImpl
    val all = events(0 until 120)
    val root = Files.createTempDirectory("graft_slake_r").toString
    val appId = "feedcrash"

    // epoch 0 lands normally: v1 committed, feed v1 emitted, marker written
    LakehouseSink.versionedBatch(CdcSynth.envelope(all.slice(0, 50).toDF()),
      0L, root, appId, NB, compactOver = None, emitFeed = true)
    assert(VersionedTableImpl.currentVersion(spark, root) == 1)

    // epoch 1 CRASHES between commitMerge and emitFeed: the commit exists
    // (v2), its change data files do not, and no marker was written
    VersionedTableImpl.commitMerge(spark, root,
      CdcSynth.envelope(all.slice(50, 90).toDF()), NB)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(VersionedTableImpl.feedPath(root, 2)),
      "fixture: the crash left v2 with no feed artifact")

    // the stream restarts and REPLAYS epoch 1 (marker absent): repair must
    // emit v2's feed before the state-identical re-commit appends v3
    LakehouseSink.versionedBatch(CdcSynth.envelope(all.slice(50, 90).toDF()),
      1L, root, appId, NB, compactOver = None, emitFeed = true)
    val vEnd = VersionedTableImpl.currentVersion(spark, root)
    assert(vEnd == 3, s"replay re-commits once (state-identical v3): $vEnd")

    def feedRows(df: DataFrame) =
      df.select(col("user_id"), col("change_op"), col("seq_before"), col("seq_after"))
        .as[(Long, String, Option[String], Option[String])].collect().toSeq.sorted
    val allFeed = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$root/_feed")
    assert(feedRows(allFeed.filter(col("version") === 2L)) ==
      feedRows(VersionedTableImpl.changeFeed(spark, root, 1, 2)),
      "the crashed version's changes must appear under _feed (repaired)")
    assert(allFeed.filter(col("version") === 3L).count() == 0,
      "the replayed re-commit's own diff is empty")

    // the q209 contract holds: folding ALL change data files reconstructs
    // the table state — nothing was lost from the feed
    val folded = allFeed
      .groupBy(col("user_id"))
      .agg(max_by(struct(col("change_op"), col("value_after")), col("version")).as("last"))
      .filter(col("last.change_op") =!= "DELETE")
      .select(col("user_id"), col("last.value_after").as("value"))
      .as[(Long, Option[Double])].collect().toMap
    val table = VersionedTableImpl.readVersion(spark, root, vEnd)
      .select(col("user_id"), col("value")).as[(Long, Option[Double])]
      .collect().toMap
    assert(folded == table, "feed-reconstructed state must equal the table")

    // epoch 2 proceeds normally on top
    LakehouseSink.versionedBatch(CdcSynth.envelope(all.slice(90, 120).toDF()),
      2L, root, appId, NB, compactOver = None, emitFeed = true)
    assert(VersionedTableImpl.currentVersion(spark, root) == 4)
    assert(fs.exists(VersionedTableImpl.feedPath(root, 4)))
  }

  test("commit markers are stream-scoped: a checkpoint reset must not skip commits") {
    import graft.ops.VersionedTableImpl
    val all = events(0 until 120)
    val root = Files.createTempDirectory("graft_slake_id").toString

    // appId derivation: stable per checkpoint dir, distinct across dirs
    assert(LakehouseSink.appIdFor("/ckpt/a") == LakehouseSink.appIdFor("/ckpt/a"))
    assert(LakehouseSink.appIdFor("/ckpt/a") != LakehouseSink.appIdFor("/ckpt/b"))

    // lineage 1 drains a batch as micro-batch 0
    val ckptA = Files.createTempDirectory("graft_slake_id_a").toString
    val in1 = MemoryStream[LkEvent](spark)
    in1.addData(all.slice(0, 60): _*)
    LakehouseSink.versionedSink(CdcSynth.envelope(in1.toDF()),
      root, ckptA, NB).awaitTermination()
    val v1 = VersionedTableImpl.currentVersion(spark, root)
    assert(v1 >= 1)

    // CHECKPOINT RESET: a fresh lineage over the same table root restarts
    // micro-batch ids at 0 — with markers keyed on batch id alone this
    // batch would find lineage 1's marker and be silently dropped
    val ckptB = Files.createTempDirectory("graft_slake_id_b").toString
    val in2 = MemoryStream[LkEvent](spark)
    in2.addData(all.slice(60, 120): _*)
    LakehouseSink.versionedSink(CdcSynth.envelope(in2.toDF()),
      root, ckptB, NB).awaitTermination()
    assert(VersionedTableImpl.currentVersion(spark, root) > v1,
      "the new lineage's first batch must commit, not hit the old marker")
    assert(table_v(root) == expected(all),
      "state must include BOTH lineages' batches")

    // within a lineage replay protection still holds: an idle re-run of
    // lineage 2 appends nothing
    LakehouseSink.versionedSink(CdcSynth.envelope(in2.toDF()),
      root, ckptB, NB).awaitTermination()
    assert(table_v(root) == expected(all))
  }

  test("staged sink: a whole drain lands on a branch, one audited publish, main never sees stages") {
    import graft.ops.VersionedTableImpl
    import graft.ops.VersionedTableImpl.Expectation
    val all = events(0 until 150)
    val batches = Seq(all.slice(0, 60), all.slice(60, 110), all.slice(110, 150))
    val root = Files.createTempDirectory("graft_slake_st").toString
    val ckptDir = Files.createTempDirectory("graft_slake_st_ckpt").toString

    // staged INITIAL ingest: the branch forks the empty table (v0)
    assert(VersionedTableImpl.createBranch(spark, root, "nightly") == 0)
    def drain(input: MemoryStream[LkEvent]): Unit =
      LakehouseSink.stagedSink(CdcSynth.envelope(input.toDF()),
        root, "nightly", ckptDir, NB).awaitTermination()

    val input = MemoryStream[LkEvent](spark)
    batches.foreach { b => input.addData(b: _*); drain(input) }

    // the whole drain is staged: three branch commits, main untouched
    assert(VersionedTableImpl.branchHead(spark, root, "nightly") == 3)
    assert(VersionedTableImpl.currentVersion(spark, root) == 0,
      "main must see nothing while the drain is staged")

    // the audit gates the COMPOSED drain; a passing suite publishes it as
    // ONE main version and spends the branch
    val pub = VersionedTableImpl.publishBranch(spark, root, "nightly",
      Seq(Expectation("value_non_null", col("value").isNotNull)))
    assert(pub == Right(1), s"audited publish lands main v1: $pub")
    assert(table_v(root) == expected(all),
      "published state must equal the one-shot full-log replay")

    // an idle re-drain stages nothing (markers survive the publish)
    drain(input)
    assert(VersionedTableImpl.currentVersion(spark, root) == 1)

    // a failing audit leaves main untouched and the branch inspectable
    assert(VersionedTableImpl.createBranch(spark, root, "bad") == 1)
    VersionedTableImpl.commitMergeToBranch(spark, root, "bad",
      CdcSynth.envelope(events(150 until 170).toDF()), NB)
    val rej = VersionedTableImpl.publishBranch(spark, root, "bad",
      Seq(Expectation("nothing_ever", lit(false))))
    assert(rej.isLeft && VersionedTableImpl.currentVersion(spark, root) == 1,
      s"a rejected publish must change nothing on main: $rej")
    assert(VersionedTableImpl.branchHead(spark, root, "bad") == 1,
      "the rejected branch stays staged for inspection")
  }

  test("staged and MOR streaming sinks run end-to-end on object-store semantics") {
    // the objstore shim breaks rename atomicity and serializes conditional
    // PUTs through a cross-process FileLock: the sinks' TABLE side must
    // survive it via pointer commits (engaged automatically by scheme).
    // Spark's own CHECKPOINT stays on the local FS — the streaming engine
    // requires a checkpoint store with atomic rename, which real
    // deployments satisfy with an HDFS/ABFS checkpoint dir or the
    // S3A-committer-style checkpoint manager, orthogonal to the table.
    import graft.ops.{MorTableImpl, VersionedTableImpl}
    spark.sparkContext.hadoopConfiguration.set(
      "fs.objstore.impl", classOf[graft.fs.ObjectStoreFileSystem].getName)
    val all = events(0 until 100)
    val batches = Seq(all.slice(0, 50), all.slice(50, 100))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("user_id"), col("last_op"), col("last_seq"),
        col("event_type"), col("value"), col("k"))
        .as[(Long, String, String, String, Double, Long)].collect().toSeq.sorted
    def assertPointerMode(root: String, lineagePrefix: String): Unit = {
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.exists(new org.apache.hadoop.fs.Path(root,
        s"_versions/$lineagePrefix" + "1.parquet.ptr")) &&
        !fs.exists(new org.apache.hadoop.fs.Path(root,
          s"_versions/$lineagePrefix" + "1.parquet")),
        s"commits on $root must be pointer PUTs, never visible renames")
    }

    // STAGED drain on the shim: branch commits, audited publish, all pointers
    val rootS = "objstore:" + Files.createTempDirectory("graft_slake_objst").toString
    val ckptS = Files.createTempDirectory("graft_slake_objst_ckpt").toString
    assert(VersionedTableImpl.createBranch(spark, rootS, "nightly") == 0)
    val inS = MemoryStream[LkEvent](spark)
    batches.foreach { b =>
      inS.addData(b: _*)
      LakehouseSink.stagedSink(CdcSynth.envelope(inS.toDF()),
        rootS, "nightly", ckptS, NB).awaitTermination()
    }
    assert(VersionedTableImpl.branchHead(spark, rootS, "nightly") == 2)
    assert(VersionedTableImpl.currentVersion(spark, rootS) == 0,
      "main must see nothing while staged, pointer layout included")
    assertPointerMode(rootS, "b-nightly-v")
    val pub = VersionedTableImpl.publishBranch(spark, rootS, "nightly", Seq.empty)
    assert(pub == Right(1), s"$pub")
    assertPointerMode(rootS, "v")
    assert(rows(VersionedTableImpl.readVersion(spark, rootS, 1)) == expected(all),
      "staged-on-objstore published state must equal the one-shot replay")

    // MOR drain + threshold compaction maintenance on the shim
    val rootM = "objstore:" + Files.createTempDirectory("graft_slake_objmor").toString
    val ckptM = Files.createTempDirectory("graft_slake_objmor_ckpt").toString
    val inM = MemoryStream[LkEvent](spark)
    batches.foreach { b =>
      inM.addData(b: _*)
      LakehouseSink.morSink(CdcSynth.envelope(inM.toDF()),
        rootM, ckptM, NB, compactOver = Some(1)).awaitTermination()
    }
    val vEnd = VersionedTableImpl.currentVersion(spark, rootM)
    assert(vEnd >= 2, s"deltas (+ compactions) landed: $vEnd")
    assertPointerMode(rootM, "v")
    assert(rows(MorTableImpl.readMor(spark, rootM, vEnd)) == expected(all),
      "MOR-on-objstore state must equal the one-shot replay")
  }

  test("config-driven staged sink: drains publish atomically, re-runs and catch-ups stay exactly-once") {
    import graft.ops.VersionedTableImpl
    val tmp = Files.createTempDirectory("graft_staged_cli").toString
    val (logDir, outDir, confPath) = (s"$tmp/log", s"$tmp/out", s"$tmp/conf.hocon")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(confPath),
      """keyspaces-cdc-streams.stream {
        |  source = shardlog
        |  connector {
        |    sink = "lakehouse-staged"
        |    record-format = full
        |    fields-to-include = "user_id,event_type,value,k"
        |    partition-keys = "user_id"
        |    lakehouse-buckets = 8
        |    staged-branch = "nightly"
        |  }
        |}""".stripMargin)
    val rows = events(0 until 120)
    val env = CdcSynth.envelope(rows.toDF())
    val shard = pmod(coalesce(col("image.user_id"), col("oldImage.user_id")), lit(4L))
    val root = s"$outDir/vtable"

    // drain 1: first half stages on the branch, publishes as main v1
    graft.sources.ShardLog.record(env.filter(col("event_id") < 60), logDir, shard)
    val r1 = graft.StreamMain.run(spark, confPath, logDir, outDir)
    assert(VersionedTableImpl.currentVersion(spark, root) == 1,
      "the drain's staged commits publish as ONE main version")
    assert(r1.reports("lakehouse-staged").contains("version 1"))
    assert(table_v(root) == expected(events(0 until 60)),
      "published state equals the replay of the drained half")

    // drain 2 (catch-up): the rest stages on a FRESH fork, publishes as v2
    graft.sources.ShardLog.record(env, logDir, shard)
    graft.StreamMain.run(spark, confPath, logDir, outDir)
    assert(VersionedTableImpl.currentVersion(spark, root) == 2)
    assert(table_v(root) == expected(rows),
      "after catch-up the published state equals the full replay")

    // idle re-run: nothing staged, nothing published
    graft.StreamMain.run(spark, confPath, logDir, outDir)
    assert(VersionedTableImpl.currentVersion(spark, root) == 2)
  }

  test("fanout: versioned+staged is rejected at config time; versioned+mor commits both legs") {
    import graft.ops.{MorTableImpl, VersionedTableImpl}
    val tmp = Files.createTempDirectory("graft_fanout").toString
    val (logDir, outDir, confPath) = (s"$tmp/log", s"$tmp/out", s"$tmp/conf.hocon")
    def conf(sinks: String): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(confPath),
        s"""keyspaces-cdc-streams.stream {
           |  source = shardlog
           |  connector {
           |    sink = "$sinks"
           |    record-format = full
           |    partition-keys = "user_id"
           |    lakehouse-buckets = 8
           |  }
           |}""".stripMargin)
    val rows = events(0 until 120)
    val env = CdcSynth.envelope(rows.toDF())
    val shard = pmod(coalesce(col("image.user_id"), col("oldImage.user_id")), lit(4L))
    graft.sources.ShardLog.record(env, logDir, shard)

    // the two vtable-rooted sinks have incompatible lineages: loud reject,
    // never a silently-lost leg (round-10 advisory)
    conf("lakehouse-versioned,lakehouse-staged")
    intercept[IllegalArgumentException] {
      graft.StreamMain.run(spark, confPath, logDir, outDir)
    }

    // a coherent fanout (distinct roots, sink-scoped marker appIds): every
    // batch commits on BOTH legs and both tables equal the one-shot replay
    conf("lakehouse-versioned,lakehouse-mor")
    graft.StreamMain.run(spark, confPath, logDir, outDir)
    val exp = expected(rows)
    assert(table_v(s"$outDir/vtable") == exp,
      "the versioned leg must hold the full replay state")
    val morV = VersionedTableImpl.currentVersion(spark, s"$outDir/mortable")
    assert(morV >= 1, "the MOR leg must have committed")
    val mor = MorTableImpl.readMor(spark, s"$outDir/mortable", morV)
      .select(col("user_id"), col("last_op"), col("last_seq"),
        col("event_type"), col("value"), col("k"))
      .as[(Long, String, String, String, Double, Long)].collect().toSeq.sorted
    assert(mor == exp, "the MOR leg must hold the full replay state")
  }

  private def table_v(root: String): Seq[(Long, String, String, String, Double, Long)] = {
    import graft.ops.VersionedTableImpl
    val v = VersionedTableImpl.currentVersion(spark, root)
    VersionedTableImpl.readVersion(spark, root, v)
      .select(col("user_id"), col("last_op"), col("last_seq"),
        col("event_type"), col("value"), col("k"))
      .as[(Long, String, String, String, Double, Long)].collect().toSeq.sorted
  }
}
