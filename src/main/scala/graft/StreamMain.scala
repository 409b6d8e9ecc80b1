package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.cdc.CdcSynth
import graft.config.GraftConfig
import graft.streaming.{Pipeline, Sinks}

/** Streaming app assembly — the Spark analogue of the reference's
  * `KCLMainRunner` (KCLMainRunner.java:25-102): resolve config, build the
  * source, wire filter → projection → sink(s), run with checkpointing.
  *
  * Usage: `runMain graft.StreamMain <conf.hocon> <eventsDir> <outDir>`
  *
  * `connector.sink` may be a single sink name or a comma-separated list —
  * a list fans each micro-batch out to every named sink from ONE source
  * read (the reference runs one KCL process per target; the fan-out form
  * amortizes the stream consumption across targets and keeps all sinks on
  * the same checkpointed offsets).
  *
  * The default source is Spark's file streaming source over the events
  * parquet (offline stand-in for the Kinesis/Keyspaces-CDC stream —
  * SURVEY.md §2.1 S1: same envelope, same TRIM_HORIZON-like "earliest"
  * semantics); `source = shardlog` swaps in the custom DataSource V2
  * `MicroBatchStream` over a recorded shard log.
  */
object StreamMain {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos-as-long (TESTDATA parquet)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Everything a caller (CLI or spec) needs to inspect a finished run:
    * per-sink human report plus the in-memory sink clients. */
  final case class RunResult(reports: Map[String, String],
      sqs: Sinks.InMemorySqsClient,
      mv: Sinks.InMemoryKeyedTable,
      vec: Sinks.InMemoryVectorIndex)

  /** Assemble and run the configured topology to completion
    * (Trigger.AvailableNow) against an existing session. */
  def run(spark: SparkSession, confPath: String, eventsDir: String,
      outDir: String): RunResult = {
    val conf = GraftConfig.load(confPath)
    val settings = GraftConfig.connector(conf)
    val sinkNames = conf.get(s"${GraftConfig.Root}.connector.sink", "file")
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    // these two target the SAME table root with conflicting lineages:
    // per-batch main commits make the staged leg's fork permanently stale
    // (it would drop and re-fork every batch, losing its staging), and its
    // drain-end publish could never fast-forward. Fail loudly at config
    // time instead of silently losing one leg (round-10 advisory).
    require(!(sinkNames.contains("lakehouse-versioned") &&
        sinkNames.contains("lakehouse-staged")),
      "sinks 'lakehouse-versioned' and 'lakehouse-staged' both write the " +
        "vtable root with incompatible lineages — configure exactly one")
    val sourceName = conf.get(s"${GraftConfig.Root}.source", "events")
    import org.apache.spark.sql.functions._

    // source=shardlog: the custom MicroBatchStream over a recorded shard log
    // (graft.sources.ShardLog — per-shard order, TRIM_HORIZON start,
    // checkpointed per-shard offsets). Default: file-streaming the events
    // parquet through the synthetic envelope. Both feed the identical
    // downstream pipeline — the S1 swap-in point.
    val env = sourceName match {
      case "shardlog" =>
        graft.sources.ShardLog.envelope(
          spark.readStream.format("shardlog").option("path", eventsDir)
            .option("maxRecordsPerBatch",
              conf.get(s"${GraftConfig.Root}.source-max-records-per-batch", "100000"))
            .load(),
          "media", "events", CdcSynth.imageSchema)
      case _ =>
        val raw = spark.readStream.schema(eventsSchema)
          .option("pathGlobFilter", "events.parquet").parquet(eventsDir)
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        CdcSynth.envelope(raw)
    }

    val registry = new Sinks.SinkRegistry()
      .register("file", Sinks.fileSink(s"$outDir/data", "json", settings.timestampPartition))
      // reference-naming JSON object sink (S3TargetMapper key scheme):
      // firstSeq-lastSeq[-now]-epochMs.json under the time partition
      .register("jsonobj", Sinks.jsonObjectSink(s"$outDir/data",
        settings.timestampPartition, settings.maxMessageSize,
        settings.maxRecordsPerMessage))
      .register("avro", (batch, id) => {
        val fields =
          if (settings.fieldsToInclude.isEmpty) CdcSynth.imageSchema.fieldNames.toSeq
          else CdcSynth.imageSchema.fieldNames.toSeq.filter(settings.fieldsToInclude.contains)
        val oldCols = // only in `full` record format (P3 old_ prefixing)
          if (batch.columns.contains("oldImage"))
            fields.map(f => col(s"oldImage.$f").as(s"old_$f"))
          else Nil
        // shard identity must survive DELETEs (image is null there) — key
        // on whichever image carries the row, like RecordShardLog
        val shardKey =
          if (batch.columns.contains("oldImage"))
            coalesce(col("image.user_id"), col("oldImage.user_id"))
          else col("image.user_id")
        val meta = Sinks.metaCol(batch)
        val flat = batch.select(
          (meta.getField("stream_sequence_number").as("__seq") +:
            pmod(shardKey, lit(8L)).cast("string").as("__shard") +:
            graft.cdc.Cdc.timePartitionPath(
              timestamp_millis(meta.getField("stream_arrival_timestamp")),
              settings.timestampPartition).as("__path") +:
            fields.map(f => col(s"image.$f").as(f))) ++ oldCols: _*)
        streaming.AvroSink.sink(s"$outDir/data",
          dynamicSchema = conf.getBoolean(s"${GraftConfig.Root}.connector.dynamic-schema", false))(
          flat, id)
      })
      .register("console", (batch, id) => batch.show(5, truncate = false))

    // Remaining reference connectors, config-driven with the reference's own
    // key names (SQSTargetMapper.java:60, KeyspacesViewTargetMapper.java:54-56,
    // S3VectorTargetMapper.java:66-74). The in-memory clients are the
    // zero-egress stand-ins behind the same traits a production SDK client
    // implements (SURVEY §7.4 risk 6).
    def listConf(key: String): Seq[String] =
      conf.get(s"${GraftConfig.Root}.connector.$key", "")
        .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val sqsClient = new Sinks.InMemorySqsClient()
    val mvTable = new Sinks.InMemoryKeyedTable()
    val vecIndex = new Sinks.InMemoryVectorIndex()
    // opt-in epoch ledger for the non-idempotent network sinks (SQS sends,
    // vector puts): replayed micro-batches become no-ops (Sinks.idempotent)
    val ledgered: String => Sinks.BatchSink => Sinks.BatchSink = name =>
      if (conf.getBoolean(s"${GraftConfig.Root}.connector.exactly-once-ledger", false))
        Sinks.idempotent(s"$outDir/_ledger/$name") // per-sink: fanout shares epoch ids
      else identity
    registry
      .register("sqs", ledgered("sqs")(Sinks.sqsSink(sqsClient,
        delaySeconds = conf.getInt(s"${GraftConfig.Root}.connector.delay-seconds", 0),
        maxMessageSize = settings.maxMessageSize,
        maxRecordsPerMessage = settings.maxRecordsPerMessage)))
      .register("mv", Sinks.mvSink(mvTable,
        keyFields = listConf("partition-keys") ++ listConf("clustering-keys"),
        valueFields = settings.fieldsToInclude))
      .register("vector", ledgered("vector")(Sinks.vectorSink(vecIndex, Sinks.HashEmbedder,
        keyField = conf.get(s"${GraftConfig.Root}.connector.key-field", "user_id"),
        embeddingField = conf.get(s"${GraftConfig.Root}.connector.embedding-field", "event_type"),
        dims = conf.getInt(s"${GraftConfig.Root}.connector.dimensions", 256),
        metadataFields = listConf("metadata-fields"))))
      // lakehouse target: each micro-batch MERGEs into the bucketed COW
      // parquet table (the K1 latest-wins semantics against a table a
      // warehouse can read, instead of a keyed store) — idempotent under
      // replay via the sequence gate, so at-least-once delivery still
      // yields exactly-once table state
      .register("lakehouse", (batch, _) => {
        ops.LakehouseOpsImpl.cowMerge(batch.sparkSession, s"$outDir/table",
          batch,
          conf.getInt(s"${GraftConfig.Root}.connector.lakehouse-buckets", 8))
        ()
      })
      // versioned lakehouse target: per-batch COMMIT into a time-travelable
      // history (marker-gated, exactly-once versions under replay) with the
      // optional compaction maintenance hook — the config-driven form of
      // streaming/LakehouseSink.versionedSink
      // (marker gating, feed emission/repair and compaction maintenance
      // live in the shared batch bodies; markers are keyed by the
      // checkpoint-derived appId so a checkpoint reset or a second query
      // on the same table root never skips commits — LakehouseSink.appIdFor)
      // marker appIds are SINK-SCOPED (`-versioned` / `-staged` / `-mor`):
      // a fanout enabling two sinks over the same table root (versioned +
      // staged both target vtable) shares the checkpoint-derived appId, so
      // an unscoped marker written by whichever sink runs first would make
      // the second sink skip its commit for every batch — silent loss on
      // one leg (round-10 advisory)
      .register("lakehouse-versioned", (batch, id) => {
        val compactOver = conf.getInt(s"${GraftConfig.Root}.connector.compact-over-files", 0)
        val appId = streaming.LakehouseSink.appIdFor(s"$outDir/checkpoint")
        streaming.LakehouseSink.versionedBatch(batch, id, s"$outDir/vtable",
          appId + "-versioned",
          conf.getInt(s"${GraftConfig.Root}.connector.lakehouse-buckets", 8),
          if (compactOver > 0) Some(compactOver) else None,
          emitFeed = conf.getBoolean(s"${GraftConfig.Root}.connector.emit-feed", true),
          // pre-scoping-era markers are honored only when this is the sole
          // sink: a fanout's legacy marker cannot say which leg committed
          legacyAppId = if (sinkNames.size == 1) Some(appId) else None)
      })
      // merge-on-read target: per-batch DELTA commit (no base rewrite —
      // commit cost O(batch)) with threshold compaction maintenance — the
      // config-driven form of streaming/LakehouseSink.morSink
      .register("lakehouse-mor", (batch, id) => {
        val compactOver = conf.getInt(s"${GraftConfig.Root}.connector.compact-over-files", 0)
        val appId = streaming.LakehouseSink.appIdFor(s"$outDir/checkpoint")
        streaming.LakehouseSink.morBatch(batch, id, s"$outDir/mortable",
          appId + "-mor",
          conf.getInt(s"${GraftConfig.Root}.connector.lakehouse-buckets", 8),
          if (compactOver > 0) Some(compactOver) else None,
          legacyAppId = if (sinkNames.size == 1) Some(appId) else None)
      })
      // STAGED ingestion target: every micro-batch commits to a branch of
      // the versioned table (main readers see nothing mid-drain); with
      // `publish-on-drain = true` (default) the whole drain fast-forwards
      // to main as ONE audited atomic version after the query stops — the
      // config-driven form of streaming/LakehouseSink.stagedSink
      .register("lakehouse-staged", (batch, id) => {
        val root = s"$outDir/vtable"
        val branch = conf.get(s"${GraftConfig.Root}.connector.staged-branch", "ingest")
        val s = batch.sparkSession
        // idempotent fork: first batch of a drain creates it. A STALE
        // branch (fork below main's head) is dropped and re-forked: in
        // this single-writer sink main only advances through our own
        // publishes, so a stale fork means a prior drain published but
        // crashed before dropping the branch — its content is live.
        val fork = scala.util.Try(ops.VersionedTableImpl.branchFork(s, root, branch))
        if (fork.isFailure)
          ops.VersionedTableImpl.createBranch(s, root, branch)
        else if (fork.get < ops.VersionedTableImpl.currentVersion(s, root)) {
          ops.VersionedTableImpl.dropBranch(s, root, branch)
          ops.VersionedTableImpl.createBranch(s, root, branch)
        }
        streaming.LakehouseSink.versionedBatch(batch, id, root,
          streaming.LakehouseSink.appIdFor(s"$outDir/checkpoint") + "-staged",
          conf.getInt(s"${GraftConfig.Root}.connector.lakehouse-buckets", 8),
          compactOver = None, emitFeed = false, branch = Some(branch))
      })

    val sink =
      if (sinkNames.size == 1) registry(sinkNames.head)
      else Sinks.fanout(sinkNames.map(registry(_)))
    val query = Pipeline.run(env, settings, CdcSynth.imageSchema,
      sink, s"$outDir/checkpoint", Trigger.AvailableNow(),
      deadLetterDir = Some(s"$outDir/deadletter")).start()
    query.awaitTermination()

    // staged drain complete: the audited atomic publish (a drain that
    // staged nothing, or a re-run against an already-published branch,
    // publishes nothing — branchHead is 0 or the fork check rejects)
    if (sinkNames.contains("lakehouse-staged") &&
        conf.getBoolean(s"${GraftConfig.Root}.connector.publish-on-drain", true)) {
      val root = s"$outDir/vtable"
      val branch = conf.get(s"${GraftConfig.Root}.connector.staged-branch", "ingest")
      if (scala.util.Try(ops.VersionedTableImpl.branchFork(spark, root, branch)).isSuccess &&
          ops.VersionedTableImpl.branchHead(spark, root, branch) > 0)
        ops.VersionedTableImpl.publishBranch(spark, root, branch, Seq.empty) match {
          case Right(v) => System.err.println(s"[staged] published main v$v")
          case Left(why) => System.err.println(s"[staged] publish rejected: $why")
        }
    }

    // growth maintenance (after any publish): `rebucket-to = N` re-lays
    // the versioned table over N buckets once — a later drain sees
    // tableBuckets == N and no-ops. The config face of the
    // manifest-recorded bucket count; writers keep passing their
    // creation-time lakehouse-buckets value and stay correct.
    val rebucketTo = conf.getInt(s"${GraftConfig.Root}.connector.rebucket-to", 0)
    if (rebucketTo > 0 &&
        sinkNames.exists(Set("lakehouse-versioned", "lakehouse-staged").contains)) {
      val root = s"$outDir/vtable"
      if (ops.VersionedTableImpl.currentVersion(spark, root) >= 1 &&
          ops.VersionedTableImpl.tableBuckets(spark, root, 0) != rebucketTo)
        ops.VersionedTableImpl.rebucket(spark, root, rebucketTo).foreach { v =>
          // state-identical: record the empty change-data artifact so the
          // feed-repair scan never recomputes this version's (empty) diff
          ops.VersionedTableImpl.emitEmptyFeed(spark, root, v)
          System.err.println(s"[rebucket] table re-laid over $rebucketTo buckets as v$v")
        }
    }

    // crashed-writer reclamation (after any drain): `sweep-stranded-hours
    // = H` (H ≥ 0) sweeps aged staging dirs, mid-commit descriptors,
    // takeover asides and pointer-disowned `.data-` dirs under the
    // lakehouse roots — the config face of
    // [[ops.VersionedTableImpl.sweepStranded]], sitting alongside
    // `compact-over-files` in the maintenance surface. The unit is HOURS
    // because the threshold must exceed any plausible in-flight commit (a
    // racing writer's fresh staging is indistinguishable from a crashed
    // one's); 0 is legal only for provably quiescent runs.
    val sweepHours = conf.get(
      s"${GraftConfig.Root}.connector.sweep-stranded-hours").map(_.toDouble)
    sweepHours.filter(_ >= 0).foreach { h =>
      val roots = Seq("lakehouse-versioned" -> s"$outDir/vtable",
        "lakehouse-staged" -> s"$outDir/vtable",
        "lakehouse-mor" -> s"$outDir/mortable")
        .collect { case (n, r) if sinkNames.contains(n) => r }.distinct
      roots.foreach { r =>
        val swept = ops.VersionedTableImpl.sweepStranded(
          spark, r, (h * 3600 * 1000).toLong)
        if (swept.nonEmpty) System.err.println(
          s"[sweep-stranded] reclaimed ${swept.size} aged crashed-writer " +
            s"artifacts under $r")
      }
    }

    def filesUnder(dir: String, ext: String): Seq[java.io.File] = {
      val b = Seq.newBuilder[java.io.File]
      def walk(f: java.io.File): Unit =
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(walk))
        else if (f.getName.endsWith(ext)) b += f
      walk(new java.io.File(dir)); b.result()
    }
    val reports = sinkNames.map { n =>
      n -> (n match {
        case "file" => s"${spark.read.json(s"$outDir/data").count()} records"
        case "jsonobj" =>
          val files = filesUnder(s"$outDir/data", ".json")
          val recs = files.map(f => spark.read.json(f.getPath).count()).sum
          s"${files.size} json objects, $recs records"
        case "avro" =>
          val files = filesUnder(s"$outDir/data", ".avro")
          s"${files.size} avro files, ${files.map(f => streaming.AvroSink.readFile(f).size).sum} records"
        case "sqs" =>
          val msgs = sqsClient.sent.flatten
          s"${sqsClient.sent.size} SendMessageBatch calls, ${msgs.size} messages"
        case "mv" => s"${mvTable.data.size} materialized rows"
        case "vector" => s"${vecIndex.vectors.size} vectors"
        case "lakehouse" =>
          // a drained stream with zero committed micro-batches never creates
          // the table dir — report the empty table instead of throwing
          val tablePath = new org.apache.hadoop.fs.Path(s"$outDir/table")
          val fs = tablePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (!fs.exists(tablePath)) "0 table rows in 0 buckets"
          else s"${spark.read.parquet(s"$outDir/table").count()} table rows in " +
            s"${ops.LakehouseOpsImpl.bucketFileCounts(spark, s"$outDir/table").size} buckets"
        case "lakehouse-versioned" =>
          val v = ops.VersionedTableImpl.currentVersion(spark, s"$outDir/vtable")
          if (v == 0) "0 table rows at version 0"
          else s"${ops.VersionedTableImpl.readVersion(spark, s"$outDir/vtable", v).count()} " +
            s"table rows at version $v"
        case "lakehouse-mor" =>
          val v = ops.VersionedTableImpl.currentVersion(spark, s"$outDir/mortable")
          if (v == 0) "0 table rows at version 0"
          else s"${ops.MorTableImpl.readMor(spark, s"$outDir/mortable", v).count()} " +
            s"table rows at version $v (merge-on-read)"
        case "lakehouse-staged" =>
          val v = ops.VersionedTableImpl.currentVersion(spark, s"$outDir/vtable")
          if (v == 0) "0 table rows at version 0 (staged, unpublished)"
          else s"${ops.VersionedTableImpl.readVersion(spark, s"$outDir/vtable", v).count()} " +
            s"table rows at version $v (staged ingest)"
        case _ => "console output"
      })
    }.toMap
    RunResult(reports, sqsClient, mvTable, vecIndex)
  }

  def main(args: Array[String]): Unit = {
    val Array(confPath, eventsDir, outDir) = args.take(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val result = run(spark, confPath, eventsDir, outDir)
    result.reports.foreach { case (sink, rep) =>
      println(s"[stream] $sink: wrote $rep to $outDir/data")
    }
    spark.stop()
  }
}
