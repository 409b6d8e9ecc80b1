package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.cdc.CdcSynth

/** VERSIONED lakehouse table — time travel, change feed and vacuum over
  * the [[LakehouseOpsImpl]] MERGE algebra (the design every open table
  * format converges on: immutable data files + a manifest per version
  * listing which files are live; Iceberg/Delta publish the same idea).
  * The reference applies CDC batches destructively
  * (KeyspacesViewTargetMapper.java upserts in place); a 100 TB training
  * pipeline wants the OPPOSITE: "which documents did yesterday's merge
  * change" (incremental re-embedding, cache invalidation) and "read the
  * corpus exactly as the last training run saw it" (reproducibility).
  *
  *  - [[commitMerge]]: MERGE a CDC envelope batch as version V+1. New
  *    files are written for touched buckets only and MOVED into the data
  *    dirs; nothing is ever overwritten or deleted at commit time. The
  *    manifest (a bucket → files parquet, metadata-sized) is written
  *    LAST: a crash before it leaves only unreferenced files that the
  *    next vacuum sweeps — readers never see a partial commit.
  *  - [[readVersion]]: the table exactly as of version v — scan precisely
  *    the files manifest v lists (manifest-based pruning: the file list
  *    IS the partition filter).
  *  - [[changeFeed]]: the per-key diff between two versions from their
  *    states' full-outer join on the key — INSERT/UPDATE/DELETE derived
  *    from seq presence/inequality (merges are seq-monotone, so
  *    last_seq equality ⇔ untouched; no column-wise compare needed).
  *  - [[vacuum]]: delete data files referenced by NO manifest ≥
  *    keepFrom — time travel's storage cost is reclaimed explicitly,
  *    never implicitly.
  *
  * Scale shape: a commit costs O(touched buckets) like [[LakehouseOpsImpl
  * .cowMerge]] plus one metadata-sized manifest write; time-travel reads
  * prune by file list; the change feed joins two bucket-aligned states
  * (hash-partitioned on the key); vacuum is a driver-side metadata diff
  * over manifests plus unlink calls.
  */
object VersionedTableImpl {

  private def fsOf(s: SparkSession, root: String) =
    new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Highest committed version (0 = empty table: no manifests yet). */
  def currentVersion(s: SparkSession, root: String): Int = {
    val fs = fsOf(s, root)
    val dir = new Path(root, "_versions")
    if (!fs.exists(dir)) 0
    else fs.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".parquet") =>
        n.stripPrefix("v").stripSuffix(".parquet").toInt }
      .foldLeft(0)(math.max)
  }

  /** (bucket, file) rows of manifest v — empty frame at v = 0. */
  private def manifest(s: SparkSession, root: String, v: Int): DataFrame =
    if (v == 0)
      s.createDataFrame(s.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("bucket",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("file",
            org.apache.spark.sql.types.StringType))))
    else s.read.parquet(s"$root/_versions/v$v.parquet")

  private def filesOf(s: SparkSession, root: String, v: Int,
      buckets: Option[Seq[Long]]): Seq[String] = {
    val m = buckets.fold(manifest(s, root, v))(bs =>
      manifest(s, root, v).filter(col("bucket").isin(bs: _*)))
    m.select(col("file")).collect().map(_.getString(0)).toSeq // metadata
  }

  /** The table as of version v (empty-typed frame when v = 0 or nothing
    * survived). Union schema across files of different commit eras. */
  def readVersion(s: SparkSession, root: String, v: Int): DataFrame = {
    val files = filesOf(s, root, v, None)
    if (files.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[Row],
        LakehouseOpsImpl.tableSchema)
    else s.read.option("mergeSchema", "true").parquet(files: _*)
  }

  private def readBuckets(s: SparkSession, root: String, v: Int,
      buckets: Seq[Long]): DataFrame = {
    val files = filesOf(s, root, v, Some(buckets))
    if (files.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[Row],
        LakehouseOpsImpl.tableSchema)
    else s.read.option("mergeSchema", "true").parquet(files: _*)
  }

  /** MERGE `env` into the table as version current+1. Returns the new
    * version (current, unchanged, when the batch touches nothing). */
  def commitMerge(s: SparkSession, root: String, env: DataFrame,
      nBuckets: Int): Int = {
    val keyOf = coalesce(col("image.user_id"), col("oldImage.user_id"))
    val seqOf = col("metadata.stream_sequence_number")
    val updates = LakehouseOpsImpl.latestUpdates(env, keyOf, seqOf)
      .withColumn("bucket", pmod(col("user_id"), lit(nBuckets.toLong)))
    val touched = updates.select(col("bucket")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted // <= nBuckets rows
    val v = currentVersion(s, root)
    if (touched.isEmpty) return v
    val base = readBuckets(s, root, v, touched)
    val merged = LakehouseOpsImpl.mergeLatest(base, updates.drop("bucket"))
      .drop("from_base")
      .withColumn("bucket", pmod(col("user_id"), lit(nBuckets.toLong)))
    val fs = fsOf(s, root)
    val newV = v + 1
    val staging = new Path(root,
      s".v_staging_${java.util.UUID.randomUUID().toString.replace("-", "")}")
    val newFiles: Map[Long, Seq[String]] =
      try {
        merged.write.mode("overwrite").partitionBy("bucket")
          .parquet(staging.toString)
        fs.listStatus(staging).filter(_.getPath.getName.startsWith("bucket="))
          .map { st =>
            val b = st.getPath.getName.stripPrefix("bucket=").toLong
            val dest = new Path(s"$root/data/bucket=$b")
            fs.mkdirs(dest)
            val moved = fs.listStatus(st.getPath)
              .filter(_.getPath.getName.endsWith(".parquet"))
              .map { f => // immutable: publish under a version-scoped name
                val to = new Path(dest, s"v$newV-${f.getPath.getName}")
                fs.rename(f.getPath, to)
                // store the QUALIFIED uri: vacuum compares against
                // listStatus output, which is always scheme-qualified
                fs.makeQualified(to).toString
              }
            b -> moved.toSeq
          }.toMap
      } finally fs.delete(staging, true)
    // manifest = carried-forward untouched buckets + the new files; the
    // write below is the COMMIT POINT (readers resolve versions from
    // manifests alone, so everything before it is invisible)
    import s.implicits._
    val carried = manifest(s, root, v)
      .filter(!col("bucket").isin(touched: _*))
      .as[(Long, String)].collect().toSeq
    val rows = carried ++ touched.flatMap(b =>
      newFiles.getOrElse(b, Seq.empty).map(f => (b, f)))
    rows.toDF("bucket", "file").coalesce(1)
      .write.mode("errorifexists").parquet(s"$root/_versions/v$newV.parquet")
    newV
  }

  /** WRITE-AUDIT-PUBLISH: merge `env` as a STAGED version, run `audit`
    * against the would-be new state, and only then publish. The manifest
    * write is already the commit point, so WAP needs no new machinery —
    * the staged manifest lands under `_versions/.pending-v{N}.parquet`
    * (dot-prefixed: [[currentVersion]] never sees it), the audit reads
    * the staged state through it, and PUBLISH is one atomic manifest
    * rename. A failing audit deletes the pending manifest and leaves the
    * table at version N−1 — its data files are unreferenced and the next
    * [[vacuum]] sweeps them. Returns Right(newVersion) on publish,
    * Left(reason) on an audit reject. */
  def commitMergeAudited(s: SparkSession, root: String, env: DataFrame,
      nBuckets: Int)(audit: DataFrame => Option[String]): Either[String, Int] = {
    val before = currentVersion(s, root)
    val newV = commitMerge(s, root, env, nBuckets)
    if (newV == before) return Right(before) // empty batch: nothing to audit
    val fs = fsOf(s, root)
    val visible = new Path(s"$root/_versions/v$newV.parquet")
    val pending = new Path(s"$root/_versions/.pending-v$newV.parquet")
    fs.rename(visible, pending) // stage: invisible to version resolution
    val staged = s.read.parquet(pending.toString)
    val files = staged.select(col("file")).collect().map(_.getString(0)).toSeq
    val state =
      if (files.isEmpty)
        s.createDataFrame(s.sparkContext.emptyRDD[Row], LakehouseOpsImpl.tableSchema)
      else s.read.option("mergeSchema", "true").parquet(files: _*)
    audit(state) match {
      case None => fs.rename(pending, visible); Right(newV)
      case Some(reason) => fs.delete(pending, true); Left(reason)
    }
  }

  /** Per-key INSERT/UPDATE/DELETE feed between two committed versions.
    * Carries before/after images of the payload columns consumers index
    * on (value, event_type) — enough to maintain a derived structure
    * without reading either full state again ([[maintainedTypeIndex]]). */
  def changeFeed(s: SparkSession, root: String, v1: Int, v2: Int): DataFrame = {
    val a = readVersion(s, root, v1).select(col("user_id"),
      col("last_seq").as("seq_before"), col("value").as("value_before"),
      col("event_type").as("type_before"))
    val b = readVersion(s, root, v2).select(col("user_id"),
      col("last_seq").as("seq_after"), col("value").as("value_after"),
      col("event_type").as("type_after"))
    a.join(b, Seq("user_id"), "full_outer")
      .withColumn("change_op",
        when(col("seq_before").isNull, "INSERT")
          .when(col("seq_after").isNull, "DELETE")
          .when(col("seq_before") =!= col("seq_after"), "UPDATE"))
      .filter(col("change_op").isNotNull) // seq equality = untouched
      .select(col("user_id"), col("change_op"),
        col("seq_before"), col("seq_after"),
        col("value_before"), col("value_after"),
        col("type_before"), col("type_after"))
      .orderBy(col("user_id"))
  }

  /** Delete data files referenced by no manifest in [keepFrom, current];
    * versions below keepFrom become unreadable. Returns deleted paths. */
  def vacuum(s: SparkSession, root: String, keepFrom: Int): Seq[String] = {
    val fs = fsOf(s, root)
    val cur = currentVersion(s, root)
    val live = (keepFrom to cur)
      .flatMap(v => filesOf(s, root, v, None)).toSet
    val dataDir = new Path(root, "data")
    if (!fs.exists(dataDir)) return Seq.empty
    val all = fs.listStatus(dataDir).filter(_.isDirectory).flatMap(d =>
      fs.listStatus(d.getPath).map(_.getPath))
      .filter(_.getName.endsWith(".parquet"))
    val dead = all.filterNot(p => live(p.toString))
    dead.foreach(p => fs.delete(p, false))
    dead.map(_.toString).toSeq
  }

  // ------------------------------------------------------------ q182/q183
  /** One versioned table per (session, dir): v1 = first half of the event
    * log by id, v2 = the rest — the q179 split, committed as two versions. */
  private val roots = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  def clearCaches(): Unit = { roots.clear(); quarterRoots.clear() }

  private def ensureVersioned(s: SparkSession, dir: String): String =
    Memo.getOrCacheAny(roots, s, dir, { _ =>
      val root = java.nio.file.Files.createTempDirectory("graft_vtable").toString
      val env = CdcSynth.fromEvents(s, dir)
      val mid = Tables(s, dir, "events")
        .agg(expr("max(event_id) div 2").as("mid"))
      val withMid = env.crossJoin(broadcast(mid))
      val v1 = commitMerge(s, root,
        withMid.filter(col("event_id") < col("mid")), 8)
      val v2 = commitMerge(s, root,
        withMid.filter(col("event_id") >= col("mid")), 8)
      require(v1 == 1 && v2 == 2, s"two commits expected: $v1, $v2")
      root
    })

  /** q182: the table AS OF v1 read through the manifest — after v2 was
    * committed on top — must equal DuckDB's replay of only the first-half
    * log: history is immutable under later merges. */
  def timeTravel(s: SparkSession, dir: String): DataFrame =
    readVersion(s, ensureVersioned(s, dir), 1)
      .select(col("user_id"), col("last_op"), col("last_seq"),
        col("event_type"), col("value"), col("k"))
      .orderBy(col("user_id"))

  /** q183: the v1→v2 change feed — must equal DuckDB diffing its own
    * half-log and full-log replays. */
  def versionDiff(s: SparkSession, dir: String): DataFrame =
    changeFeed(s, ensureVersioned(s, dir), 1, 2)

  /** q186: a SECONDARY INDEX (event_type → keys) maintained from the
    * change feed alone — the derived-structure pattern every consumer of
    * a CDC table repeats (inverted indexes, caches, aggregates): build
    * the index once at v1, then apply only the v1→v2 feed — DELETE/UPDATE
    * retract the before-image entry, INSERT/UPDATE add the after-image
    * entry — and the result must hash-match the index rebuilt from the
    * full v2 state. Cost is O(|feed|) + the v1 index, never a v2 scan:
    * the same maintained-view-equals-recompute discipline as q161's IVM,
    * driven by the versioned table's own feed. An UPDATE whose indexed
    * column did not change retracts and re-adds the same entry (anti-join
    * then union), so the path is insensitive to over-reporting. */
  def maintainedTypeIndex(s: SparkSession, dir: String): DataFrame = {
    val root = ensureVersioned(s, dir)
    val idx1 = readVersion(s, root, 1)
      .select(col("event_type"), col("user_id"))
    val feed = changeFeed(s, root, 1, 2)
    val retracted = feed.filter(col("change_op").isin("DELETE", "UPDATE"))
      .select(col("type_before").as("event_type"), col("user_id"))
    val added = feed.filter(col("change_op").isin("INSERT", "UPDATE"))
      .select(col("type_after").as("event_type"), col("user_id"))
    idx1.join(retracted, Seq("event_type", "user_id"), "left_anti")
      .unionByName(added)
      .orderBy(col("event_type"), col("user_id"))
  }

  private lazy val q182Sql: String =
    s"""WITH ${CdcSynth.synthSql},
       |mid AS (SELECT max(event_id) // 2 AS mid FROM events),
       |latest AS (
       |  SELECT COALESCE(new_user_id, old_user_id) AS user_id,
       |    max_by(op, seq) AS last_op, max(seq) AS last_seq,
       |    max_by(has_new, seq) AS has_new,
       |    max_by(new_event_type, seq) AS event_type,
       |    max_by(new_value, seq) AS value,
       |    max_by(new_k, seq) AS k
       |  FROM cdc, mid WHERE event_id < mid GROUP BY 1)
       |SELECT user_id, last_op, last_seq, event_type, value, k
       |FROM latest WHERE has_new ORDER BY user_id""".stripMargin

  private lazy val q183Sql: String =
    s"""WITH ${CdcSynth.synthSql},
       |mid AS (SELECT max(event_id) // 2 AS mid FROM events),
       |v1 AS (
       |  SELECT COALESCE(new_user_id, old_user_id) AS user_id,
       |    max(seq) AS last_seq, max_by(has_new, seq) AS has_new,
       |    max_by(new_value, seq) AS value,
       |    max_by(new_event_type, seq) AS event_type
       |  FROM cdc, mid WHERE event_id < mid GROUP BY 1),
       |v2 AS (
       |  SELECT COALESCE(new_user_id, old_user_id) AS user_id,
       |    max(seq) AS last_seq, max_by(has_new, seq) AS has_new,
       |    max_by(new_value, seq) AS value,
       |    max_by(new_event_type, seq) AS event_type
       |  FROM cdc GROUP BY 1),
       |a AS (SELECT user_id, last_seq AS seq_before, value AS value_before,
       |        event_type AS type_before
       |      FROM v1 WHERE has_new),
       |b AS (SELECT user_id, last_seq AS seq_after, value AS value_after,
       |        event_type AS type_after
       |      FROM v2 WHERE has_new),
       |j AS (
       |  SELECT COALESCE(a.user_id, b.user_id) AS user_id,
       |    CASE WHEN a.user_id IS NULL THEN 'INSERT'
       |         WHEN b.user_id IS NULL THEN 'DELETE'
       |         WHEN seq_before <> seq_after THEN 'UPDATE' END AS change_op,
       |    seq_before, seq_after, value_before, value_after,
       |    type_before, type_after
       |  FROM a FULL OUTER JOIN b ON a.user_id = b.user_id)
       |SELECT user_id, change_op, seq_before, seq_after,
       |  value_before, value_after, type_before, type_after
       |FROM j WHERE change_op IS NOT NULL ORDER BY user_id""".stripMargin

  // -------------------------------------------------------------- q193
  /** Quartered build for the POINT-IN-TIME join: three commits at the
    * event_id quarter boundaries (q, 2q, 3q with q = max div 4). */
  private val quarterRoots = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  private def ensureQuartered(s: SparkSession, dir: String): String =
    Memo.getOrCacheAny(quarterRoots, s, dir, { _ =>
      val root = java.nio.file.Files.createTempDirectory("graft_vtable_q").toString
      val env = CdcSynth.fromEvents(s, dir)
      val q = Tables(s, dir, "events")
        .agg(expr("max(event_id) div 4").as("q"))
      val withQ = env.crossJoin(broadcast(q))
      commitMerge(s, root, withQ.filter(col("event_id") < col("q")), 8)
      commitMerge(s, root, withQ.filter(
        col("event_id") >= col("q") && col("event_id") < col("q") * 2), 8)
      commitMerge(s, root, withQ.filter(
        col("event_id") >= col("q") * 2 && col("event_id") < col("q") * 3), 8)
      root
    })

  /** q193: POINT-IN-TIME join — each event reads the table state as of
    * the LAST VERSION COMMITTED BEFORE it (feature-store train-time
    * correctness: the feature an example may see is the one that existed
    * when the example happened; joining today's state onto yesterday's
    * examples is label leakage). An event in quarter k joins version k
    * (built from events before boundary k); first-quarter events predate
    * every commit and read NULL. Implementation: the three version
    * states union under a `version` tag and the join is a plain hash
    * equi-join on (version, user_id) — at scale the tagged union reads
    * each version's manifest file list (deltas share files, so the cost
    * is the distinct-file set, not versions × table), and the join
    * co-partitions on the key. Oracle: DuckDB recomputes each event's
    * as-of state directly from the log (latest same-user row before the
    * event's version boundary) — the maintained-history-equals-recompute
    * discipline, applied per event. */
  def pitJoin(s: SparkSession, dir: String): DataFrame = {
    val root = ensureQuartered(s, dir)
    val states = (1 to 3).map(k =>
      readVersion(s, root, k).select(lit(k.toLong).as("version"),
        col("user_id"), col("last_seq").as("pit_seq"),
        col("value").as("pit_value"))).reduce(_ unionByName _)
    val q = Tables(s, dir, "events")
      .agg(expr("max(event_id) div 4").as("q"))
    val ev = Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"))
      .crossJoin(broadcast(q))
      .withColumn("version",
        when(col("event_id") < col("q"), 0L)
          .when(col("event_id") < col("q") * 2, 1L)
          .when(col("event_id") < col("q") * 3, 2L)
          .otherwise(3L))
      .drop("q")
    ev.join(states, Seq("version", "user_id"), "left")
      .select(col("event_id"), col("user_id"), col("version"),
        col("pit_seq"), col("pit_value"))
      .orderBy(col("event_id"))
  }

  private lazy val q193Sql: String =
    s"""WITH ${CdcSynth.synthSql},
       |qq AS (SELECT max(event_id) // 4 AS q FROM events),
       |ev AS (
       |  SELECT e.event_id, e.user_id,
       |    CASE WHEN e.event_id < q THEN 0
       |         WHEN e.event_id < q * 2 THEN 1
       |         WHEN e.event_id < q * 3 THEN 2
       |         ELSE 3 END AS version,
       |    CASE WHEN e.event_id < q THEN NULL
       |         WHEN e.event_id < q * 2 THEN q
       |         WHEN e.event_id < q * 3 THEN q * 2
       |         ELSE q * 3 END AS bnd
       |  FROM events e CROSS JOIN qq),
       |pitst AS (
       |  SELECT ev.event_id,
       |    max_by(c.has_new, c.seq) AS has_new,
       |    max(c.seq) AS seq,
       |    max_by(c.new_value, c.seq) AS value
       |  FROM ev JOIN cdc c
       |    ON COALESCE(c.new_user_id, c.old_user_id) = ev.user_id
       |    AND c.event_id < ev.bnd
       |  GROUP BY ev.event_id)
       |SELECT ev.event_id, ev.user_id, CAST(ev.version AS BIGINT) AS version,
       |  CASE WHEN a.has_new THEN a.seq END AS pit_seq,
       |  CASE WHEN a.has_new THEN a.value END AS pit_value
       |FROM ev LEFT JOIN pitst a ON a.event_id = ev.event_id
       |ORDER BY ev.event_id""".stripMargin

  /** q197: VERSION-CHURN panel — per commit transition of the quartered
    * history, how many keys were inserted / updated / deleted and the
    * churn rate against the destination state. This is the table-health
    * dial a pipeline owner watches per merge: a sudden churn spike means
    * an upstream re-send, a backfill, or a key-mapping bug — caught at
    * the version boundary, before consumers read it. Costs |feed| per
    * transition over the already-materialized version states. */
  def versionChurn(s: SparkSession, dir: String): DataFrame = {
    val root = ensureQuartered(s, dir)
    val rows = (1 to 2).map { v =>
      val feed = changeFeed(s, root, v, v + 1)
        .groupBy().agg(
          sum(when(col("change_op") === "INSERT", 1L).otherwise(0L)).as("n_insert"),
          sum(when(col("change_op") === "UPDATE", 1L).otherwise(0L)).as("n_update"),
          sum(when(col("change_op") === "DELETE", 1L).otherwise(0L)).as("n_delete"))
      val nTo = readVersion(s, root, v + 1)
        .agg(count(lit(1)).as("n_state_to"))
      feed.crossJoin(broadcast(nTo))
        .select(lit(v.toLong).as("from_version"), lit((v + 1).toLong).as("to_version"),
          col("n_insert"), col("n_update"), col("n_delete"), col("n_state_to"),
          expr("CAST(n_insert + n_update + n_delete AS DOUBLE) " +
            "/ CAST(n_state_to AS DOUBLE)").as("churn"))
    }
    rows.reduce(_ unionByName _).orderBy(col("from_version"))
  }

  private lazy val q197Sql: String = {
    def st(alias: String, bound: String) =
      s"""$alias AS (
         |  SELECT user_id, seq, value FROM (
         |    SELECT COALESCE(new_user_id, old_user_id) AS user_id,
         |      max(seq) AS seq, max_by(has_new, seq) AS has_new,
         |      max_by(new_value, seq) AS value
         |    FROM cdc, qq WHERE event_id < $bound GROUP BY 1) t
         |  WHERE has_new)""".stripMargin
    def trans(v: Int, a: String, b: String) =
      s"""SELECT CAST($v AS BIGINT) AS from_version, CAST(${v + 1} AS BIGINT) AS to_version,
         |  CAST(SUM(CASE WHEN x.user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_insert,
         |  CAST(SUM(CASE WHEN x.user_id IS NOT NULL AND y.user_id IS NOT NULL
         |    AND x.seq <> y.seq THEN 1 ELSE 0 END) AS BIGINT) AS n_update,
         |  CAST(SUM(CASE WHEN y.user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_delete,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $b) AS n_state_to,
         |  CAST(SUM(CASE WHEN x.user_id IS NULL OR y.user_id IS NULL
         |      OR x.seq <> y.seq THEN 1 ELSE 0 END) AS DOUBLE)
         |    / (SELECT CAST(COUNT(*) AS DOUBLE) FROM $b) AS churn
         |FROM $a x FULL OUTER JOIN $b y ON x.user_id = y.user_id""".stripMargin
    s"""WITH ${CdcSynth.synthSql},
       |qq AS (SELECT max(event_id) // 4 AS q FROM events),
       |${st("s1", "q")},
       |${st("s2", "q * 2")},
       |${st("s3", "q * 3")}
       |SELECT * FROM (
       |${trans(1, "s1", "s2")}
       |UNION ALL
       |${trans(2, "s2", "s3")}) u
       |ORDER BY from_version""".stripMargin
  }

  private lazy val q186Sql: String =
    s"""WITH ${CdcSynth.synthSql},
       |latest AS (
       |  SELECT COALESCE(new_user_id, old_user_id) AS user_id,
       |    max(seq) AS seq, max_by(has_new, seq) AS has_new,
       |    max_by(new_event_type, seq) AS event_type
       |  FROM cdc GROUP BY 1)
       |SELECT event_type, user_id FROM latest WHERE has_new
       |ORDER BY event_type, user_id""".stripMargin

  lazy val queries: Seq[Q] = Seq(
    Q("q182_time_travel", timeTravel, Some(q182Sql)),
    Q("q183_change_feed", versionDiff, Some(q183Sql)),
    Q("q186_maintained_index", maintainedTypeIndex, Some(q186Sql)),
    Q("q193_pit_join", pitJoin, Some(q193Sql)),
    Q("q197_version_churn", versionChurn, Some(q197Sql)))
}

object VersionedTableOps {
  lazy val queries: Seq[Q] = VersionedTableImpl.queries
}
