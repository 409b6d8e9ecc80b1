package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.cdc.{Cdc, CdcSynth}

/** MERGE INTO for a parquet-backed materialized table — the production
  * shape of the K1 latest-per-key sink (reference:
  * KeyspacesViewTargetMapper.java applies the same latest-wins upsert/
  * delete per CDC record, row-at-a-time against Keyspaces; a lakehouse
  * deployment instead folds a CDC batch into a bucketed parquet table).
  * Two layers:
  *
  *  - [[mergeLatest]]: the pure MERGE algebra. `base` is the current
  *    table state (one row per key, carrying its version `last_seq`),
  *    `updates` is the latest-per-key reduction of the incoming batch
  *    (tombstones included). An update wins iff its sequence beats the
  *    base version (late/duplicate redelivery is a no-op — the merge is
  *    idempotent); a winning tombstone deletes the key; keys without
  *    updates pass through untouched. MATCHED/NOT-MATCHED emerge from
  *    one full-outer join on the key — at scale both sides hash-partition
  *    on the key, and with a bucketed base the join is co-located.
  *
  *  - [[cowMerge]]: copy-on-write against a `bucket=N/` partitioned
  *    parquet table. Only buckets containing update keys are READ
  *    (partition pruning on the bucket column) and only those buckets are
  *    REWRITTEN (dynamic partition overwrite); untouched bucket files are
  *    never opened — at 100 TB a merge costs O(touched buckets), not a
  *    table rewrite. A touched bucket whose keys all died is deleted
  *    outright (dynamic overwrite only replaces partitions present in the
  *    output, so an all-tombstone bucket would otherwise go stale —
  *    LakehouseSpec pins this case).
  *
  * The q179 gate proves the algebra against the ground truth: Spark
  * builds the table from the log's first half, MERGEs the second half,
  * and must hash-match DuckDB's single-shot replay of the FULL log — the
  * same maintained-view-equals-recompute discipline as q161's IVM gate,
  * with `from_base` marking rows the merge never touched.
  */
object LakehouseOpsImpl {

  /** Latest-per-key reduction of raw envelopes, tombstones KEPT (unlike
    * Cdc.replayLatest, which drops them — a merge needs the deletes). */
  def latestUpdates(env: DataFrame, keyCol: Column, seqCol: Column): DataFrame =
    env.groupBy(keyCol.as("user_id"))
      .agg(
        max_by(struct(col("metadata.stream_operation_type").as("op"), col("image")),
          seqCol).as("ulast"),
        max(seqCol).as("u_seq"))

  /** Pure MERGE: fold `updates` (from [[latestUpdates]]) into `base`
    * (columns user_id, last_op, last_seq, then payload columns).
    * Emits the new table state plus `from_base` (row untouched).
    *
    * Schema EVOLUTION is handled here, not by a migration job: the output
    * payload is the UNION of the base's payload columns and the update
    * image's fields (reference parity — the Avro converter re-infers its
    * schema from each batch, AbstractAvroConverter.java:339-394, so a CDC
    * stream can grow columns mid-flight). A column the other side lacks
    * null-fills: base rows predate the new column; an update image is a
    * FULL row image, so a field it no longer carries reads as null. */
  def mergeLatest(base: DataFrame, updates: DataFrame): DataFrame =
    // winning tombstone deletes (physical removal): delete-family ops are
    // exactly the no-new-image envelopes (StreamHelpers op derivation)
    mergeLatestKeepTombstones(base, updates)
      .filter(!(col("last_op").isin(DeleteOps: _*) && !col("from_base")))

  /** Operation types whose winning row is a TOMBSTONE (no new image). */
  val DeleteOps: Seq[String] = Seq("DELETE", "REPLICATED_DELETE", "TTL")

  /** [[mergeLatest]] with LOGICAL deletes: a winning tombstone stays in
    * the output as a row carrying its op and SEQUENCE with null payload,
    * instead of vanishing. This is what makes latest-wins merges
    * confluent for deletes under out-of-order (concurrent-writer)
    * delivery: a later-committing lower-seq upsert still LOSES against
    * the retained tombstone version, where physical removal would let it
    * resurrect the key. The versioned table commits through this variant
    * and filters tombstones at its read surface; the flat COW path keeps
    * physical deletes (its streams are per-key ordered by contract). */
  def mergeLatestKeepTombstones(base: DataFrame, updates: DataFrame): DataFrame = {
    val meta = Set("user_id", "last_op", "last_seq")
    val basePayload = base.columns.filterNot(meta.contains).toSeq
    val imgType = updates.schema("ulast").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("image").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val upPayload = imgType.fieldNames.toSeq.filterNot(_ == "user_id")
    val payload = basePayload ++ upPayload.filterNot(basePayload.contains)
    val joined = base.join(updates, Seq("user_id"), "full_outer")
    val useUpdate = col("u_seq").isNotNull &&
      (col("last_seq").isNull || col("u_seq") > col("last_seq"))
    val payloadCols = payload.map { f =>
      val fromUpdate =
        if (upPayload.contains(f)) col(s"ulast.image.$f")
        else lit(null).cast(base.schema(f).dataType)
      val fromBase =
        if (basePayload.contains(f)) col(f)
        else lit(null).cast(imgType(f).dataType)
      when(useUpdate, fromUpdate).otherwise(fromBase).as(f)
    }
    joined.select(
      Seq(col("user_id"),
        when(useUpdate, col("ulast.op")).otherwise(col("last_op")).as("last_op"),
        when(useUpdate, col("u_seq")).otherwise(col("last_seq")).as("last_seq")) ++
      payloadCols :+ (!useUpdate).as("from_base"): _*)
  }

  private def keyOf = coalesce(col("image.user_id"), col("oldImage.user_id"))
  private def seqOf = col("metadata.stream_sequence_number")

  /** Project the replayed state into the table schema. */
  private def asTable(replayed: DataFrame): DataFrame =
    replayed.select(col("key").as("user_id"), col("last.op").as("last_op"),
      col("last_seq"), col("last.image.event_type").as("event_type"),
      col("last.image.value").as("value"), col("last.image.k").as("k"))

  /** q179: build the MV from the log's first half, MERGE the second half.
    * Must equal DuckDB's one-shot full replay. */
  def mergeReplay(s: SparkSession, dir: String): DataFrame = {
    val env = CdcSynth.fromEvents(s, dir)
    val mid = Tables(s, dir, "events")
      .agg(expr("max(event_id) div 2").as("mid"))
    val withMid = env.crossJoin(broadcast(mid))
    val base = asTable(Cdc.replayLatest(
      withMid.filter(col("event_id") < col("mid")), keyOf, seqOf))
    val tail = withMid.filter(col("event_id") >= col("mid"))
    mergeLatest(base, latestUpdates(tail, keyOf, seqOf))
      .orderBy(col("user_id"))
  }

  /** Copy-on-write MERGE of an envelope batch into a `bucket=`-partitioned
    * parquet table at `basePath`. Returns the touched bucket ids.
    *
    * Commit protocol (stage-then-swap): the merged output is written ONCE
    * to a dot-prefixed staging dir inside the table (Spark's file listing
    * skips `.`/`_` paths, so concurrent readers never see it). The lazy
    * merge plan — which reads the CURRENT base files — fully executes
    * during that staging write, strictly before any base file is deleted;
    * only then are touched bucket dirs swapped out via filesystem renames.
    * A touched bucket absent from the staging output (every resident key
    * tombstoned) is simply deleted. One data write, no plan ever
    * re-executes against removed files, and untouched buckets are never
    * opened: a merge costs O(touched buckets) at any table size. */
  def cowMerge(s: SparkSession, basePath: String, env: DataFrame,
      nBuckets: Int): Seq[Long] = {
    val updates = latestUpdates(env, keyOf, seqOf)
      .withColumn("bucket", pmod(col("user_id"), lit(nBuckets.toLong)))
    val touched = updates.select(col("bucket")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted // <= nBuckets rows: metadata
    if (touched.isEmpty) return touched
    val base = readBase(s, basePath, touched)
    val merged = mergeLatest(base, updates.drop("bucket"))
      .drop("from_base")
      .withColumn("bucket", pmod(col("user_id"), lit(nBuckets.toLong)))
    stageSwap(s, basePath, merged, touched)
    touched
  }

  /** Stage-then-swap commit shared by [[cowMerge]] and [[compactBuckets]]:
    * write `df` (carrying the `bucket` column) ONCE to a dot-prefixed
    * staging dir — which fully executes any lazy plan over the current base
    * files before anything is deleted — then swap each touched bucket dir.
    *
    * Each bucket transition is two RENAMES, not a recursive delete then a
    * rename: the old dir moves aside into the (dot-prefixed, listing-
    * invisible) staging dir, the staged dir moves in, and the aside copies
    * are deleted only after every bucket has swapped. A reader listing the
    * table mid-swap can still observe a touched bucket absent for the
    * instant between the two renames (and a scan planned before the swap
    * still loses its old files — flat COW has no snapshot isolation; the
    * versioned table's manifests exist for readers that need it), but the
    * window is two metadata ops per bucket instead of an unbounded
    * recursive delete. */
  private def stageSwap(s: SparkSession, basePath: String, df: DataFrame,
      touched: Seq[Long]): Unit = {
    val fs = new Path(basePath).getFileSystem(s.sparkContext.hadoopConfiguration)
    val staging = new Path(basePath,
      s".cow_staging_${java.util.UUID.randomUUID().toString.replace("-", "")}")
    // rename reports failure by RETURNING false (HDFS semantics) — a
    // silently failed swap here is data loss, because the cleanup sweep
    // would then delete the aside copy (the only remaining pre-merge data)
    def loudRename(src: Path, dst: Path): Unit =
      if (!fs.rename(src, dst))
        throw new IllegalStateException(s"bucket swap rename failed: $src -> $dst")
    var asides = false // any old bucket already moved into staging?
    try {
      df.write.mode("overwrite").partitionBy("bucket").parquet(staging.toString)
      val survived = fs.listStatus(staging)
        .map(_.getPath.getName).filter(_.startsWith("bucket="))
        .map(_.stripPrefix("bucket=").toLong).toSet
      touched.foreach { b => // swap: old aside, staged in — renames only
        val live = new Path(s"$basePath/bucket=$b")
        val movedAside = fs.exists(live)
        if (movedAside) {
          loudRename(live, new Path(staging, s"old_bucket=$b"))
          asides = true
        }
        if (survived(b)) {
          try loudRename(new Path(staging, s"bucket=$b"), live)
          catch { case e: Throwable =>
            // the aside just moved is the ONLY copy of this bucket's
            // pre-merge data and the table is currently serving the bucket
            // as empty — restore it best-effort before propagating, so a
            // failed move-in degrades to "merge aborted" instead of a
            // silent hole that only manual staging-dir surgery can fix
            if (movedAside &&
                fs.rename(new Path(staging, s"old_bucket=$b"), live))
              asides = touched.exists { o =>
                o != b && fs.exists(new Path(staging, s"old_bucket=$o"))
              }
            throw e
          }
        }
      }
      fs.delete(staging, true) // asides + leftovers go in one sweep
    } catch { case e: Throwable =>
      // before any aside moved (or after every aside rolled back), staging
      // holds only half-written output — safe to clean; otherwise staging
      // holds the ONLY copy of some pre-merge buckets, so it is LEFT IN
      // PLACE for recovery (the dot-prefix keeps it invisible to table
      // listings either way) and its path is logged loudly so the preserved
      // copy is discoverable without filesystem archaeology
      if (!asides) fs.delete(staging, true)
      else org.slf4j.LoggerFactory.getLogger(getClass).error(
        s"COW bucket swap failed mid-publish; pre-merge bucket copies " +
          s"preserved under $staging (old_bucket=N dirs) — restore by " +
          s"renaming them back to $basePath/bucket=N", e)
      throw e
    }
  }

  /** Parquet file count per bucket id — driver-side metadata listing. */
  def bucketFileCounts(s: SparkSession, basePath: String): Map[Long, Int] = {
    val p = new Path(basePath)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.listStatus(p)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("bucket="))
      .map(st => st.getPath.getName.stripPrefix("bucket=").toLong ->
        fs.listStatus(st.getPath).count(_.getPath.getName.endsWith(".parquet")))
      .toMap
  }

  /** Compact buckets holding more than `maxFiles` parquet files — the
    * classic lakehouse small-files problem: each [[cowMerge]] writes one
    * new file per touched bucket, so after K merges a hot bucket holds K
    * small files and every read pays K footer fetches. Rewrite is
    * bucket-scoped and deterministic: only over-threshold buckets are read
    * (partition pruning) and each lands as ONE file
    * (`repartition(n, bucket)` puts a bucket's rows in a single task).
    * Pure layout change — row content is untouched, which the q180 gate
    * proves by hash-matching the compacted table against the DuckDB
    * full-log replay. Returns the compacted bucket ids. */
  def compactBuckets(s: SparkSession, basePath: String,
      maxFiles: Int): Seq[Long] =
    compactBuckets(s, basePath, maxFiles, Nil)

  /** Compaction with CLUSTERING: rows sort by `sortCols` within each
    * bucket during the rewrite, so when a bucket lands as several files
    * (row-count/size caps at scale) their per-file min/max column ranges
    * are DISJOINT — parquet footer stats then skip whole files for
    * predicates on the sort prefix, the same win the q126/q151 layout
    * panels measure for Z-order/Hilbert scans, applied to the COW table's
    * maintenance path. Sorting is within partitions only (each bucket is
    * one task after the repartition) — no global shuffle beyond the
    * bucket routing, and a pure layout change: the q191 gate hash-matches
    * the clustered table against the full-log replay. */
  def compactBuckets(s: SparkSession, basePath: String, maxFiles: Int,
      sortCols: Seq[String]): Seq[Long] = {
    val over = bucketFileCounts(s, basePath)
      .filter(_._2 > maxFiles).keys.toSeq.sorted
    if (over.isEmpty) return over
    val base = s.read.option("mergeSchema", "true").parquet(basePath)
      .filter(col("bucket").isin(over: _*)) // partition-pruned read
      .repartition(over.length, col("bucket"))
    val df =
      if (sortCols.isEmpty) base
      else base.sortWithinPartitions(col("bucket") +: sortCols.map(col): _*)
    stageSwap(s, basePath, df, over)
    over
  }

  /** Table schema of the bucketed base (bucket column excluded). */
  val tableSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("last_op",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("last_seq",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))

  /** Partition-pruned read of the touched buckets; an absent/empty table
    * (first micro-batch of a stream bootstrapping the store) reads as the
    * empty state so MERGE doubles as CREATE. */
  private def readBase(s: SparkSession, basePath: String,
      touched: Seq[Long]): DataFrame = {
    val p = new Path(basePath)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.startsWith("bucket="))
    if (!hasData)
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        tableSchema)
    else s.read.option("mergeSchema", "true").parquet(basePath)
      .filter(col("bucket").isin(touched: _*)) // partition-pruned read
      .drop("bucket")
  }

  /** Read the COW table under its UNION schema: buckets written before a
    * column arrived null-fill it (parquet schema merge). */
  def readTable(s: SparkSession, basePath: String): DataFrame =
    s.read.option("mergeSchema", "true").parquet(basePath)

  /** POINT LOOKUPS on the bucketed table — the serving-path read: each
    * key's bucket derives from the key itself (the same pmod that routed
    * the write), so the scan partition-prunes to ≤ |keys| bucket dirs
    * before any row is read; within them the key predicate pushes to the
    * parquet footers (and rides q191's clustered min/max when present).
    * At 100 TB a k-key lookup therefore opens O(k) buckets' files, never
    * the table. */
  def lookup(s: SparkSession, basePath: String, keys: Seq[Long],
      nBuckets: Int): DataFrame = {
    val buckets = keys.map(k => math.floorMod(k, nBuckets).toLong).distinct.sorted
    readTable(s, basePath)
      .filter(col("bucket").isin(buckets: _*) && col("user_id").isin(keys: _*))
  }

  /** q194: a 20-key lookup against the compacted q180 table — must
    * hash-match DuckDB replaying the log for just those keys. */
  def pointLookups(s: SparkSession, dir: String): DataFrame = {
    val keys = (0L until 20L).map(_ * 7L)
    lookup(s, ensureCompactedTable(s, dir), keys, 8)
      .select(col("user_id"), col("last_op"), col("last_seq"),
        col("event_type"), col("value"), col("k"))
      .orderBy(col("user_id"))
  }

  private lazy val q194Sql: String = {
    val keys = (0L until 20L).map(_ * 7L).mkString("(", ", ", ")")
    s"""WITH ${CdcSynth.synthSql},
       |latest AS (
       |  SELECT COALESCE(new_user_id, old_user_id) AS user_id,
       |    max_by(op, seq) AS last_op, max(seq) AS last_seq,
       |    max_by(has_new, seq) AS has_new,
       |    max_by(new_event_type, seq) AS event_type,
       |    max_by(new_value, seq) AS value,
       |    max_by(new_k, seq) AS k
       |  FROM cdc GROUP BY 1)
       |SELECT user_id, last_op, last_seq, event_type, value, k
       |FROM latest WHERE has_new AND user_id IN $keys
       |ORDER BY user_id""".stripMargin
  }

  /** Write a table state as the bucketed base for [[cowMerge]]. */
  def writeBucketed(df: DataFrame, basePath: String, nBuckets: Int,
      options: Map[String, String] = Map.empty): Unit =
    df.withColumn("bucket", pmod(col("user_id"), lit(nBuckets.toLong)))
      .repartition(col("bucket"))
      .write.mode("overwrite").options(options)
      .partitionBy("bucket").parquet(basePath)

  /** Parquet writer options arming a PER-COLUMN BLOOM FILTER on the key:
    * footer-level membership pruning for point lookups on top of bucket
    * pruning and min/max — a miss inside a bucket is answered from the
    * footer without touching a row group. ~1.2 bits/key of file overhead
    * at the default FPP; the right default for a SERVING snapshot
    * ([[VersionedTableImpl.exportVersion]] sets it), the wrong one for
    * write-hot staging files (every COW staging write would pay the
    * build). */
  def keyBloomOptions(expectedKeys: Long): Map[String, String] = Map(
    "parquet.bloom.filter.enabled#user_id" -> "true",
    "parquet.bloom.filter.expected.ndv#user_id" -> expectedKeys.toString)

  // ------------------------------------------------------------ q180 gate
  /** One COW table per (session, corpus dir), built the way production
    * would: three successive [[cowMerge]] batches (thirds of the event log
    * by event_id — each touched bucket accretes up to three files), then
    * [[compactBuckets]] down to one file per bucket. The build REQUIREs
    * that compaction actually had work to do and actually did it, so the
    * gate fails loudly if the small-files condition ever stops being
    * exercised. */
  private val cowRoots = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  def clearCaches(): Unit = { cowRoots.clear(); clusteredRoots.clear() }

  private[graft] def ensureCompactedTable(s: SparkSession, dir: String): String =
    Memo.getOrCacheAny(cowRoots, s, dir, { _ =>
      val root = java.nio.file.Files.createTempDirectory("graft_cow_table").toString
      val env = CdcSynth.fromEvents(s, dir)
      val ids = Tables(s, dir, "events")
        .agg(max(col("event_id")).as("mx"),
          countDistinct(col("user_id")).as("nu")).head() // single-row metadata
      val (maxId, nUsers) = (ids.getLong(0), ids.getLong(1))
      val (t1, t2) = (maxId / 3, 2 * maxId / 3)
      // cap records per file during the merges: at cluster scale every
      // write task drops its own file into each bucket dir, but local
      // test data AQE-coalesces to one task — the cap recreates the
      // many-small-files layout compaction exists for, deterministically.
      // Sized to ~4 files per bucket so the build cost stays flat in SF
      // (a fixed cap of 1 wrote |users| files per merge at sf0.1).
      val cap = math.max(1L, nUsers / 32)
      val prev = s.conf.get("spark.sql.files.maxRecordsPerFile", "0")
      s.conf.set("spark.sql.files.maxRecordsPerFile", cap.toString)
      try {
        cowMerge(s, root, env.filter(col("event_id") <= t1), 8)
        cowMerge(s, root, env.filter(col("event_id") > t1 && col("event_id") <= t2), 8)
        cowMerge(s, root, env.filter(col("event_id") > t2), 8)
      } finally s.conf.set("spark.sql.files.maxRecordsPerFile", prev)
      val pre = bucketFileCounts(s, root)
      require(pre.values.exists(_ > 1),
        s"small-files precondition lost: every bucket already compact ($pre)")
      compactBuckets(s, root, maxFiles = 1)
      val post = bucketFileCounts(s, root)
      require(post.values.forall(_ == 1) && post.keySet == pre.keySet,
        s"compaction must leave one file per bucket, same buckets: $pre -> $post")
      root
    })

  /** q180: the compacted COW table read back — must hash-equal DuckDB's
    * one-shot replay of the full log (compaction is a pure layout change;
    * incremental merges converge to the batch answer). */
  def compactedTable(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(ensureCompactedTable(s, dir))
      .select(col("user_id"), col("last_op"), col("last_seq"),
        col("event_type"), col("value"), col("k"))
      .orderBy(col("user_id"))

  /** One CLUSTERED table per (session, dir): the q180 build re-compacted
    * with a (event_type, user_id) sort and a record cap that forces each
    * bucket into several files — whose event_type ranges are then
    * disjoint (LakehouseSpec pins the min/max stats). */
  private val clusteredRoots = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  private def ensureClusteredTable(s: SparkSession, dir: String): String =
    Memo.getOrCacheAny(clusteredRoots, s, dir, { _ =>
      val root = java.nio.file.Files.createTempDirectory("graft_cow_clustered").toString
      val env = CdcSynth.fromEvents(s, dir)
      cowMerge(s, root, env, 8)
      val nUsers = s.read.parquet(root).count() // table rows, metadata agg
      val cap = math.max(1L, nUsers / 32)
      val prev = s.conf.get("spark.sql.files.maxRecordsPerFile", "0")
      s.conf.set("spark.sql.files.maxRecordsPerFile", cap.toString)
      try compactBuckets(s, root, maxFiles = 0,
        sortCols = Seq("event_type", "user_id"))
      finally s.conf.set("spark.sql.files.maxRecordsPerFile", prev)
      root
    })

  /** q191: the CLUSTERED table read back — rows hash-equal the replay
    * (clustering is pure layout), while the per-file sort gives each
    * bucket's files disjoint event_type ranges for footer skipping. */
  def clusteredTable(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(ensureClusteredTable(s, dir))
      .select(col("user_id"), col("last_op"), col("last_seq"),
        col("event_type"), col("value"), col("k"))
      .orderBy(col("user_id"))

  private lazy val q180Sql: String =
    s"""WITH ${CdcSynth.synthSql},
       |latest AS (
       |  SELECT COALESCE(new_user_id, old_user_id) AS user_id,
       |    max_by(op, seq) AS last_op,
       |    max(seq) AS last_seq,
       |    max_by(has_new, seq) AS has_new,
       |    max_by(new_event_type, seq) AS event_type,
       |    max_by(new_value, seq) AS value,
       |    max_by(new_k, seq) AS k
       |  FROM cdc GROUP BY 1)
       |SELECT user_id, last_op, last_seq, event_type, value, k
       |FROM latest WHERE has_new ORDER BY user_id""".stripMargin

  private lazy val q179Sql: String =
    s"""WITH ${CdcSynth.synthSql},
       |mid AS (SELECT max(event_id) // 2 AS mid FROM events),
       |full_latest AS (
       |  SELECT COALESCE(new_user_id, old_user_id) AS user_id,
       |    max_by(op, seq) AS last_op,
       |    max(seq) AS last_seq,
       |    max_by(has_new, seq) AS has_new,
       |    max_by(new_event_type, seq) AS event_type,
       |    max_by(new_value, seq) AS value,
       |    max_by(new_k, seq) AS k
       |  FROM cdc GROUP BY 1),
       |touched AS (
       |  SELECT DISTINCT COALESCE(new_user_id, old_user_id) AS user_id
       |  FROM cdc, mid WHERE event_id >= mid)
       |SELECT f.user_id, f.last_op, f.last_seq, f.event_type, f.value, f.k,
       |  t.user_id IS NULL AS from_base
       |FROM full_latest f LEFT JOIN touched t USING (user_id)
       |WHERE f.has_new ORDER BY f.user_id""".stripMargin

  lazy val queries: Seq[Q] = Seq(
    Q("q179_cdc_merge_cow", mergeReplay, Some(q179Sql), headline = true),
    Q("q180_cdc_compact", compactedTable, Some(q180Sql)),
    // same oracle as q180 on purpose: clustering is a pure layout change
    Q("q191_cdc_clustered_compact", clusteredTable, Some(q180Sql)),
    Q("q194_cdc_point_lookup", pointLookups, Some(q194Sql)))
}

/** Registry hook. */
object LakehouseOps {
  lazy val queries: Seq[Q] = LakehouseOpsImpl.queries
}
