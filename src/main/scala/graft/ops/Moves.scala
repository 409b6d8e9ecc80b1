package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Staged-file publication — the rename step that moves a commit's staged
  * `bucket=`-partitioned files to their immutable version-scoped names
  * under `data/`.
  *
  * Two properties both commit paths (COW [[VersionedTableImpl]] commitLoop,
  * MOR [[MorTableImpl]] moveStaged) get from routing through here:
  *
  *  - **Loud failure.** `FileSystem.rename` reports failure by RETURNING
  *    false (HDFS semantics), not by throwing. The previous inline loops
  *    ignored the return value, so a failed move would publish a manifest
  *    naming a file that is not there — silent corruption surfacing as a
  *    read error much later. A false return now aborts the commit; the
  *    already-moved files are unreferenced and vacuum-eligible, exactly
  *    like a lost optimistic race.
  *  - **Executor fan-out past a threshold.** A trickle commit moves a
  *    handful of files — a driver loop is optimal. A FAT commit (initial
  *    load, compaction rewrite) moves O(files-in-batch): serial driver
  *    renames are O(files) round-trips to the namenode/store — minutes of
  *    dead time at 10k+ files on an object store where "rename" is a
  *    copy. Past [[DistributeOver]] pairs the renames ship to executors
  *    (the same [[SerializableHadoopConf]] envelope vacuum's distributed
  *    listing/deletes use), so move latency scales with the cluster like
  *    the data write itself did. Commit METADATA stays O(batch) either
  *    way — this bounds the move's wall-clock, not its bookkeeping.
  *
  * The caller keeps driver-side `mkdirs` of the O(touched-buckets) dest
  * dirs (rename does not create parents on HDFS/local) and builds manifest
  * rows from pre-move `listStatus` metadata, so executors only rename.
  */
private[ops] object Moves {

  /** Above this many pairs the renames run as a Spark job. Sized so every
    * trickle/maintenance commit stays a driver loop (no job-scheduling
    * overhead on the hot commit path) and only genuinely fat batches fan
    * out. */
  val DistributeOver = 64

  private def doRename(fs: org.apache.hadoop.fs.FileSystem,
      src: Path, dst: Path): Unit =
    if (!fs.rename(src, dst)) {
      // Retry-safe under Spark task retry/speculation: destination names are
      // unique and version-scoped (no other writer ever targets dst), so a
      // missing source WITH the destination present can only mean a prior
      // attempt of this same move already succeeded before its task died.
      // Without this, a partial task failure on a big cluster re-runs the
      // slice, the retry finds src gone, and the whole commit aborts even
      // though every move landed. The inference is safe ONLY because dst
      // names are publisher-unique (Spark part-file job uuids under
      // version-scoped prefixes) — logged loudly so a future caller with
      // deterministic names that masks a collision here is observable in
      // the executor logs rather than silently committing a stale file.
      if (!fs.exists(src) && fs.exists(dst)) {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"staged-file rename inferred already-done by a prior attempt " +
            s"(source gone, destination present): $src -> $dst")
        return
      }
      throw new IllegalStateException(
        s"staged-file publish rename failed (source missing or destination " +
          s"occupied): $src -> $dst")
    }

  /** Rename every (src, dst) pair, throwing on the first failure. */
  def renameAll(s: SparkSession, pairs: Seq[(Path, Path)]): Unit = {
    if (pairs.isEmpty) return
    if (pairs.size <= DistributeOver) {
      // Resolve the FileSystem per source path (Hadoop caches instances, so
      // this is a map lookup) — a caller mixing schemes must not silently
      // rename against the head pair's FS.
      val conf = s.sparkContext.hadoopConfiguration
      pairs.foreach { case (src, dst) =>
        doRename(src.getFileSystem(conf), src, dst)
      }
    } else {
      val conf = new SerializableHadoopConf(s.sparkContext.hadoopConfiguration)
      val strs = pairs.map { case (src, dst) => (src.toString, dst.toString) }
      // ~16 renames per task: enough to amortize task launch, small enough
      // to spread a fat batch across the cluster
      val slices = math.min(
        math.max(1, strs.size / 16), s.sparkContext.defaultParallelism)
      s.sparkContext.parallelize(strs, slices).foreachPartition { it =>
        val c = conf.value
        it.foreach { case (a, b) =>
          val src = new Path(a)
          doRename(src.getFileSystem(c), src, new Path(b))
        }
      }
    }
  }
}
