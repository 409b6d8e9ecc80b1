package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** INCREMENTAL connected components over the streaming candidate-pair flow
  * — the missing half of mid-stream dedup decisions: [[StreamDedup]] emits
  * cross-batch near-dup pairs, and this maintains the CLUSTER MEMBERSHIP
  * those pairs imply, so "is this document a duplicate, and of which
  * canonical cluster?" is answerable while the stream runs instead of
  * after a batch rebuild.
  *
  * Design: the component map is a versioned parquet table, folded forward
  * once per micro-batch inside `foreachBatch`. The fold runs min-label
  * propagation over (STAR EDGES of the previous map) ∪ (new pairs) — star
  * compression is the standard incremental-CC move: a component's members
  * all connect to its root, so connectivity is preserved while the carried
  * edge set stays one edge per member instead of the full pair history.
  * New pairs can link stars to each other or to fresh documents; the
  * propagation then settles in ≤ a few rounds because star diameter is 2.
  * Labels are the component MINIMUM doc id, so a late arrival with a
  * smaller id relabels its component exactly as the batch rebuild would —
  * fold-equals-rebuild is the invariant StreamComponentsSpec pins.
  *
  * Exactly-once across restarts: each fold reads the newest map version
  * with id < current batchId and OVERWRITES version batchId. A replayed
  * batch (checkpoint restart re-runs the last uncommitted batch with the
  * same id) therefore folds from the same predecessor and rewrites the
  * same version — idempotent, no double-merge, no gap.
  *
  * Scale shape: per batch the fold touches |previous map| + |batch pairs|
  * rows — the map is pair-graph-sized (documents that appear in some
  * near-dup pair), never the corpus; the propagation loop is the audited
  * q46 machinery with per-round checkpoint rolling.
  */
object StreamComponents {

  private val mapSchema = StructType(Seq(
    StructField("id", LongType), StructField("comp", LongType)))

  /** Empty map for the first fold. */
  def emptyMap(spark: SparkSession): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), mapSchema)

  /** Fold one batch of pairs (columns aId, bId) into the previous map. */
  def fold(prevMap: DataFrame, pairs: DataFrame): DataFrame = {
    val stars = prevMap.filter(col("id") =!= col("comp"))
      .select(col("id").as("a"), col("comp").as("b"))
    val edges = stars.union(pairs.select(col("aId").as("a"), col("bId").as("b")))
    graft.ops.DedupOpsImpl.connectedComponents(edges)
  }

  private def versionDirs(spark: SparkSession, mapRoot: String): Seq[(Long, String)] = {
    val root = new java.io.File(mapRoot)
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch_"))
      .map(f => (f.getName.stripPrefix("batch_").toLong, f.getPath)).toSeq
  }

  /** The newest committed map strictly BEFORE `batchId` (restart safety:
    * a replayed batch must not fold on top of its own partial output). */
  def mapBefore(spark: SparkSession, mapRoot: String, batchId: Long): DataFrame =
    versionDirs(spark, mapRoot).filter(_._1 < batchId).sortBy(-_._1).headOption
      .map { case (_, path) => spark.read.schema(mapSchema).parquet(path) }
      .getOrElse(emptyMap(spark))

  /** The newest map version — what a mid-stream dedup decision consults. */
  def latestMap(spark: SparkSession, mapRoot: String): DataFrame =
    versionDirs(spark, mapRoot).sortBy(-_._1).headOption
      .map { case (_, path) => spark.read.schema(mapSchema).parquet(path) }
      .getOrElse(emptyMap(spark))

  /** Run the maintenance loop over a candidate-pair stream (columns
    * aId, bId — [[StreamDedup.candidatePairs]] output). `AvailableNow`
    * drains what has arrived and stops; the checkpoint makes kill/restart
    * resume exactly-once. */
  def run(pairs: DataFrame, mapRoot: String, checkpointDir: String): StreamingQuery =
    pairs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val updated = fold(mapBefore(spark, mapRoot, batchId),
          batch.select(col("aId"), col("bId")).distinct())
        updated.write.mode("overwrite").parquet(s"$mapRoot/batch_$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
}
