package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cdc.CdcSynth
import graft.sources.ShardLog

/** Record the synthetic CDC envelope of the `events` table into a shard log
  * directory consumable by the `shardlog` MicroBatchStream — the offline
  * stand-in for "a Kinesis stream was recorded to disk".
  *
  * Usage: `runMain graft.RecordShardLog <eventsDir> <logDir> [numShards=8]`
  * then:  `runMain graft.StreamMain <conf with source=shardlog> <logDir> <outDir>`
  */
object RecordShardLog {
  def main(args: Array[String]): Unit = {
    val Array(eventsDir, logDir) = args.take(2)
    val numShards = args.lift(2).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val env = CdcSynth.fromEvents(spark, eventsDir)
    // shard identity must survive DELETEs (image is null there) — key on
    // whichever image carries the row, like the reference's partition key
    ShardLog.record(env, logDir,
      pmod(coalesce(col("image.user_id"), col("oldImage.user_id")), lit(numShards.toLong)))
    val counts = ShardLog.shardCounts(logDir)
    println(s"[record] ${counts.values.sum} records in ${counts.size} shards at $logDir")
    spark.stop()
  }
}
