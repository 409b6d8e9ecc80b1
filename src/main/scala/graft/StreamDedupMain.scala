package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._

import graft.streaming.StreamDedup

/** Streaming curation demo: incremental near-dup detection over a
  * documents stream. File-streams parquet documents (drop new files into
  * `<docsDir>` to extend the stream; the same code runs against any
  * streaming source producing (doc_id, text)) and appends candidate
  * near-dup pairs to `<outDir>` as parquet, checkpointed — kill and
  * restart resumes with bucket state intact.
  *
  * Usage: `runMain graft.StreamDedupMain <docsDir> <outDir> <checkpointDir>`
  * (`docsDir` is a DIRECTORY of parquet files — Spark's file source
  * requires one; stage single files into a directory first).
  */
object StreamDedupMain {

  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def main(args: Array[String]): Unit = {
    val Array(docsDir, outDir, ckptDir) = args.take(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.readStream.schema(docsSchema).parquet(docsDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
    val q = StreamDedup.candidatePairs(docs)
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
    q.awaitTermination()
    spark.stop()
  }
}
