package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.cdc.CdcSynth
import graft.config.GraftConfig
import graft.streaming.{Pipeline, Sinks}

/** Streaming app assembly — the Spark analogue of the reference's
  * `KCLMainRunner` (KCLMainRunner.java:25-102): resolve config, build the
  * source, wire filter → projection → sink, run with checkpointing.
  *
  * Usage: `runMain graft.StreamMain <conf.hocon> <eventsDir> <outDir>`
  *
  * The source here is Spark's file streaming source over the events parquet
  * (offline stand-in for the Kinesis/Keyspaces-CDC stream — SURVEY.md §2.1
  * S1: same envelope, same TRIM_HORIZON-like "earliest" semantics; a real
  * deployment swaps `readStream.format("kinesis")` behind the same
  * envelope transform).
  */
object StreamMain {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos-as-long (TESTDATA parquet)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def main(args: Array[String]): Unit = {
    val Array(confPath, eventsDir, outDir) = args.take(3)
    val conf = GraftConfig.load(confPath)
    val settings = GraftConfig.connector(conf)
    val sinkName = conf.get(s"${GraftConfig.Root}.connector.sink", "file")

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val raw = spark.readStream.schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet").parquet(eventsDir)
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    val env = CdcSynth.envelope(raw)

    val registry = new Sinks.SinkRegistry()
      .register("file", Sinks.fileSink(s"$outDir/data", "json", settings.timestampPartition))
      .register("console", (batch, id) => batch.show(5, truncate = false))

    val query = Pipeline.run(env, settings, CdcSynth.imageSchema,
      registry(sinkName), s"$outDir/checkpoint", Trigger.AvailableNow()).start()
    query.awaitTermination()
    val n = spark.read.json(s"$outDir/data").count()
    println(s"[stream] wrote $n records to $outDir/data")
    spark.stop()
  }
}
