package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through the driver's correctness gate.
  *
  * @param name    stable query id (key in SparkEntry.queries / oracleSql)
  * @param fn      (session, sfDir) => result DataFrame
  * @param oracle  equivalent DuckDB SQL over the same parquet tables;
  *                None => driver records a weaker rows-only check
  * @param headline include in Bench headline timings
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

object Tables {
  /** Load a driver-generated parquet table from the given sf dir.
    *
    * `events.parquet` carries TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects; we read nanos as long (legacy conf) and rebuild a microsecond
    * TimestampType column with integer arithmetic (`div`, not `/` — an epoch
    * in nanos exceeds double's 2^53 exact-integer range).
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.expr.DotF64.register(spark) // ops emit dotf64(...) SQL; see its scaladoc
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      // The driver has shipped ts as TIMESTAMP(NANOS) (readable only as
      // long under the legacy conf) and as plain TIMESTAMP(MICROS) (read
      // as TIMESTAMP_NTZ) in different rounds — normalize either encoding
      // to session-zone TimestampType (UTC everywhere in this repo).
      import org.apache.spark.sql.types.{LongType, TimestampType}
      df.schema("ts").dataType match {
        case LongType =>
          df.withColumn("ts",
            org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
        case TimestampType => df
        case _ => // TIMESTAMP_NTZ: wall-clock == instant under UTC session tz
          df.withColumn("ts",
            org.apache.spark.sql.functions.col("ts").cast(TimestampType))
      }
    } else df
  }
}

/** Aggregates every module's query list into the driver contract. */
object Registry {
  lazy val all: Seq[Q] =
    ops.Relational.queries ++
      ops.CdcQueries.queries ++
      ops.TextOps.queries ++
      ops.DedupOps.queries ++
      ops.VectorOps.queries ++
      ops.MultimodalOps.queries ++
      ops.LayoutOpsImpl.queries ++
      ops.BpeOpsImpl.queries

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
