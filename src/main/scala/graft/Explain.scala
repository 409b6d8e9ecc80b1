package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection helper (not part of the driver contract): print the
  * formatted physical plan of registry queries without executing them.
  * `runMain graft.Explain <sfDir> <name-prefix...>`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val prefixes = if (args.length > 1) args.drop(1).toSeq else Seq("")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.all.filter(q => prefixes.exists(q.name.startsWith)).foreach { q =>
      println(s"========== ${q.name} ==========")
      q.fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
