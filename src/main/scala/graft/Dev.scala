package graft

import org.apache.spark.sql.SparkSession

/** Fast iteration helper (not part of the driver contract): run a subset of
  * queries by name prefix. `runMain graft.Dev <sfDir> <outDir> [prefix...]`
  * — any number of prefixes, a query runs if it matches any of them.
  */
object Dev {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val prefixes = if (args.length > 2) args.drop(2).toSeq else Seq("")
    val cpus = Cpus(default = 8)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val repeat = sys.env.getOrElse("SPARK_GRAFT_DEV_REPEAT", "1").toInt
    val selected = Registry.all.filter(q => prefixes.exists(q.name.startsWith))
    selected.foreach { q =>
      (1 to repeat).foreach { r =>
        val t0 = System.nanoTime()
        try {
          // no coalesce(1): it would collapse the whole query into ONE task
          // and make every timing here look serial
          q.fn(spark, sfDir).write.mode("overwrite").parquet(s"$outDir/${q.name}")
          println(f"[dev] ${q.name} ok in ${(System.nanoTime() - t0) / 1e9}%.1fs" +
            (if (repeat > 1) s" (run $r)" else ""))
        } catch {
          case e: Throwable => println(s"[dev] ${q.name} FAILED: ${e.getMessage.take(300)}")
        }
      }
    }
    // Same escaping as Verify — subset oracle for tools/oracle_check.py.
    def esc(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = selected.flatMap(q => q.oracle.map(o => s"${esc(q.name)}: ${esc(o)}"))
      .mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
