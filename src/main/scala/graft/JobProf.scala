package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only profiler (not part of the driver contract): run selected bench
  * entries (`index:<name>` or query names, comma-separated; prefix match)
  * with a SparkListener attached and report, per entry:
  *   - wall seconds,
  *   - number of Spark jobs and their summed wall time,
  *   - driver gap = wall − Σ(job wall): planning, codegen compilation,
  *     driver-side metadata work, memo bookkeeping,
  *   - per-stage task-time sums for the slowest jobs.
  * This is the measurement §1 of the optimization guide asks for before
  * touching anything: it separates "the cluster is computing" from "the
  * driver is thinking", which a bare wall-clock number conflates.
  *
  * `runMain graft.JobProf <sfDir> <entry-prefix>[,<entry-prefix>...]`
  */
object JobProf {
  private final case class JobRec(id: Int, start: Long, var end: Long = 0L,
      var desc: String = "")

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val prefixes = args(1).split(",").map(_.trim).toSeq
    val cpus = Cpus(default = 32)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_SPLIT_BYTES", "1m"))
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", "64k"))
      .config("spark.sql.files.minPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITIONS", "1"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val stageTaskMs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val r = JobRec(e.jobId, e.time)
        r.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short"))))
          .filter(_.nonEmpty)
          .orElse(e.stageInfos.lastOption.map(_.name))
          .getOrElse("")
        jobs.put(e.jobId, r)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stageTaskMs.put(e.stageInfo.stageId,
          e.stageInfo.taskMetrics.executorRunTime)
      }
    })

    // warm-up, as Bench does
    Tables(spark, sfDir, "lineitem").limit(10)
      .write.format("noop").mode("overwrite").save()

    def runEntry(name: String, body: () => Unit): Unit = {
      jobs.clear()
      stageTaskMs.clear()
      val t0 = System.nanoTime()
      body()
      val wallS = (System.nanoTime() - t0) / 1e9
      // the listener bus is async: give it a moment to drain before
      // reading, else late job-end/stage events are dropped by the end>0
      // filter below (waitUntilEmpty is private[spark]; dev-only tool)
      Thread.sleep(300L)
      val ended = {
        import scala.jdk.CollectionConverters._
        jobs.values.asScala.filter(_.end > 0).toSeq.sortBy(_.start)
      }
      val jobSumS = ended.map(j => (j.end - j.start) / 1e3).sum
      val taskSumS = {
        import scala.jdk.CollectionConverters._
        stageTaskMs.values.asScala.sum / 1e3
      }
      // driverGap assumes sequential jobs (Bench runs entries serially);
      // overlapping jobs would make it an underestimate or negative
      println(f"== $name%-34s wall ${wallS}%7.2f s  jobs ${ended.size}%3d  " +
        f"jobSum ${jobSumS}%7.2f s  driverGap ${wallS - jobSumS}%7.2f s  " +
        f"taskSum ${taskSumS}%7.2f s")
      ended.sortBy(j => -(j.end - j.start)).take(8).foreach { j =>
        println(f"     job ${j.id}%4d ${(j.end - j.start) / 1e3}%6.2f s  ${j.desc.take(90)}")
      }
      // call-site census: which line submits how many jobs / how much time
      ended.groupBy(_.desc).toSeq
        .map { case (d, js) => (d, js.size, js.map(j => (j.end - j.start) / 1e3).sum) }
        .sortBy(-_._3).take(12).foreach { case (d, n, t) =>
          println(f"     site $n%4d jobs ${t}%6.2f s  ${d.take(90)}")
        }
    }

    Indexes.all.filter(ib => prefixes.exists(s"index:${ib.name}".startsWith))
      .foreach { ib =>
        runEntry(s"index:${ib.name}", () => ib.force(spark, sfDir))
      }
    Registry.all.filter(q => prefixes.exists(q.name.startsWith)).foreach { q =>
      runEntry(q.name,
        () => q.fn(spark, sfDir).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
