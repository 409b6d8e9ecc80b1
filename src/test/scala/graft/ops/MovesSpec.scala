package graft.ops

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** The staged-file publication helper: loud failure on a false rename and
  * the executor fan-out past the fat-batch threshold both preserve the
  * driver loop's semantics exactly. */
class MovesSpec extends SparkSpec {

  private def fs = new Path("/tmp").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def mkFiles(dir: java.nio.file.Path, n: Int): Seq[(Path, Path)] = {
    val out = dir.resolve("out")
    java.nio.file.Files.createDirectories(out)
    (0 until n).map { i =>
      val src = dir.resolve(s"src-$i.parquet")
      java.nio.file.Files.writeString(src, s"payload-$i")
      (new Path(src.toUri), new Path(out.resolve(s"dst-$i.parquet").toUri))
    }
  }

  test("driver-loop path (<= threshold) moves every file") {
    val dir = java.nio.file.Files.createTempDirectory("moves_small")
    val pairs = mkFiles(dir, 5)
    Moves.renameAll(spark, pairs)
    pairs.foreach { case (src, dst) =>
      assert(!fs.exists(src) && fs.exists(dst), s"$src -> $dst")
    }
  }

  test("distributed path (> threshold) moves every file with identical semantics") {
    val dir = java.nio.file.Files.createTempDirectory("moves_fat")
    val n = Moves.DistributeOver * 2 + 7
    val pairs = mkFiles(dir, n)
    Moves.renameAll(spark, pairs)
    pairs.foreach { case (src, dst) =>
      assert(!fs.exists(src) && fs.exists(dst), s"$src -> $dst")
    }
    // content survives the executor-side rename
    val one = java.nio.file.Paths.get(pairs.head._2.toUri)
    assert(java.nio.file.Files.readString(one) == "payload-0")
  }

  test("a false rename fails LOUDLY instead of publishing a manifest over a missing file") {
    val dir = java.nio.file.Files.createTempDirectory("moves_fail")
    val pairs = mkFiles(dir, 3)
    // a MISSING SOURCE is the reliable false-return on the Hadoop local FS
    // (it creates destination parents on rename, unlike HDFS)
    val bad = pairs.updated(1,
      (new Path(s"file:${dir.toString}/vanished.parquet"), pairs(1)._2))
    // the local FS throws FileNotFoundException itself; stores with HDFS
    // return-false semantics surface as our IllegalStateException — either
    // way the commit aborts instead of publishing over a missing file
    val e = intercept[Exception](Moves.renameAll(spark, bad))
    assert(e.isInstanceOf[java.io.IOException] ||
      (e.isInstanceOf[IllegalStateException] &&
        e.getMessage.contains("rename failed")), e.toString)
    // ... and on the distributed path too (the task failure surfaces as the
    // job's failure cause, wrapped by Spark)
    val dir2 = java.nio.file.Files.createTempDirectory("moves_fail_fat")
    val many = mkFiles(dir2, Moves.DistributeOver + 9)
    val bad2 = many.updated(3,
      (new Path(s"file:${dir2.toString}/vanished.parquet"), many(3)._2))
    val e2 = intercept[Exception](Moves.renameAll(spark, bad2))
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e2).exists(c => c.isInstanceOf[java.io.IOException] ||
      (c.isInstanceOf[IllegalStateException] &&
        c.getMessage.contains("rename failed"))),
      s"expected the loud rename failure in the cause chain: $e2")
  }

  test("distributed path over objstore://: executors rebuild the shim FS from the shipped conf") {
    // the executor side re-creates the FileSystem from the serialized
    // Hadoop conf — the seam that breaks if test-registered schemes are
    // dropped (the reason SerializableHadoopConf ships the REAL conf)
    spark.sparkContext.hadoopConfiguration.set("fs.objstore.impl",
      classOf[graft.fs.ObjectStoreFileSystem].getName)
    val dir = java.nio.file.Files.createTempDirectory("moves_objstore")
    val out = dir.resolve("out")
    java.nio.file.Files.createDirectories(out)
    val n = Moves.DistributeOver + 11
    val pairs = (0 until n).map { i =>
      val src = dir.resolve(s"src-$i.parquet")
      java.nio.file.Files.writeString(src, s"payload-$i")
      (new Path(s"objstore://$src"), new Path(s"objstore://$out/dst-$i.parquet"))
    }
    Moves.renameAll(spark, pairs)
    pairs.zipWithIndex.foreach { case ((src, dst), i) =>
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(src.toUri.getPath)))
      val got = java.nio.file.Paths.get(dst.toUri.getPath)
      assert(java.nio.file.Files.exists(got), s"missing $dst")
      assert(java.nio.file.Files.readString(got) == s"payload-$i",
        s"copy+delete rename must carry content intact: $dst")
    }
  }

  test("a fragmented fat commit routes through the distributed move and stays correct") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("moves_commit").toString
    val prevCap = spark.conf.get("spark.sql.files.maxRecordsPerFile", "0")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "1")
    // 200 one-record files across 8 buckets: well past DistributeOver, so
    // the commit's stage->data move runs as a Spark job
    try VersionedTableImpl.commitMerge(spark, root,
      graft.cdc.CdcSynth.envelope((0L until 200L).map(u => (4L * u, u))
        .toDF("event_id", "user_id")
        .withColumn("event_type", lit("t0"))
        .withColumn("value", col("event_id").cast("double"))
        .withColumn("ts", timestamp_millis(lit(1700000000000L) + col("event_id")))
        .withColumn("props", lit("{}"))), 8)
    finally spark.conf.set("spark.sql.files.maxRecordsPerFile", prevCap)
    val m = VersionedTableImpl.manifest(spark, root, 1)
    assert(m.count() >= 200, "the fat commit must have fragmented")
    assert(m.filter(col("bytes") <= 0L).count() == 0,
      "every manifest row records its real pre-move length")
    assert(VersionedTableImpl.readVersion(spark, root, 1).count() == 200)
  }
}
