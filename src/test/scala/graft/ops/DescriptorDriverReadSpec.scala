package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[ManifestIo.readDescriptorRows]] replaced a Spark
  * `read.parquet(...).collect()` job on every manifest resolution
  * (round 16); every commit/read path in Versioned/Mor now rests on the
  * driver-side read returning EXACTLY what the distributed read returned —
  * including the null-vs-empty buckets distinction (null = "all buckets"
  * mask, empty = "no buckets"), the first-row nbuckets constant, and a
  * None fallback for anything it cannot parse (legacy flat manifests).
  * Both writer eras are pinned: ManifestIo's own writer AND Spark's
  * parquet writer (the restore/branch copy path through round 15).
  */
class DescriptorDriverReadSpec extends SparkSpec {
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration
  private def fs(p: Path) = p.getFileSystem(conf)

  private val rows: Seq[(String, Option[Seq[Long]])] = Seq(
    ("seg-aaaa", Some(Seq(0L, 3L, 5L))),
    ("seg-bbbb", None),           // null mask: segment serves ALL buckets
    ("seg-cccc", Some(Seq.empty)) // explicit empty array
  )

  private def tmpDir(tag: String): Path =
    new Path(java.nio.file.Files.createTempDirectory(s"desc_$tag").toString,
      "m.parquet")

  test("round-trips ManifestIo.writeDescriptor, with and without nbuckets") {
    Seq(Some(8L), None).foreach { nb =>
      val p = tmpDir("rt")
      ManifestIo.writeDescriptor(conf, p, rows, nb)
      val got = ManifestIo.readDescriptorRows(conf, fs(p), p)
      assert(got.isDefined, s"driver read failed for nb=$nb")
      val (r, n) = got.get
      assert(r == rows.toVector, s"rows differ for nb=$nb")
      assert(n == nb)
    }
  }

  test("agrees with the distributed read of the same file") {
    val p = tmpDir("eq")
    ManifestIo.writeDescriptor(conf, p, rows, Some(4L))
    val viaSpark = spark.read.parquet(p.toString)
      .select(col("segment"), col("buckets"), col("nbuckets"))
      .collect()
      .map(r => (r.getString(0), Option(r.getSeq[Long](1)).map(_.toSeq),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toVector
    val (r, nb) = ManifestIo.readDescriptorRows(conf, fs(p), p).get
    assert(r == viaSpark.map { case (s, b, _) => (s, b) })
    assert(Some(nb) == viaSpark.headOption.map(_._3))
  }

  test("reads a SPARK-written descriptor (the restore/branch copy form)") {
    val src = tmpDir("src")
    ManifestIo.writeDescriptor(conf, src, rows, Some(8L))
    val copy = tmpDir("cp")
    spark.read.parquet(src.toString).coalesce(1)
      .write.mode("overwrite").parquet(copy.toString)
    val got = ManifestIo.readDescriptorRows(conf, fs(copy), copy)
    assert(got.isDefined, "driver read of a Spark-written descriptor failed")
    assert(got.get._1 == rows.toVector)
    assert(got.get._2 == Some(8L))
  }

  test("legacy flat manifest (file rows, no segment column) returns None") {
    val p = tmpDir("legacy")
    Seq((0L, "f0.parquet", 10L), (1L, "f1.parquet", 20L))
      .toDF("bucket", "file", "bytes")
      .coalesce(1).write.mode("overwrite").parquet(p.toString)
    assert(ManifestIo.readDescriptorRows(conf, fs(p), p).isEmpty)
  }

  test("missing path returns None (callers fall back loudly downstream)") {
    val p = new Path("/definitely/not/there.parquet")
    assert(ManifestIo.readDescriptorRows(conf, fs(p), p).isEmpty)
  }
}
