package graft.ops

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.schema.{MessageType, MessageTypeParser}

/** Driver-side parquet serialization for the lakehouse's TINY manifest
  * artifacts — version descriptors (O(live segments) rows) and
  * trickle-commit segments (O(batch files) rows).
  *
  * Why not a Spark job: a trickle commit's descriptor is a few dozen rows
  * of driver-resident metadata, and a one-task `coalesce(1).write` costs a
  * full job launch (scheduling, task serialization, committer setup and a
  * `_SUCCESS`-marker directory dance) per write — measured at roughly half
  * the layered commit's wall-clock constant on the bench's lakehouse
  * fixtures. `ParquetWriter` over the same Hadoop `FileSystem` produces an
  * equivalent single parquet FILE in one round of driver I/O; every reader
  * already goes through `spark.read.parquet(path)`, which accepts a bare
  * file as readily as a Spark-written directory, so old (directory-form)
  * and new (file-form) manifests coexist in one table's history.
  *
  * The schemas here MUST stay read-compatible with the Spark-written
  * equivalents ([[VersionedTableImpl.descriptorSchema]], the COW/MOR
  * segment columns): same names, int64/UTF8 physical types, and the
  * STANDARD 3-level LIST layout for `buckets` (what Spark itself writes
  * with `spark.sql.parquet.writeLegacyFormat=false`, its default), so
  * `mergeSchema` unions across eras resolve cleanly.
  */
private[ops] object ManifestIo {

  private val descriptorWithNb: MessageType = MessageTypeParser.parseMessageType(
    """message graft_descriptor {
      |  optional binary segment (UTF8);
      |  optional group buckets (LIST) {
      |    repeated group list {
      |      optional int64 element;
      |    }
      |  }
      |  optional int64 nbuckets;
      |}""".stripMargin)

  private val descriptorNoNb: MessageType = MessageTypeParser.parseMessageType(
    """message graft_descriptor {
      |  optional binary segment (UTF8);
      |  optional group buckets (LIST) {
      |    repeated group list {
      |      optional int64 element;
      |    }
      |  }
      |}""".stripMargin)

  private val cowSegment: MessageType = MessageTypeParser.parseMessageType(
    """message graft_segment {
      |  optional int64 bucket;
      |  optional binary file (UTF8);
      |  optional int64 bytes;
      |}""".stripMargin)

  private val morSegment: MessageType = MessageTypeParser.parseMessageType(
    """message graft_segment {
      |  optional int64 bucket;
      |  optional binary file (UTF8);
      |  optional binary kind (UTF8);
      |  optional int64 min_key;
      |  optional int64 max_key;
      |  optional int64 bytes;
      |}""".stripMargin)

  /** `path` is the manifest ROOT — the part file goes INSIDE it, matching
    * Spark's directory-form output (minus the `_SUCCESS` marker). The
    * directory form is load-bearing for PENDING manifests: their names are
    * dot-prefixed (`.pending-vN.parquet`), and Spark's file index drops a
    * dot-named FILE as hidden even when it is the explicit read root,
    * while a dot-named DIRECTORY root is exempt and its normally-named
    * part file lists fine. */
  private def writer(conf: Configuration, path: Path, schema: MessageType) =
    ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(
        new Path(path, "part-00000.parquet"), conf))
      .withConf(conf)
      .withType(schema)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()

  /** Write descriptor rows `(segment, buckets)` as ONE parquet file at
    * `path` (create-exclusive — callers stage under a unique tmp name).
    * `nbuckets` Some(n) stamps the COW table-bucketing column on every
    * row; None writes the MOR two-column form. */
  def writeDescriptor(conf: Configuration, path: Path,
      rows: Seq[(String, Option[Seq[Long]])], nbuckets: Option[Long]): Unit = {
    val schema = if (nbuckets.isDefined) descriptorWithNb else descriptorNoNb
    val w = writer(conf, path, schema)
    try rows.foreach { case (seg, bks) =>
      val g = new SimpleGroup(schema)
      g.add("segment", seg)
      bks.foreach { bs =>
        val lst = g.addGroup("buckets")
        bs.foreach(b => lst.addGroup("list").add("element", b))
      }
      nbuckets.foreach(n => g.add("nbuckets", n))
      w.write(g)
    } finally w.close()
  }

  /** Write COW segment rows `(bucket, file, bytes)` as one parquet file. */
  def writeCowSegment(conf: Configuration, path: Path,
      rows: Seq[(Long, String, Long)]): Unit = {
    val w = writer(conf, path, cowSegment)
    try rows.foreach { case (b, f, by) =>
      val g = new SimpleGroup(cowSegment)
      g.add("bucket", b); g.add("file", f); g.add("bytes", by)
      w.write(g)
    } finally w.close()
  }

  /** Write MOR segment rows `(bucket, file, kind, min_key, max_key,
    * bytes)` as one parquet file. */
  def writeMorSegment(conf: Configuration, path: Path,
      rows: Seq[(Long, String, String, Long, Long, Long)]): Unit = {
    val w = writer(conf, path, morSegment)
    try rows.foreach { case (b, f, k, mn, mx, by) =>
      val g = new SimpleGroup(morSegment)
      g.add("bucket", b); g.add("file", f); g.add("kind", k)
      g.add("min_key", mn); g.add("max_key", mx); g.add("bytes", by)
      w.write(g)
    } finally w.close()
  }
}
