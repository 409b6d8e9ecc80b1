package graft.ops

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** The build-once / search-many deployment contract: at 100 TB the PQ codes
  * are not a session cache — the encode job WRITES the index table and every
  * search job SCANS it. This spec proves the persisted round trip: codes
  * written to parquet and read back give bitwise-identical search results to
  * the in-session cached view, and the persisted index is the compressed
  * artifact it claims to be (one narrow row of 8 small codes per vector).
  */
class PersistedIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ADC search over a persisted codes table equals the cached-view search") {
    val tmp = java.nio.file.Files.createTempDirectory("pqindex").toString

    // build job: encode and persist the index
    VectorOpsImpl.pqEncode(spark, dir).write.mode("overwrite").parquet(tmp)

    // search job: scan the persisted index (fresh lineage, no cache)
    val persisted = spark.read.parquet(tmp)
    assert(persisted.columns.toSet == Set("vec_id") ++ (0 until 8).map(m => s"code$m"),
      "the index table must hold exactly (vec_id, code0..code7)")

    val fromDisk = VectorOpsImpl.adcSearch(spark, dir, persisted).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val fromCache = VectorOpsImpl.pqAdcTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(fromDisk.nonEmpty && fromDisk.sameElements(fromCache),
      "persisted-index search must be bitwise identical to the cached-view search")

    // the scan side of the disk plan reads ONLY the code columns
    val s = VectorOpsImpl.adcSearch(spark, dir, spark.read.parquet(tmp))
      .queryExecution.executedPlan.toString
    val reads = "ReadSchema: [^\n]*".r.findAllIn(s).toSeq
    assert(reads.exists(r => r.contains("code0") && !r.contains("embedding")),
      s"the index scan must not touch raw vectors:\n$reads")

    VectorOpsImpl.clearCaches()
  }
}
