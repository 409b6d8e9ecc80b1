package graft.ops

import graft.SparkSpec

/** ADVICE r2: degenerate LSH candidate generation must be VISIBLE. The
  * diagnostics aggregate reports per-band bucket counts, over-cap drops and
  * the kept-row fraction so a fixed band geometry outgrown by the corpus is
  * caught by inspection instead of silently shrinking the candidate set. */
class NearDupDiagnosticsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("near-dup diagnostics report per-band bucket health") {
    val d = VectorOpsImpl.nearDupDiagnostics(spark, dir).collect()
    assert(d.length == VectorOpsImpl.NearDupBands)
    d.foreach { r =>
      val (buckets, dropped, kept) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(buckets >= 1 && buckets <= (1L << VectorOpsImpl.NearDupBandBits))
      assert(dropped >= 0 && dropped <= buckets)
      assert(kept >= 0.0 && kept <= 1.0)
    }
    // a cap the corpus has outgrown MUST show up as dropped buckets and a
    // shrunken kept fraction — the silent degeneration the view surfaces
    // (500 vectors over <=16 buckets/band: avg bucket ~31 > cap 10)
    val tight = VectorOpsImpl.nearDupDiagnostics(spark, dir, cap = 10).collect()
    assert(tight.map(_.getLong(2)).sum > 0)
    assert(tight.map(_.getDouble(3)).max < 1.0)
  }

  test("widening bands restores coverage without raising the cap") {
    // same corpus, 2 bands x 8 bits = 256 buckets/band: more buckets means
    // smaller ones, so the kept fraction must not get worse
    val narrow = VectorOpsImpl.nearDupDiagnostics(spark, dir, bands = 4, bandBits = 4)
      .agg(org.apache.spark.sql.functions.avg("kept_frac")).head().getDouble(0)
    val wide = VectorOpsImpl.nearDupDiagnostics(spark, dir, bands = 2, bandBits = 8)
      .agg(org.apache.spark.sql.functions.avg("kept_frac")).head().getDouble(0)
    assert(wide >= narrow,
      s"wider bands should keep at least as many rows (narrow=$narrow wide=$wide)")
  }
}
