package graft.expr

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The z-order expression is trusted for LAYOUT decisions — a wrong bit
  * silently degrades skipping instead of failing a query — so it is proven
  * three ways: against a bit-by-bit reference, against its own inverse,
  * and against the portable SQL text the DuckDB oracle runs. Deterministic
  * seeded randomness — the scalatest/scalacheck bridge isn't in the
  * offline cache (same approach as JexlPropertySpec).
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def randomCells(n: Int): Seq[(Long, Long)] = {
    val rng = new Random(0x20FDE5L)
    Seq.fill(n)((rng.nextInt(65536).toLong, rng.nextInt(65536).toLong))
  }

  test("interleave matches a bit-by-bit reference construction") {
    (randomCells(2000) ++ Seq((0L, 0L), (65535L, 65535L), (0L, 65535L)))
      .foreach { case (x, y) =>
        var ref = 0L
        for (b <- 0 until 16) {
          ref |= ((x >> b) & 1L) << (2 * b)
          ref |= ((y >> b) & 1L) << (2 * b + 1)
        }
        assert(ZOrder.interleave(x, y) == ref, s"($x, $y)")
      }
  }

  test("compact16 inverts spread16; interleave is injective on the grid") {
    randomCells(2000).foreach { case (x, y) =>
      val z = ZOrder.interleave(x, y)
      assert(ZOrder.compact16(z) == x)
      assert(ZOrder.compact16(z >> 1) == y)
      assert(z >= 0L && z < (1L << 32))
    }
  }

  test("the native expression equals the portable SQL text (codegen path)") {
    val rows = (0 until 200).map { i =>
      (i.toLong * 331L % 65536L, i.toLong * 7919L % 65536L)
    }
    val df = rows.toDF("x", "y")
    val native = df.select(ZOrderFunctions.zorder2($"x", $"y")).as[Long].collect()
    val sql = df.selectExpr(ZOrder.interleaveSql("x", "y")).as[Long].collect()
    assert(native.toSeq == sql.toSeq)
  }

  test("zorder2 registers as a SQL function and rejects non-bigint input") {
    ZOrder.register(spark)
    val one = spark.sql("SELECT zorder2(CAST(3 AS BIGINT), CAST(5 AS BIGINT)) AS z")
      .as[Long].head()
    assert(one == ZOrder.interleave(3L, 5L))
    val err = intercept[Exception] {
      spark.sql("SELECT zorder2('a', 'b')").collect()
    }
    assert(err.getMessage.contains("zorder2") || err.getMessage.contains("bigint"))
  }

  test("z-ordered points preserve locality: nearby cells share high bits") {
    // the property skipping relies on: a small (x, y) box maps into a small
    // z range ONCE aligned to the box's power-of-two tile
    for (tile <- Seq(0, 4, 8)) {
      val size = 1 << tile
      val base = ZOrder.interleave(1024L, 2048L)
      for (dx <- 0L until size.toLong.min(16); dy <- 0L until size.toLong.min(16)) {
        val z = ZOrder.interleave(1024L + dx, 2048L + dy)
        assert((z >> (2 * tile)) == (base >> (2 * tile)),
          s"tile $tile must share its z prefix")
      }
    }
  }
}
