package graft.expr

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Hilbert expression is trusted for LAYOUT decisions (like zorder2, a
  * wrong bit silently degrades skipping), so it is proven structurally:
  * full bijection + unit-step adjacency on a small grid — the DEFINING
  * space-filling-curve property, which no spot check can substitute for —
  * plus inverse round-trips at full 16-bit scale, equality with the
  * chained-CTE SQL text on Spark's own parser, and the locality property
  * the skipping panel (q151) depends on.
  */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  test("small-grid walk is a bijection whose consecutive cells are adjacent") {
    for (bits <- Seq(2, 3, 6)) {
      val n = 1 << bits
      val byD = (for (x <- 0L until n; y <- 0L until n)
        yield Hilbert.index(x, y, bits) -> ((x, y))).toMap
      assert(byD.keySet == (0L until n.toLong * n).toSet,
        s"bits=$bits: indexes must cover 0 until n² exactly once")
      (0L until n.toLong * n - 1).foreach { d =>
        val (x1, y1) = byD(d)
        val (x2, y2) = byD(d + 1)
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
          s"bits=$bits: steps d=$d→${d + 1} must move one cell")
      }
    }
  }

  test("inverse round-trips at full 16-bit scale") {
    val rng = new Random(0x417BE27L)
    val pts = Seq.fill(2000)((rng.nextInt(65536).toLong, rng.nextInt(65536).toLong)) ++
      Seq((0L, 0L), (65535L, 65535L), (0L, 65535L), (65535L, 0L))
    pts.foreach { case (x, y) =>
      val d = Hilbert.index(x, y)
      assert(d >= 0L && d < (1L << 32))
      assert(Hilbert.inverse(d) == ((x, y)), s"($x, $y) → $d must invert")
    }
  }

  test("the native expression equals the chained-CTE SQL text") {
    val rows = (0 until 200).map { i =>
      (i.toLong, i.toLong * 331L % 65536L, i.toLong * 7919L % 65536L)
    }
    rows.toDF("id", "x", "y").createOrReplaceTempView("hil_in")
    val native = rows.toDF("id", "x", "y")
      .select($"id", HilbertFunctions.hilbert2($"x", $"y").as("h"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val viaSql = spark.sql(
      s"""WITH ${Hilbert.chainSql("hil_in", Seq("id"), "x", "y")}
         |SELECT id, hacc AS h FROM h${Hilbert.Bits}""".stripMargin)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(native == viaSql)
  }

  test("hilbert2 registers as a SQL function and rejects non-bigint input") {
    Hilbert.register(spark)
    val one = spark.sql("SELECT hilbert2(CAST(3 AS BIGINT), CAST(5 AS BIGINT)) AS h")
      .as[Long].head()
    assert(one == Hilbert.index(3L, 5L))
    val err = intercept[Exception] {
      spark.sql("SELECT hilbert2('a', 'b')").collect()
    }
    assert(err.getMessage.contains("hilbert2") || err.getMessage.contains("bigint"))
  }

  test("hilbert ranges cover more compact boxes than morton on diagonal jumps") {
    // the property q151 measures: walking the whole curve, the largest
    // single-step coordinate jump is 1 for Hilbert while Morton's Z shape
    // jumps across half the grid — quantified here on a 64×64 grid
    val bits = 6
    val n = 1 << bits
    def maxJump(key: (Long, Long) => Long): Long = {
      val byD = (for (x <- 0L until n; y <- 0L until n)
        yield key(x, y) -> ((x, y))).toMap
      (0L until n.toLong * n - 1).map { d =>
        val (x1, y1) = byD(d)
        val (x2, y2) = byD(d + 1)
        math.abs(x1 - x2) + math.abs(y1 - y2)
      }.max
    }
    val hilbertJump = maxJump((x, y) => Hilbert.index(x, y, bits))
    val mortonJump = maxJump((x, y) => ZOrder.interleave(x, y))
    assert(hilbertJump == 1L)
    assert(mortonJump > n / 2,
      s"morton's max jump $mortonJump should cross half the grid")
  }
}
