package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fixture row (top-level for Spark encoders). */
final case class GuardDoc(source: String, text: String)

/** The HLL small-range guard: a source whose raw estimate sits in the
  * linear-counting regime (≤ 2.5·m with empty registers) must report a
  * NULL estimate and `small_range = true` — never a silently biased
  * number — while a source above the floor reports the raw estimate with
  * its usual accuracy.
  */
class HllGuardSpec extends SparkSpec {
  import spark.implicits._

  test("tiny source yields NULL estimate + small_range flag; big source estimates") {
    // tiny: 5 distinct tokens; big: 2000 distinct tokens (m = 256, floor 640)
    val docs = Seq(
      GuardDoc("tiny", (0 until 5).map(i => s"t$i").mkString(" "))) ++
      (0 until 20).map(b => GuardDoc("big",
        (0 until 100).map(i => s"w${b * 100 + i}").mkString(" ")))
    val df = docs.toDF()
    val regs = HllOpsImpl.registerRows(df)
    val exact = df.select(col("source"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source")).agg(countDistinct(col("tok")).as("n_exact"))
    val out = HllOpsImpl.assemble(regs, exact)
      .select(col("source"), col("n_exact"), col("hll_est"),
        col("rel_err"), col("small_range"))
      .as[(String, Long, Option[Double], Option[Double], Boolean)]
      .collect().map(r => r._1 -> r).toMap

    val tiny = out("tiny")
    assert(tiny._2 == 5L)
    assert(tiny._3.isEmpty && tiny._4.isEmpty,
      s"small-range estimate must be NULL, not biased: $tiny")
    assert(tiny._5, "small_range flag must be set")

    val big = out("big")
    assert(big._2 == 2000L)
    assert(!big._5, s"2000 distinct is above the 640 floor: $big")
    val est = big._3.getOrElse(fail("estimate must be present"))
    // raw HLL at m=256 has ~6.5% std error; 4 sigma bound
    assert(math.abs(est - 2000.0) / 2000.0 < 0.26,
      s"estimate within HLL error envelope: $est")
  }
}
