package graft.streaming

import scala.util.Random

import graft.SparkSpec

/** Property tests for greedy packing (SURVEY.md §5 strategy: every message
  * ≤ max size unless a single oversized record; bins contiguous & greedy).
  * Deterministic seeded generation (the scalatest/scalacheck bridge isn't in
  * the offline dependency cache).
  */
class PackingPropertySpec extends SparkSpec {
  import spark.implicits._

  private def cases(n: Int): Seq[List[Long]] = {
    val rng = new Random(42)
    (1 to n).map(_ => List.fill(1 + rng.nextInt(60))(1L + rng.nextInt(700)))
  }

  test("greedy packing invariants hold for arbitrary size sequences") {
    cases(20).foreach { sizes =>
      val maxBytes = 1000L
      val df = sizes.zipWithIndex
        .map { case (sz, i) => ("s", f"$i%06d", sz) }
        .toDF("shard", "seq", "bytes")
      val packed = Packing.greedyPack(df, "shard", "seq", "bytes", maxBytes, -1)
        .collect().sortBy(_.seq)

      // bins are contiguous starting at 0 and never decrease in seq order
      val bins = packed.map(_.messageBin)
      assert(bins.head == 0L)
      bins.sliding(2).foreach { case Array(a, b) => assert(b == a || b == a + 1); case _ => }

      // every bin respects maxBytes unless it holds a single oversized record
      packed.groupBy(_.messageBin).foreach { case (_, rs) =>
        val total = rs.map(_.bytes).sum
        assert(total <= maxBytes || rs.length == 1,
          s"bin over budget with ${rs.length} records totalling $total")
      }

      // greedy: a record only starts a new bin if it would not have fit
      packed.groupBy(_.messageBin).toSeq.sortBy(_._1)
        .map { case (bin, rs) => bin -> rs.sortBy(_.seq) }
        .sliding(2).foreach {
          case Seq((_, prev), (_, next)) =>
            assert(prev.map(_.bytes).sum + next.head.bytes > maxBytes,
              "record moved to a new bin although it fit in the previous one")
          case _ =>
        }
    }
  }

  test("greedy pack is a streaming traversal: shuffle + in-partition sort, no group materialization") {
    val df = Seq(("a", "01", 1L), ("b", "02", 2L)).toDF("shard", "seq", "bytes")
    val plan = Packing.greedyPack(df, "shard", "seq", "bytes", 10L, -1)
      .queryExecution.executedPlan.toString
    // the spillable external sort + constant-memory iterator shape; the old
    // FlatMapGroups form materialized a whole shard as a Vector in task
    // memory (OOM on one giant shard at scale)
    assert(plan.contains("Sort"), plan)
    assert(plan.contains("hashpartitioning(_1"), plan)
    assert(!plan.contains("FlatMapGroups"), plan)
  }

  test("packer state resets at shard boundaries sharing one partition") {
    // 40 shards over few shuffle partitions -> many shards per partition by
    // pigeonhole; per-shard bins must still start at 0 and pack independently
    val rows = for { s <- 1 to 40; i <- 1 to 5 } yield (f"sh$s%02d", f"$i%02d", 400L)
    val df = rows.toDF("shard", "seq", "bytes")
    val packed = Packing.greedyPack(df, "shard", "seq", "bytes", 1000L, -1).collect()
    assert(packed.length == 200)
    packed.groupBy(_.shard).foreach { case (sh, rs) =>
      val bins = rs.sortBy(_.seq).map(_.messageBin).toSeq
      assert(bins == Seq(0L, 0L, 1L, 1L, 2L), s"$sh packed as $bins")
    }
  }

  test("count cap is never exceeded and splits only when full") {
    val rng = new Random(7)
    cases(10).foreach { sizes =>
      val cap = 1 + rng.nextInt(5)
      val df = sizes.zipWithIndex
        .map { case (sz, i) => ("s", f"$i%06d", sz) }
        .toDF("shard", "seq", "bytes")
      val packed = Packing.greedyPack(df, "shard", "seq", "bytes", Long.MaxValue, cap)
        .collect()
      val byBin = packed.groupBy(_.messageBin).values.map(_.length).toSeq.sorted
      assert(byBin.forall(_ <= cap))
      assert(byBin.count(_ < cap) <= 1, "only the final bin may be under-full")
    }
  }
}
