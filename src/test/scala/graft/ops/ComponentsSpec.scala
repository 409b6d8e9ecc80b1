package graft.ops

import graft.SparkSpec

/** Convergence of the shared min-label propagation (q46/q58): a silent
  * round cap would return WRONG components for long chains, so the loop
  * must run to fixpoint — diameter rounds, guaranteed to terminate because
  * every round strictly decreases at least one label. */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("long chain (diameter 24) collapses to one component") {
    val pairs = (1 until 25).map(i => (i.toLong, (i + 1).toLong)).toDF("a_id", "b_id")
    val comp = DedupOpsImpl.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 25)
    assert(comp.values.toSet == Set(1L), s"chain did not converge: $comp")
  }

  test("deep chain (diameter 120) converges in O(log d) rounds via pointer jump") {
    // diameter-120 path: neighbor-min alone needs ~120 sequential rounds
    // (q109's real pair graph needed 27); with the per-round pointer jump
    // the loop must still land on the exact min-label fixpoint, in far
    // fewer rounds — this pins correctness at depths where a jump bug
    // (e.g. jumping off a stale half-round) would surface as a wrong label.
    val pairs = (1 until 121).map(i => (i.toLong, (i + 1).toLong)).toDF("a_id", "b_id")
    val comp = DedupOpsImpl.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 121)
    assert(comp.values.toSet == Set(1L), s"deep chain did not converge: $comp")
  }

  test("disjoint clusters keep distinct minimum labels") {
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 30L))
      .toDF("a_id", "b_id")
    val comp = DedupOpsImpl.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("random graphs match a pure-Scala union-find (property)") {
    // deterministic seeds, house property style (the scalatest/scalacheck
    // bridge isn't in the offline cache). The propagation loop underlies
    // q46/q58/q97/q109/q133/q134 — worth the dozen Spark jobs.
    val rnd = new scala.util.Random(20260814L)
    (1 to 12).foreach { _ =>
      val n = 2 + rnd.nextInt(40)
      val ids = Seq.fill(n)(rnd.nextLong().abs % 1000).distinct
      val nEdges = 1 + rnd.nextInt(2 * ids.size)
      val edges = Seq.fill(nEdges) {
        (ids(rnd.nextInt(ids.size)), ids(rnd.nextInt(ids.size)))
      }.filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        // pure-Scala union-find ground truth with min-label roots
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val expected = nodes.map(v => v -> find(v)).toMap
        val got = DedupOpsImpl.connectedComponents(edges.toDF("a_id", "b_id"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === expected, s"edges=$edges")
      }
    }
  }
}
