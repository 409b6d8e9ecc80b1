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

  test("disjoint clusters keep distinct minimum labels") {
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 30L))
      .toDF("a_id", "b_id")
    val comp = DedupOpsImpl.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L))
  }
}
