package graft.ops

import graft.Q

// Filled in as the build progresses (SURVEY.md §7 build order).
object TextOps { def queries: Seq[Q] = Seq.empty }
object DedupOps { def queries: Seq[Q] = Seq.empty }
object VectorOps { def queries: Seq[Q] = Seq.empty }
object MultimodalOps { def queries: Seq[Q] = Seq.empty }
