package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.LongType

import graft.ops.VectorOpsImpl

/** INCREMENTAL IVF index maintenance — the streaming completion of the
  * build-once/search-many contract: vectors arriving on a stream are
  * assigned to their nearest frozen codebook center with the SAME narrow
  * baked-literal argmin the batch build uses, and appended to a
  * cluster-partitioned index store. Because assignment is a stateless
  * per-row decision against a frozen codebook, the incrementally-built
  * index is row-for-row the batch rebuild over the same vectors — no drift,
  * no reconciliation pass — and a checkpointed restart resumes without
  * duplicating or dropping index rows (exactly-once parquet sink).
  * Centroid RE-TRAINING is deliberately out of scope of the incremental
  * path: it changes every assignment, i.e. it is an index rebuild, which is
  * how production IVF deployments treat it too.
  *
  * Scale shape: the assign stage is narrow (no state store, no watermark,
  * no shuffle — scales with arrival rate only); the sink partitions BY
  * assigned cluster so a search probe touches only its cluster's files
  * (the static-pruning twin of the batch path's cached single-cluster
  * layout); [[probeTopK]] is the same broadcast-query probe shape as the
  * batch `kmeansIvfTopK`, applied to whichever index table — stream-built
  * or batch-built — it is handed.
  */
object StreamIndex {

  /** Assign every arriving vector to its nearest frozen center. Works on
    * batch and streaming frames alike; expects columns (vec_id, embedding)
    * and appends `assigned`. Uses the compact HOF argmin: a streaming
    * micro-batch plan has no scan boundary to split the stage, and the
    * batch form's fully unrolled argmin would overflow Janino's 64 KB
    * method limit there and drop the whole stage to interpreted eval
    * (see VectorOpsImpl.assignCentersCompact — bitwise-identical
    * assignments, proven by StreamIndexSpec). */
  def assign(vecs: DataFrame, cents: Seq[(Long, Array[Double])]): DataFrame =
    VectorOpsImpl.assignCentersCompact(vecs, cents)

  /** Append the assigned stream to the cluster-partitioned parquet index
    * store; `Trigger.AvailableNow` drains what has arrived and stops, and
    * the checkpoint makes kill/restart resume exactly-once. */
  def indexSink(assigned: DataFrame, indexDir: String,
      checkpointDir: String): StreamingQuery =
    assigned.writeStream.format("parquet")
      .partitionBy("assigned")
      .option("path", indexDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()

  /** IVF probe over an index table (stream-built or batch-built — the
    * caller should not be able to tell, and StreamIndexSpec asserts it
    * can't): each query joins ONLY rows of its own assigned cluster
    * (1/k of the index), exact cosine ranks the survivors. Queries
    * broadcast; the index never shuffles.
    *
    * Contract: `index`/`queries` are MATERIALIZED index tables (read back
    * from the store), which is also the only shape that exists at scale.
    * Handing it a live argmin-computed frame instead would re-expand the
    * full k × Dims assignment expression at every join-key reference
    * (null filter, hash key) and balloon the generated stage by MBs. */
  def probeTopK(index: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    graft.expr.DotF64.register(index.sparkSession)
    val dot = VectorOpsImpl.sparkDot("qe", "ce")
    // norms are PER-SIDE (n + q sqrt's, not n × q) and — as in the batch
    // radiusSearch — keeping the join-side expression to the single dot
    // product is what holds the fused join+window stage inside Janino's
    // 64 KB method limit; sqrt is correctly rounded, so dot/(qn·cn) is
    // bit-identical to the unfactored cosine
    // q-side norm uses the compact HOF fold: callers hand probeTopK frames
    // whose plan already carries the argmin (near the 64 KB codegen
    // ceiling), and fusing the unrolled 64-term dot on top overflowed the
    // broadcast-build stage. The lambda evaluates interpreted — free on the
    // ≤queries-row side — while the corpus-sized c side keeps the unrolled
    // codegen'd dot. Same left-associative fold (0 + t1 + …), so norms are
    // bitwise identical on real (non-signed-zero) vectors.
    val hofDot =
      s"""aggregate(sequence(1, ${VectorOpsImpl.Dims}), 0D, (acc, i) ->
         |  acc + CAST(element_at(qe, i) AS DOUBLE) * CAST(element_at(qe, i) AS DOUBLE))"""
        .stripMargin
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("assigned").as("qassigned"))
      .withColumn("qn", expr(s"sqrt($hofDot)"))
    val c = index.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"),
        col("assigned"))
      .withColumn("cn", expr(s"sqrt(${VectorOpsImpl.sparkDot("ce", "ce")})"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(q).join(c,
        col("assigned") === col("qassigned") && col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", expr(s"($dot) / (qn * cn)"))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn"), col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rn"))
  }
}
