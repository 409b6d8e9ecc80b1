package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.VectorOpsImpl

/** INCREMENTAL centroid maintenance — the drift monitor's streaming form
  * (the [[StreamHll]]/[[StreamQuantile]] pattern applied to q185):
  * documents with embeddings arriving on a stream fold into per-
  * (source, era) centroid state through a streaming SUM aggregate over
  * the repo's floor-1e12 DECIMAL(38,0) quantized components — exact,
  * order-independent, and mergeable, so the keyed state is exactly the
  * ≤ sources × eras × (Dims + 1) cells and the stream-built sums are
  * ROW-EQUAL to the batch sums over the same rows at every micro-batch
  * boundary. Centroid means (and from them drift cosine / shift) read
  * off the sums without replaying the corpus. StreamDriftSpec proves
  * stream == batch mid-run and after more data.
  */
object StreamDrift {

  /** The incrementally-maintained (source, era, n, s1..sDims) sum table
    * over a (possibly streaming) (source, era, embedding) frame. */
  def centroidSums(docs: DataFrame): DataFrame = {
    val sums = count(lit(1)).as("n") +: (1 to VectorOpsImpl.Dims).map(i =>
      expr(s"SUM(CAST(FLOOR(CAST(element_at(embedding, $i) AS DOUBLE) * 1e12) " +
        s"AS DECIMAL(38,0)))").as(s"s$i"))
    docs.groupBy(col("source"), col("era")).agg(sums.head, sums.tail: _*)
  }

  /** Centroid means from a sum table (stream-built or batch-built — the
    * spec asserts readoff cannot tell): mean_i = (Σ/1e12)/n, the same op
    * order as the batch quantized-mean expression. */
  def meansFromSums(sums: DataFrame): DataFrame =
    sums.select(
      col("source") +: col("era") +: col("n") +:
        (1 to VectorOpsImpl.Dims).map(i =>
          (expr(s"CAST(s$i AS DOUBLE) / 1e12") / col("n")).as(s"c$i")): _*)
}
