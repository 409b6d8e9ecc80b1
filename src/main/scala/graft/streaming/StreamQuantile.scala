package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.QuantileSketchOpsImpl

/** INCREMENTAL quantile-sketch maintenance — the order-statistics sibling
  * of the streaming HLL ([[StreamHll]]): values arriving on a stream fold
  * into the per-column power-of-2 bin table (col_name, bin, cnt) through a
  * streaming COUNT aggregate. Bin merge is SUM — associative and
  * commutative — so the keyed state store holds exactly the ≤ columns × 61
  * bin rows (bounded forever, no watermark needed), and the stream-built
  * sketch is ROW-EQUAL to the batch sketch over the same values at every
  * micro-batch boundary: percentile readoff
  * ([[QuantileSketchOpsImpl.estFromBins]]) is always live and never
  * replays the corpus. StreamQuantileSpec proves the equality mid-stream,
  * across a kill/restart from checkpoint, and for the readoff.
  *
  * Reference scope note: the reference streams CDC rows to sinks
  * (README.md architecture diagram); maintaining a derived quantile
  * monitor incrementally is the same sink pattern applied to profiling.
  */
object StreamQuantile {

  /** The incrementally-maintained bin table over a (possibly streaming)
    * (col_name, k) frame — k the 2-dp canonical integer. */
  def bins(vals: DataFrame): DataFrame =
    QuantileSketchOpsImpl.binRows(vals)

  /** Drain `vals` into a parquet snapshot of the bin table at `outDir`
    * (complete-mode rewrite per micro-batch — the sketch is ≤ cols × 61
    * rows, so the snapshot write is metadata-scale). Restartable from
    * `checkpointDir`: the aggregate state resumes, so a restarted stream
    * continues folding instead of recounting. */
  def binsSink(vals: DataFrame, outDir: String,
      checkpointDir: String): StreamingQuery =
    bins(vals).writeStream
      .outputMode("complete")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(outDir)
        ()
      }
      .start()
}
