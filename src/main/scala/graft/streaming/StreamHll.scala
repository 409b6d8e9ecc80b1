package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.ops.HllOpsImpl

/** INCREMENTAL HyperLogLog maintenance — the cardinality sibling of the
  * streaming count-min sketch ([[StreamLex]] family): documents arriving
  * on a stream fold into the per-source register table
  * (source, reg, m_reg) through a streaming MAX aggregate. Because
  * register merge is MAX — idempotent, commutative, associative — the
  * keyed state store holds exactly the ≤ sources × 256 register rows
  * (bytes per source, bounded forever, no watermark needed), and the
  * stream-built sketch is ROW-EQUAL to the batch sketch over the same
  * documents at every micro-batch boundary: the distinct-count monitor is
  * always live and never replays the corpus. StreamHllSpec proves the
  * equality mid-stream and at the end.
  *
  * Reference scope note: the reference streams CDC rows to sinks
  * (README.md architecture diagram); maintaining a derived cardinality
  * sketch incrementally is the same sink pattern applied to monitoring.
  */
object StreamHll {

  /** The incrementally-maintained register table over a (possibly
    * streaming) (source, text) frame. Update/complete output both work:
    * each micro-batch emits only touched registers in update mode. */
  def registers(docs: DataFrame): DataFrame =
    HllOpsImpl.registerRows(docs)
}
