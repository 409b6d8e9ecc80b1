package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.LongType

import graft.ops.TextOpsImpl

/** INCREMENTAL lexical (BM25) index maintenance — the text-side sibling of
  * [[StreamIndex]]: documents arriving on a stream are turned into postings
  * rows (doc_id, tok, tf, dl) and appended to the index store. Because a
  * document arrives WHOLE as one row, its term frequencies and length are
  * computed INSIDE that row (an array fold — no shuffle, no state store, no
  * watermark), so the stage is stateless and scales with arrival rate only.
  * The incrementally-built store is row-for-row the batch index build
  * (`TextOpsImpl.lexPostings`) over the same documents, and a checkpointed
  * restart resumes without duplicating or dropping postings (exactly-once
  * parquet sink) — StreamLexSpec proves all three properties.
  *
  * Corpus-wide statistics (df, doc count, average length) are NOT streamed
  * state: they derive from the postings store at search time
  * (`TextOpsImpl.bm25Over`), the way segment-based text engines fold
  * per-segment stats at query time. That keeps the streaming path free of
  * unbounded aggregation state and makes the index file self-contained —
  * search over a stream-built store is bitwise-equal to batch BM25 (q112).
  *
  * Reference scope note: the reference streams CDC rows to sinks
  * (README.md architecture diagram); maintaining a derived search index
  * incrementally is the same sink pattern applied to the lexical engine.
  */
object StreamLex {

  /** Per-arriving-document postings — works on batch and streaming frames
    * alike; expects (doc_id, text). tf per distinct token and dl are
    * per-row array math: O(distinct_tokens × len) per document, narrow. */
  def docPostings(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("dl", size(col("toks")).cast(LongType))
      .withColumn("post", expr(
        "transform(array_distinct(toks), t -> named_struct(" +
          "'tok', t, 'tf', CAST(size(filter(toks, x -> x = t)) AS BIGINT)))"))
      .select(col("doc_id"), col("dl"), explode(col("post")).as("p"))
      .select(col("doc_id"), col("p.tok").as("tok"), col("p.tf").as("tf"), col("dl"))

  /** Append postings to the store; `Trigger.AvailableNow` drains what has
    * arrived and stops; the checkpoint makes kill/restart exactly-once. */
  def postingsSink(postings: DataFrame, storeDir: String,
      checkpointDir: String): StreamingQuery =
    postings.writeStream.format("parquet")
      .option("path", storeDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()

  /** BM25 top-k over a (stream- or batch-built) postings store — the shared
    * scorer, so stream-built search IS the gated q112 computation. */
  def search(postings: DataFrame): DataFrame =
    TextOpsImpl.bm25Over(postings, postings.sparkSession)
}
