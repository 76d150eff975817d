package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame

/** The streaming corpus front-door, composed from the existing operators:
  * first-seen exact dedup (`DedupStream.firstSeen` — one boolean of state
  * per distinct fingerprint) followed by the scan-local quality
  * annotation — the shape of a continuously-ingesting training-data
  * pipeline's admission stage.
  *
  * Everything downstream of the dedup is a pure projection, so the
  * composition stays Append-mode and restart-safe end to end: a document
  * is emitted exactly once (its fingerprint's first occurrence), already
  * annotated, and a partitioned parquet sink + checkpoint gives an
  * exactly-once corpus store (IngestStreamSpec drives source → store with
  * a mid-stream restart and checks the store equals the batch pipeline).
  */
object IngestPipeline {

  /** Deduplicated, quality-annotated document stream (or batch frame —
    * the same composition degrades to the batch keeper + annotations).
    * Output: (doc_id, text, fp, n_chars, n_tokens, n_unique_tokens,
    * stopword_cnt, ttr, stopword_ratio, quality_score).
    */
  def cleanAnnotated(docs: DataFrame): DataFrame =
    TextAnalysis.quality(DedupStream.firstSeenDocs(docs), keep = Seq("text", "fp"))
}
