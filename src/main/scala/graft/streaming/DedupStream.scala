package graft.streaming

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A document flowing through the streaming dedup filter. */
case class DocEvent(doc_id: Long, text: String, fp: String)

/** Streaming incremental exact-dedup: keep the FIRST occurrence of each
  * document fingerprint across the whole life of the stream, drop every
  * later duplicate — the online counterpart of the batch
  * `TextAnalysis.fingerprintGroups` keeper (ingest pipelines dedup at
  * arrival, not in nightly batch rewrites).
  *
  * Semantics: keys are the md5-of-normalized-text fingerprint
  * (`TextFunctions.fingerprint` — same normalization as the batch op, so
  * batch and stream agree on what "duplicate" means). Within one
  * micro-batch the lowest doc_id wins (deterministic, order-independent);
  * across micro-batches the earlier batch wins (first-seen). Feeding a
  * corpus in doc_id order therefore reproduces the batch keeper exactly —
  * the batch≡stream contract DedupStreamSpec pins.
  *
  * Scale shape: state is ONE boolean flag per distinct fingerprint, hash
  * partitioned by the state store across executors — the inherent floor for
  * exact online dedup (the set of seen keys), and the shape RocksDB state
  * stores are built for. Events shuffle once on fingerprint; output is
  * Append (emitted rows are final — a first occurrence can never be
  * retracted).
  *
  * Run on a BATCH Dataset, `flatMapGroupsWithState` executes with empty
  * state per group, so the same code degrades to "min doc_id per
  * fingerprint group" — that batch replay is the `dedup_stream_replay`
  * oracle query.
  */
object DedupStream {

  implicit private val docEnc: Encoder[DocEvent] = Encoders.product[DocEvent]
  implicit private val stringEnc: Encoder[String] = Encoders.STRING
  implicit private val boolEnc: Encoder[Boolean] = Encoders.scalaBoolean

  /** Attach the dedup fingerprint to a raw (doc_id, text) frame. */
  def withFingerprint(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): Dataset[DocEvent] =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("string").as("text"),
      TextFunctions.fingerprint(col(textCol)).as("fp"))
      .as[DocEvent]

  /** First occurrence per fingerprint, streaming or batch (see object doc). */
  def firstSeen(docs: Dataset[DocEvent]): Dataset[DocEvent] = {
    val fn = (_: String, it: Iterator[DocEvent], state: GroupState[Boolean]) => {
      if (state.exists) {
        // fingerprint already admitted in an earlier micro-batch: everything
        // arriving now is a duplicate
        Iterator.empty
      } else {
        val first = it.minBy(_.doc_id)
        state.update(true)
        Iterator.single(first)
      }
    }
    docs.groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Convenience: raw frame in, deduplicated frame out. */
  def firstSeenDocs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    firstSeen(withFingerprint(docs, idCol, textCol)).toDF()
}
