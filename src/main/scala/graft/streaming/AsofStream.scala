package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One row of the tagged left∪right stream feeding the as-of enrichment:
  * side 0 = right (reference values), side 1 = left (rows to enrich).
  */
case class AsofEvent(
    key: Long, ts: Long, side: Int, tb: Long,
    leftId: Long, rightId: Long, rightVal: Double)

/** An enriched left row: the most recent right row at or before it. */
case class AsofMatch(
    key: Long, ts: Long, leftId: Long,
    asofRightId: Option[Long], asofVal: Option[Double])

/** Streaming backward as-of enrichment — the online counterpart of
  * `operators.AsofJoin.asofBackward`: each left event is emitted with the
  * most recent right event of the same key at or before it, as it arrives.
  *
  * Semantics: state per key is ONE (ts, tieBreak, payload) triple — the
  * latest right row seen. Within a micro-batch the group's rows are sorted
  * by (ts, side, tieBreak) and folded in order, so simultaneous rows follow
  * the batch operator's exact tie rules (right-before-left at equal ts,
  * largest tie-break among simultaneous rights). Across micro-batches the
  * stream relies on the same in-order delivery contract as the renko and
  * dedup streams (`RenkoWS`, `DedupStream`): batches arrive in event-time
  * order per key, which makes stream output ≡ batch output —
  * AsofStreamSpec pins that equivalence.
  *
  * Scale shape: one shuffle of both streams on the key; O(1) state per key
  * (not per event) in the state store; Append output (an enrichment is
  * final the moment the left row is processed).
  */
object AsofStream {

  implicit private val evEnc: Encoder[AsofEvent] = Encoders.product[AsofEvent]
  implicit private val mEnc: Encoder[AsofMatch] = Encoders.product[AsofMatch]
  implicit private val longEnc: Encoder[Long] = Encoders.scalaLong
  implicit private val stEnc: Encoder[(Long, Long, Long, Double)] =
    Encoders.product[(Long, Long, Long, Double)]

  /** Tag and merge the two sides into the union stream. Left columns:
    * (key, ts, id); right columns: (key, ts, id, value).
    */
  def tagged(left: DataFrame, right: DataFrame): Dataset[AsofEvent] = {
    val l = left.select(col("key").cast("long"), col("ts").cast("long"),
      lit(1).as("side"), lit(Long.MaxValue).as("tb"),
      col("id").cast("long").as("leftId"), lit(-1L).as("rightId"),
      lit(0.0).as("rightVal"))
    val r = right.select(col("key").cast("long"), col("ts").cast("long"),
      lit(0).as("side"), col("id").cast("long").as("tb"),
      lit(-1L).as("leftId"), col("id").cast("long").as("rightId"),
      col("value").cast("double").as("rightVal"))
    l.unionByName(r).as[AsofEvent]
  }

  /** Enrich left rows with the latest right row per key (see object doc). */
  def enrich(events: Dataset[AsofEvent]): Dataset[AsofMatch] = {
    val fn = (key: Long, it: Iterator[AsofEvent],
        state: GroupState[(Long, Long, Long, Double)]) => {
      var cur = state.getOption // (ts, tb, rightId, rightVal)
      val out = Seq.newBuilder[AsofMatch]
      // same total order as the batch window: (ts, side, tieBreak)
      it.toSeq.sortBy(e => (e.ts, e.side, e.tb)).foreach { e =>
        if (e.side == 0) {
          // a newer (or equal-ts, larger-tb) right row supersedes the state;
          // the in-order contract makes (ts, tb) non-decreasing here
          cur = Some((e.ts, e.tb, e.rightId, e.rightVal))
        } else {
          out += AsofMatch(key, e.ts, e.leftId,
            cur.map(_._3), cur.map(_._4))
        }
      }
      cur.foreach(state.update)
      out.result().iterator
    }
    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
