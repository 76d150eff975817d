package graft.streaming

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A document offered to the budget gate. */
case class BudgetDoc(doc_id: Long, stratum: String, n_tokens: Long)

/** A document the gate admitted; `cum_tokens` is the stratum's inclusive
  * running total at admission.
  */
case class BudgetAdmitted(doc_id: Long, stratum: String, n_tokens: Long, cum_tokens: Long)

/** Streaming token-budget admission: fill each stratum's quota of `budget`
  * TOKENS in arrival order, then close the stratum for the life of the
  * stream — the ingest-side twin of `Sampling.tokenBudgetSample` ("collect
  * 1B tokens per domain, then stop paying for that domain"), deciding at
  * arrival instead of re-drawing from a materialized corpus. The doc that
  * crosses the budget is admitted (every stratum that ever offers a doc
  * contributes at least one), matching the batch sampler's boundary rule.
  *
  * Semantics: docs admit in (micro-batch, doc_id) order — within one
  * micro-batch the group's docs are ordered by doc_id (deterministic,
  * partition-order independent), across micro-batches earlier batches
  * consume first. The running totals are therefore exactly a cumulative sum
  * over (epoch, doc_id) per stratum, which is what the `sample_budget_stream`
  * oracle replays as ONE window.
  *
  * Scale shape: state is a single long (consumed tokens) per stratum —
  * constant per key, the floor for quota tracking. Docs shuffle once on
  * stratum; output is Append (an admission is never retracted; a closed
  * stratum stays closed). One micro-batch's docs for one stratum buffer in
  * memory to sort — bounded by trigger size, same contract as the other
  * stateful front doors. Against a BATCH frame the same code runs with
  * empty state per group: a one-shot quota draw in doc_id order.
  */
object BudgetAdmission {

  implicit private val docEnc: Encoder[BudgetDoc] = Encoders.product[BudgetDoc]
  implicit private val admEnc: Encoder[BudgetAdmitted] = Encoders.product[BudgetAdmitted]
  implicit private val stringEnc: Encoder[String] = Encoders.STRING
  implicit private val longEnc: Encoder[Long] = Encoders.scalaLong

  /** Attach (stratum, whitespace token count) to a raw document frame. */
  def withTokens(
      docs: DataFrame,
      strataCol: String,
      idCol: String = "doc_id",
      textCol: String = "text"): Dataset[BudgetDoc] =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      col(strataCol).cast("string").as("stratum"),
      size(TextFunctions.tokens(col(textCol))).cast("long").as("n_tokens"))
      .as[BudgetDoc]

  /** The budget gate, streaming or batch (see object doc). */
  def admit(docs: Dataset[BudgetDoc], budget: Long): Dataset[BudgetAdmitted] = {
    require(budget >= 1, "budget must be >= 1")
    val fn = (_: String, it: Iterator[BudgetDoc], state: GroupState[Long]) => {
      var consumed = state.getOption.getOrElse(0L)
      if (consumed >= budget) Iterator.empty
      else {
        val out = Vector.newBuilder[BudgetAdmitted]
        it.toVector.sortBy(_.doc_id).foreach { d =>
          if (consumed < budget) {
            consumed += d.n_tokens
            out += BudgetAdmitted(d.doc_id, d.stratum, d.n_tokens, consumed)
          }
        }
        state.update(consumed)
        out.result().iterator
      }
    }
    docs.groupByKey(_.stratum)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Relational single-epoch admission against explicit per-stratum consumed
    * offsets — the replay form of one micro-batch, shared by the
    * `sample_budget_stream` batch replay. Bit-equal to what [[admit]] does
    * with `consumed` in state: base + in-batch cumulative sum in doc_id
    * order, keep while the exclusive prefix is under budget. `consumed`
    * cardinality is the stratum count (a quota map is human-sized);
    * the literal CASE chain keeps the plan broadcast-free.
    */
  def admitBatch(
      consumed: Map[String, Long],
      batch: DataFrame,
      budget: Long,
      strataCol: String,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val baseCol: Column = consumed.foldRight(lit(0L): Column) { case ((s, c), rest) =>
      when(col(strataCol) === s, lit(c)).otherwise(rest)
    }
    val w = Window.partitionBy(col(strataCol)).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    batch
      .withColumn("n_tokens", size(TextFunctions.tokens(col(textCol))).cast("long"))
      .withColumn("cum_tokens", baseCol + sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") - col("n_tokens") < lit(budget))
      .select(col(idCol).cast("long").as("doc_id"),
        col(strataCol).cast("string").as("stratum"),
        col("n_tokens"), col("cum_tokens"))
  }
}
