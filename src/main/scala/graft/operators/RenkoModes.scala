package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The seven renko OHLC "modes" as pure projections of the wide brick table
  * (reference `Renko.renko_df`, `/root/reference/src/renkodf/renkodf.py:291-387`,
  * and `RenkoWS.renko_df`, `:692-765`).
  *
  * Because every mode variant is computed during the scan, a mode view is a
  * `select` with aliases — fully Catalyst-visible, so column pruning reaches
  * the scan output and seven views share one computation (the reference gets
  * the same effect by materializing the wide frame once, `CHANGELOG.md:19-21`).
  */
object RenkoModes {

  val all: Seq[String] = Seq(
    "normal", "wicks", "nongap",
    "reverse-wicks", "reverse-nongap",
    "fake-r-wicks", "fake-r-nongap")

  /** (open, high, low) source columns per mode (renkodf.py:339-380). */
  private val sources: Map[String, (String, String, String)] = Map(
    "normal" -> (("open", "normal_high", "normal_low")),
    "wicks" -> (("open", "high", "low")),
    "nongap" -> (("nongap_open", "high", "low")),
    "reverse-wicks" -> (("open", "reverse_high", "reverse_low")),
    "reverse-nongap" -> (("reverse_nongap_open", "reverse_high", "reverse_low")),
    "fake-r-wicks" -> (("open", "fake_high", "fake_low")),
    "fake-r-nongap" -> (("reverse_fake_nongap_open", "fake_high", "fake_low")))

  /** Project a wide brick table (batch or streaming output) to one mode.
    *
    * Output order mirrors the reference (`open high low close volume` +
    * utils, renkodf.py:383-387) with the engine's `symbol`/time columns
    * prepended. Utils columns are whichever of `direction, is_reversal,
    * tick_index_open, tick_index_close` exist in the input — the streaming
    * table has no tick indices (renkodf.py:711).
    */
  def project(df: DataFrame, mode: String = "wicks", utilsColumns: Boolean = true): DataFrame = {
    if (!sources.contains(mode))
      throw new IllegalArgumentException(s"Only ${all.mkString("['", "', '", "']")} options are valid.")
    val (o, h, l) = sources(mode)
    val present = df.columns.toSet
    val lead: Seq[Column] =
      Seq("symbol", "datetime", "timestamp").filter(present).map(col)
    val ohlcv: Seq[Column] = Seq(
      col(o).as("open"), col(h).as("high"), col(l).as("low"),
      col("close"), col("volume"))
    val utils: Seq[Column] =
      if (utilsColumns)
        Seq("direction", "is_reversal", "tick_index_open", "tick_index_close")
          .filter(present).map(col)
      else Seq.empty
    df.select(lead ++ ohlcv ++ utils: _*)
  }
}
