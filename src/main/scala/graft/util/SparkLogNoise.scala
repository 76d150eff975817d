package graft.util

import org.apache.logging.log4j.LogManager
import org.apache.logging.log4j.core.{Filter, LoggerContext}
import org.apache.logging.log4j.core.config.LoggerConfig
import org.apache.logging.log4j.core.filter.RegexFilter

/** Targeted suppression of a known-benign Spark log artifact.
  *
  * The engine's eager `localCheckpoint(true)` + immediate unpersist
  * pattern (e.g. the renko scan's job-1 materialization) lets straggler
  * task completions report their SQL-metric accumulators after the owning
  * query execution is GC'd; the DAGScheduler then logs an ERROR stack
  * trace ("Failed to update accumulator … attempted to access non-existent
  * accumulator") for an update that carries no information — the query is
  * finished and its result already materialized. At ~150 traces per test
  * run the noise buries anything real, so Bench/Verify/tests deny exactly
  * that message on exactly that logger; every other DAGScheduler ERROR
  * (job aborts, stage failures) still logs, and real failures also
  * surface as exceptions to the caller regardless.
  */
object SparkLogNoise {

  /** Install a DENY RegexFilter for accumulator-update failures on the
    * DAGScheduler logger. Idempotent per JVM; safe to call before or
    * after SparkSession creation.
    */
  def suppressAccumulatorUpdateErrors(): Unit = synchronized {
    if (!installed) {
      val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
      val cfg = ctx.getConfiguration
      val name = "org.apache.spark.scheduler.DAGScheduler"
      val filter = RegexFilter.createFilter(
        ".*Failed to update accumulator.*", null, false,
        Filter.Result.DENY, Filter.Result.NEUTRAL)
      val nearest = cfg.getLoggerConfig(name)
      val lc =
        if (nearest.getName == name) nearest
        else {
          // no dedicated config yet: add one (additive, parent level) so
          // the filter scopes to DAGScheduler alone, never the root logger
          val created = new LoggerConfig(name, nearest.getLevel, true)
          cfg.addLogger(name, created)
          created
        }
      lc.addFilter(filter)
      ctx.updateLoggers()
      installed = true
    }
  }

  private var installed = false
}
