package graft.tools

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.LoggerContext
import org.apache.logging.log4j.core.LogEvent
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.{LoggerConfig, Property}

/** Captures Spark's REJECTED-join-hint warnings during plan
  * construction — the gate class the r14 `q_graph_ppr` defect showed
  * was missing: a `broadcast()` hint on a full outer join is silently
  * dropped by the analyzer/optimizer (Spark cannot broadcast either
  * side of a full outer join), so the documented plan and the
  * executed plan diverge with no error anywhere. The ONLY mechanical
  * signal Spark emits is a WARN through
  * `org.apache.spark.sql.catalyst.analysis.HintErrorLogger`
  * ("Hint (strategy=...) is not supported in the query: ..."); this
  * helper attaches an in-memory log4j2 appender to exactly that
  * logger (its own LoggerConfig, level forced to WARN so a runner's
  * `setLogLevel("ERROR")` cannot filter the events away) for the
  * duration of `body`, and returns whatever it logged.
  *
  * PlanAudit wraps every declared query's plan construction in
  * [[capture]] and FAILS on any dropped hint (no whitelist — the
  * engine has no legitimate rejected hint; a hint that cannot apply
  * should not be written). The mechanism itself is spec-pinned by
  * planting a `broadcast(...full outer...)` and asserting the
  * warning is caught.
  */
object HintAudit {
  private val HintLogger =
    "org.apache.spark.sql.catalyst.analysis.HintErrorLogger"

  private final class Buf extends AbstractAppender(
      "graft-hint-audit", null, null, false, Property.EMPTY_ARRAY) {
    val msgs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    override def append(e: LogEvent): Unit =
      msgs.add(e.getMessage.getFormattedMessage)
  }

  /** Run `body`; return (result, hint warnings logged while it ran).
    * Synchronized: the appender is registered on a global logger, so
    * concurrent captures would cross-attribute warnings. */
  def capture[T](body: => T): (T, Seq[String]) = synchronized {
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    val nearest = cfg.getLoggerConfig(HintLogger)
    // getLoggerConfig returns the nearest ANCESTOR config when the
    // exact logger has none — attaching there would capture (and
    // re-level) half of Spark. Ensure a dedicated config node.
    val own = nearest.getName == HintLogger
    val lc =
      if (own) nearest
      else {
        val fresh = new LoggerConfig(HintLogger, Level.WARN, true)
        cfg.addLogger(HintLogger, fresh)
        fresh
      }
    val prevLevel = lc.getLevel
    lc.setLevel(Level.WARN)
    val app = new Buf
    app.start()
    lc.addAppender(app, Level.WARN, null)
    ctx.updateLoggers()
    try {
      val r = body
      val out = scala.collection.mutable.ListBuffer.empty[String]
      app.msgs.forEach(m => out += m)
      (r, out.toList)
    } finally {
      lc.removeAppender(app.getName)
      if (own) lc.setLevel(prevLevel) else cfg.removeLogger(HintLogger)
      ctx.updateLoggers()
      app.stop()
    }
  }
}
