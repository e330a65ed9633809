package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender

/** A silently-dropped join hint is how a plan regression hides: the
  * `broadcast()` the author relied on stops reaching a join (folded
  * crossJoin, aggregate consuming the hint) and Catalyst merely WARNs
  * through HintErrorLogger while the plan quietly reverts to a
  * shuffle. This audit plans EVERY registered query with a capturing
  * appender attached and fails if any hint goes unapplied — the
  * round-11 bench tail carried exactly one such warning. */
class HintAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("no registered query drops a join hint") {
    val buf = collection.mutable.ArrayBuffer[String]()
    val app = new AbstractAppender(
        "graft-hint-capture", null, null, true,
        org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
      override def append(e: LogEvent): Unit =
        if (e.getLoggerName.endsWith("HintErrorLogger"))
          buf.synchronized { buf += e.getMessage.getFormattedMessage }
    }
    app.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    cfg.getRootLogger.addAppender(app, Level.WARN, null)
    ctx.updateLoggers()
    val offenders = collection.mutable.ArrayBuffer[(String, Seq[String])]()
    try {
      for ((name, f) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
        val before = buf.synchronized(buf.length)
        // optimizedPlan is where ResolveHints/EliminateResolvedHint
        // run — no execution needed
        try f(spark, TestSpark.sfDir).queryExecution.optimizedPlan
        catch { case _: Exception => () } // planning failures are other specs' business
        val after = buf.synchronized(buf.toSeq)
        if (after.length > before)
          offenders += name -> after.drop(before)
      }
    } finally {
      cfg.getRootLogger.removeAppender("graft-hint-capture")
      ctx.updateLoggers()
      app.stop()
    }
    assert(offenders.isEmpty,
      offenders.map { case (q, ms) => s"$q: ${ms.mkString(" | ")}" }
        .mkString("\n"))
  }
}
