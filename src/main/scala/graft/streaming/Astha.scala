package graft.streaming

import java.util.concurrent.{ConcurrentHashMap, Executors, ScheduledExecutorService, TimeUnit}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import graft.engine.Changefeed
import graft.engine.Changefeed.CdcEvent

/** Event-distribution scheduler — the Astha analog
  * (server/astha/scheduler.go:14-75 structure, :216-330 distribution;
  * astha/types.go Subscriber/ComponentInfo; event cadence from
  * astha/README.md Quick Start: poll 100 ms, batches of 256).
  *
  * Components implement [[Subscriber]] and register with the tables
  * they care about ("tables", "databases", "table_files"). The
  * scheduler polls the durable [[Changefeed]] log, delivers each new
  * event to every subscribed component, and only advances a
  * component's cursor past events it processed without throwing —
  * at-least-once, per component, exactly like the reference (an event
  * is only marked processed when every subscriber succeeded;
  * scheduler.go distributeEvents). Events every subscriber has
  * consumed are deleted from the log ("immediate cleanup").
  *
  * Health: onHealth runs each poll round; a component that fails
  * delivery or health is marked "error" (ComponentInfo.Status) and
  * retried next round — it is not dropped, matching the reference's
  * recovery-via-OnRefresh model.
  */
object Astha {

  /** astha/types.go Subscriber[T], minus Go's context plumbing. */
  trait Subscriber {
    /** Handle one event; THROW to signal failure (the event will be
      * redelivered next round). */
    def onEvent(event: CdcEvent): Unit
    /** Liveness probe; false marks the component unhealthy. */
    def onHealth(): Boolean = true
    /** Full re-sync from the registry — called at registration and
      * when the component recovers from error. */
    def onRefresh(): Unit = ()
  }

  final case class ComponentInfo(name: String, version: String,
                                 subscriptions: Seq[String],
                                 status: String, lastSeenMs: Long)

  /** One `system.cdc_subscribers` row — the per-component face of the
    * reference's event_store.go stats surface: where each subscriber's
    * cursor sits, how far behind the log head it is, and whether it is
    * quarantined, so a deployment SEES a stuck subscriber instead of
    * inferring it from a growing event dir. */
  final case class SubscriberRow(component: String, version: String,
                                 subscriptions: String, status: String,
                                 cursor: Long, lag: Long, processed: Long,
                                 consecutiveFailures: Long,
                                 quarantined: Boolean, lastSeenMs: Long,
                                 schedulerCleaned: Long)
}

/** @param cleanupProcessed delete events every live subscriber has
  *   passed (the reference's "immediate cleanup" — its registry is
  *   single-process SQLite). Set FALSE when other processes may share
  *   the warehouse's changefeed: this scheduler only knows ITS OWN
  *   cursors, and cleaning to them would silently drop events a peer
  *   process's subscribers have not consumed yet — the retention
  *   sweep ([[graft.engine.Changefeed.retain]]) bounds growth
  *   instead. */
final class AsthaScheduler(spark: SparkSession,
                           pollIntervalMs: Long = 100L,
                           batchSize: Int = 256,
                           quarantineAfter: Int = 5,
                           cleanupProcessed: Boolean = true) {
  import Astha._

  private final class State(val info: ComponentInfo, val instance: Subscriber) {
    @volatile var status: String = "active"
    @volatile var lastSeenMs: Long = System.currentTimeMillis()
    // deliver only events logged after registration (the reference
    // distributes events stored while the component is subscribed)
    @volatile var cursor: Long = 0L
    @volatile var wasError: Boolean = false
    @volatile var consecutiveFailures: Int = 0
    @volatile var quarantinedAtRound: Long = -1L
    val processed = new java.util.concurrent.atomic.AtomicLong
  }

  // JVM-wide registry for the observability face: system.cdc_subscribers
  // lists every live scheduler's components for the asking session
  AsthaScheduler.instances.add(this)

  private[streaming] def session: SparkSession = spark

  /** Per-component stats rows ([[Astha.SubscriberRow]]); `logHead` is
    * the changefeed's current max id (passed in so one listing serves
    * every scheduler on the warehouse). */
  def subscriberRows(logHead: Long): Seq[SubscriberRow] =
    components.values().asScala.toSeq.sortBy(_.info.name).map { st =>
      SubscriberRow(st.info.name, st.info.version,
        st.info.subscriptions.mkString(","), st.status, st.cursor,
        math.max(0L, logHead - st.cursor), st.processed.get,
        st.consecutiveFailures.toLong, st.quarantinedAtRound >= 0,
        st.lastSeenMs, cleanedCount.get)
    }

  private val components = new ConcurrentHashMap[String, State]()
  @volatile private var exec: Option[ScheduledExecutorService] = None
  // event_store.go GetProcessedCount / GetEventCount parity
  private val processedCount = new java.util.concurrent.atomic.AtomicLong
  private val cleanedCount = new java.util.concurrent.atomic.AtomicLong

  /** Events delivered successfully across all components, events
    * removed by cleanup (the reference EventStore's counters), and the
    * number of currently quarantined components. */
  def stats: Map[String, Long] = Map(
    "processed" -> processedCount.get,
    "cleaned" -> cleanedCount.get,
    "components" -> components.size.toLong,
    "quarantined" -> components.values().asScala
      .count(_.quarantinedAtRound >= 0).toLong)

  /** scheduler.go RegisterComponent — validation mirrored: empty name,
    * empty subscriptions, and nil instance are errors. */
  def register(info: ComponentInfo, instance: Subscriber): Unit = {
    require(info.name.nonEmpty, "component name cannot be empty")
    require(info.subscriptions.nonEmpty,
      "component must subscribe to at least one table")
    require(instance != null, "component instance cannot be nil")
    val st = new State(info, instance)
    st.cursor = Changefeed.maxId(spark)
    components.put(info.name, st)
    // registration refresh: the component syncs from the registry once,
    // then stays current via events
    try instance.onRefresh() catch { case _: Exception => () }
  }

  def unregister(name: String): Unit = {
    if (components.remove(name) == null)
      throw new IllegalArgumentException(s"component not found: $name")
  }

  def componentInfo(name: String): Option[ComponentInfo] =
    Option(components.get(name)).map(s =>
      s.info.copy(status = s.status, lastSeenMs = s.lastSeenMs))

  def listComponents(): Seq[ComponentInfo] =
    components.values().asScala.toSeq
      .map(s => s.info.copy(status = s.status, lastSeenMs = s.lastSeenMs))
      .sortBy(_.name)

  def start(): Unit = synchronized {
    if (exec.isDefined) return
    val e = Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-astha-scheduler"); t.setDaemon(true); t
    })
    e.scheduleWithFixedDelay(() => {
      try tick()
      catch { case ex: Exception =>
        System.err.println(s"[astha] distribution round failed: ${ex.getMessage}")
      }
    }, pollIntervalMs, pollIntervalMs, TimeUnit.MILLISECONDS)
    exec = Some(e)
  }

  def stop(): Unit = synchronized {
    exec.foreach { e => e.shutdown(); e.awaitTermination(5, TimeUnit.SECONDS) }
    exec = None
    AsthaScheduler.instances.remove(this)
  }

  private var round = 0L

  /** One distribution round (also callable directly — specs drive the
    * scheduler deterministically without sleeping on the poll timer).
    * The log is listed ONCE per round; each component gets its OWN
    * batchSize window of that index (a slow component's window no
    * longer caps how far fast components can read — the round-4 tick
    * fetched one batch from the MINIMUM cursor, so one stuck
    * subscriber starved every other). Each event file is read at most
    * once per round regardless of how many components consume it.
    *
    * Quarantine: `quarantineAfter` consecutive delivery failures mark
    * a component "quarantined" — it stops receiving events and stops
    * pinning the cleanup floor. On a later healthy probe it is
    * recovered through onRefresh (full registry re-sync, the
    * reference's recovery path) and resumes from the live head; the
    * events it failed on may have been cleaned and are NOT redelivered. */
  def tick(): Unit = {
    round += 1
    val comps = components.values().asScala.toSeq
    if (comps.isEmpty) return
    val live = comps.filter(_.quarantinedAtRound < 0)
    if (live.nonEmpty) {
      val index = Changefeed.index(spark)
      val cache = scala.collection.mutable.Map.empty[Long, Option[Changefeed.CdcEvent]]
      live.foreach { st =>
        val slice = index.iterator.filter(_._1 > st.cursor).take(batchSize)
          .flatMap { case (id, p) =>
            cache.getOrElseUpdate(id, Changefeed.read(spark, p))
          }.toSeq
        deliverTo(st, slice)
      }
    }
    comps.foreach(healthCheck)
    // cleanup: every event all live subscribers have passed is done;
    // quarantined components do not hold the floor. Skipped when this
    // scheduler is not the warehouse's only consumer (see class doc).
    if (cleanupProcessed) {
      val holders = components.values().asScala.filter(_.quarantinedAtRound < 0)
      if (holders.nonEmpty) {
        val floor = holders.map(_.cursor).min
        if (floor > 0) cleanedCount.addAndGet(Changefeed.cleanup(spark, floor).toLong)
      }
    }
  }

  private def deliverTo(st: State, all: Seq[Changefeed.CdcEvent]): Unit = {
    val pending = all.filter(_.id > st.cursor)
    def subscribed(e: Changefeed.CdcEvent): Boolean =
      st.info.subscriptions.contains(e.table) ||
        st.info.subscriptions.contains("*") // "*" = the full feed
    val batch = pending.filter(subscribed)
    // advance over events this component does not subscribe to — they
    // must not hold the cleanup floor back
    pending.takeWhile(e => !subscribed(e)).lastOption
      .foreach(e => st.cursor = math.max(st.cursor, e.id))
    if (batch.isEmpty) return
    if (st.wasError) {
      // recovery path: a component returning from error re-syncs first
      try { st.instance.onRefresh(); st.wasError = false }
      catch { case _: Exception => return }
    }
    batch.foreach { e =>
      if (st.cursor == e.id - 1 || st.cursor < e.id) {
        try {
          st.instance.onEvent(e)
          st.cursor = e.id
          st.status = "active"
          st.consecutiveFailures = 0
          st.lastSeenMs = System.currentTimeMillis()
          processedCount.incrementAndGet()
          st.processed.incrementAndGet()
        } catch {
          case ex: Exception =>
            st.status = "error"
            st.wasError = true
            st.consecutiveFailures += 1
            if (st.consecutiveFailures >= quarantineAfter) {
              st.status = "quarantined"
              st.quarantinedAtRound = round
              System.err.println(
                s"[astha] ${st.info.name} quarantined after " +
                  s"${st.consecutiveFailures} consecutive failures on event ${e.id}")
            } else System.err.println(
              s"[astha] ${st.info.name} failed on event ${e.id}: ${ex.getMessage}")
            return // stop the batch; redeliver from cursor next round
        }
      }
    }
  }

  private def healthCheck(st: State): Unit =
    try {
      if (st.instance.onHealth()) {
        st.lastSeenMs = System.currentTimeMillis()
        if (st.quarantinedAtRound >= 0 && round > st.quarantinedAtRound) {
          // recovery: healthy again on a LATER round — re-sync via
          // onRefresh and resume from the live head (missed events may
          // already be cleaned; the refresh covers them)
          try {
            st.instance.onRefresh()
            st.cursor = math.max(st.cursor, Changefeed.maxId(spark))
            st.quarantinedAtRound = -1L
            st.consecutiveFailures = 0
            st.wasError = false
            st.status = "active"
          } catch { case _: Exception => () } // stay quarantined
        } else if (st.status != "error" && st.status != "quarantined")
          st.status = "active"
      } else if (st.status != "quarantined") st.status = "unhealthy"
    } catch {
      case _: Exception =>
        if (st.status != "quarantined") st.status = "unhealthy"
    }
}

object AsthaScheduler {
  /** Live schedulers in this JVM ([[stop]] deregisters). The
    * observability face ([[graft.engine.SystemTables]]'s
    * `system.cdc_subscribers`) walks this to list every component's
    * cursor/lag/quarantine state for the asking session. */
  private[streaming] val instances =
    java.util.concurrent.ConcurrentHashMap.newKeySet[AsthaScheduler]()

  /** Subscriber rows of every live scheduler bound to `spark`'s
    * warehouse session. */
  def subscriberRowsFor(spark: SparkSession): Seq[Astha.SubscriberRow] = {
    import scala.jdk.CollectionConverters._
    val head = Changefeed.maxId(spark)
    // subscribers of THIS warehouse's changefeed (connection sessions
    // are newSession() clones — identity comparison would hide them)
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    instances.asScala.toSeq
      .filter(_.session.conf.get("spark.sql.warehouse.dir") == wh)
      .flatMap(_.subscriberRows(head))
      .sortBy(_.component)
  }
}
