package graft.bench

import scala.collection.concurrent.TrieMap
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Attributes Spark stage wall-clock and executor task time to the
  * query that submitted the job, via the thread-local job group set by
  * the caller (`SparkContext.setJobGroup`).
  *
  * Two attribution hazards are handled here (round-6 verdict items
  * 1/7 and the ADVICE listener-drain note):
  *
  *  - '''Broadcast jobs.''' Broadcast exchanges run on a shared
  *    lazily-created thread pool, so a broadcast job can carry the
  *    job-group of whichever query first forced the pool into
  *    existence — or none at all. Every job also carries its SQL
  *    execution id (`spark.sql.execution.id` /
  *    `spark.sql.execution.root.id`), which IS stable across the
  *    broadcast pool. Metrics are therefore accumulated per JOB and
  *    resolved to a query group only at snapshot time: a job with no
  *    (or a foreign-pool) group is attributed through its execution
  *    id to the group that owns that execution.
  *  - '''Async listener bus.''' Events arrive on a separate thread;
  *    a fixed post-hoc sleep can drop late stage/task events on a
  *    loaded host, making a query's stage time read 0.0 —
  *    indistinguishable from genuinely-zero stage time.
  *    [[awaitQuiescent]] instead polls until both (a) every started
  *    job has ended and (b) two successive metric fingerprints are
  *    identical, bounded by `maxWaitMs`.
  *
  * Round-9 addition: PER-STAGE accounting, because the serial-stage
  * signature (a CPU-heavy stage AQE-coalesced — or file-layout-
  * collapsed — to ~1 task) hides inside per-query sums: a query with
  * six healthy stages and one serial 5 s stage still shows an
  * innocuous-looking aggregate ratio. [[Snapshot.heavyStagePar]]
  * surfaces, per query, the minimum effective parallelism
  * (taskTime / stageWall) over its stages with ≥ [[HeavyStageSec]] of
  * task time — the exact signal that found q35b and q87b by hand in
  * rounds 7-8, now emitted every bench run so a regression
  * self-reports. Iterative operators (shard CC, perceptron epochs)
  * do NOT false-positive: their per-stage task times sit far below
  * the threshold; their cost is round count, not a serial stage.
  */
final class QueryMetricsListener extends SparkListener {

  /** A stage qualifies as "heavy" (worth a parallelism verdict) at
    * this much total executor task time. Below it, stage wall is
    * dominated by scheduling, and taskTime/wall is noise. */
  val HeavyStageSec = 0.5

  private final case class JobMeta(group: String, execId: String,
                                   nStages: Int)

  private val jobMeta = TrieMap[Int, JobMeta]()
  private val stageJob = TrieMap[Int, Int]()
  // keyed by (stageId, attemptNumber): a retried stage must not mix
  // attempt A's task time with attempt B's wall — put-by-stageId let a
  // genuinely serial retried stage read as parallel (taskTime summed
  // across attempts over the LAST attempt's wall) and dodge the
  // serial_suspects watchdog
  private val stageWallM = TrieMap[(Int, Int), Double]()
  private val stageTaskM = TrieMap[(Int, Int), Double]()
  private val stageNTask = TrieMap[(Int, Int), Int]()
  private val stageNameM = TrieMap[(Int, Int), String]()
  private val jobsStarted = new java.util.concurrent.atomic.AtomicLong(0)
  private val jobsEnded = new java.util.concurrent.atomic.AtomicLong(0)

  override def onJobStart(js: SparkListenerJobStart): Unit = {
    val p = Option(js.properties)
    def prop(k: String): String =
      p.flatMap(pp => Option(pp.getProperty(k))).getOrElse("")
    // root.id survives nested executions (e.g. AQE re-optimization
    // subqueries); fall back to the plain execution id
    val execId = Some(prop("spark.sql.execution.root.id"))
      .filter(_.nonEmpty).getOrElse(prop("spark.sql.execution.id"))
    jobMeta.put(js.jobId,
      JobMeta(prop("spark.jobGroup.id"), execId, js.stageIds.length))
    js.stageIds.foreach(sid => stageJob.put(sid, js.jobId))
    jobsStarted.incrementAndGet()
  }

  override def onJobEnd(je: SparkListenerJobEnd): Unit = {
    jobsEnded.incrementAndGet()
  }

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val si = sc.stageInfo
    for {
      sub <- si.submissionTime
      done <- si.completionTime
    } {
      stageWallM.put((si.stageId, si.attemptNumber), (done - sub) / 1e3)
      stageNTask.put((si.stageId, si.attemptNumber), si.numTasks)
      stageNameM.put((si.stageId, si.attemptNumber), si.name)
    }
  }

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
    for (ti <- Option(te.taskInfo))
      stageTaskM.updateWith((te.stageId, te.stageAttemptId))(o =>
        Some(o.getOrElse(0.0) + ti.duration / 1e3))

  /** Resolve a job to its query group through the execution-id →
    * owning-group map (covers the broadcast-pool case where the
    * broadcast job carries no — or a stale, pool-inherited — group).
    * The execution's owner is the group whose jobs contribute the
    * most stages under that execution id: the query's own action job
    * carries the full DAG, a stray broadcast job carries one or two
    * stages, so stage-count majority picks the real owner even when
    * two groups claim the same execution. */
  private def resolvedGroups(): Map[Int, String] = {
    val execOwner: Map[String, String] = jobMeta.values.toSeq
      .filter(m => m.execId.nonEmpty && m.group.nonEmpty)
      .groupBy(_.execId)
      .map { case (eid, ms) =>
        eid -> ms.groupBy(_.group).view
          .mapValues(_.map(_.nStages).sum).toSeq
          .maxBy { case (g, n) => (n, g) }._1
      }
    jobMeta.map { case (jid, m) =>
      val g =
        if (m.execId.nonEmpty) execOwner.getOrElse(m.execId, m.group)
        else m.group
      jid -> g
    }.toMap
  }

  import QueryMetricsListener.{Snapshot, StageRec}

  def snapshot(): Snapshot = {
    val groups = resolvedGroups()
    def groupOf(sid: Int): String =
      stageJob.get(sid).flatMap(groups.get).getOrElse("")
    val recs: Seq[(String, StageRec)] = stageWallM.toSeq.map {
      case (key @ (sid, _), wall) =>
        groupOf(sid) -> StageRec(sid, wall,
          stageTaskM.getOrElse(key, 0.0), stageNTask.getOrElse(key, 0),
          stageNameM.getOrElse(key, ""))
    }
    val byGroup = recs.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(_._2).sortBy(_.stageId)
    }
    Snapshot(
      byGroup.map { case (g, rs) => g -> rs.map(_.wall).sum },
      byGroup.map { case (g, rs) => g -> rs.map(_.taskTime).sum },
      byGroup)
  }

  /** (stageWall, taskTime) per query group, then reset — the
    * pre-round-9 interface, kept for the simple callers. */
  def snapshotAndReset(): (Map[String, Double], Map[String, Double]) = {
    val s = snapshotFullAndReset()
    (s.stageWall, s.taskTime)
  }

  def snapshotFullAndReset(): Snapshot = {
    val s = snapshot()
    jobMeta.clear(); stageJob.clear()
    stageWallM.clear(); stageTaskM.clear(); stageNTask.clear(); stageNameM.clear()
    s
  }

  /** Wait (bounded) until the async listener bus has delivered
    * everything: all started jobs ended AND two successive metric
    * fingerprints identical. Returns true if quiescent, false if the
    * bound was hit (metrics may undercount — callers should flag). */
  def awaitQuiescent(maxWaitMs: Long = 10000, pollMs: Long = 100): Boolean = {
    val deadline = System.nanoTime() + maxWaitMs * 1000000L
    def fingerprint(): (Long, Long, Int, Int, Double, Double) =
      (jobsStarted.get(), jobsEnded.get(), stageWallM.size,
        stageTaskM.size, stageWallM.values.sum, stageTaskM.values.sum)
    var prev = fingerprint()
    while (System.nanoTime() < deadline) {
      Thread.sleep(pollMs)
      val cur = fingerprint()
      if (cur == prev && cur._1 == cur._2) return true
      prev = cur
    }
    false
  }
}

object QueryMetricsListener {

  /** One completed stage attributed to a query group. `par` =
    * taskTime/wall — the effective number of cores the stage kept
    * busy; ~1.0 on a 32-core host is the serial-stage signature. */
  final case class StageRec(stageId: Int, wall: Double, taskTime: Double,
                            nTasks: Int, name: String = "") {
    def par: Double = if (wall > 0) taskTime / wall else Double.NaN
  }

  /** Per-query-group metrics for one measurement window. */
  final case class Snapshot(stageWall: Map[String, Double],
                            taskTime: Map[String, Double],
                            stages: Map[String, Seq[StageRec]]) {
    /** Minimum effective parallelism over each query's HEAVY stages
      * (task time ≥ threshold); queries with no heavy stage are
      * absent — their wall is scheduling, not a serial stage. */
    def heavyStagePar(threshold: Double): Map[String, Double] =
      stages.flatMap { case (g, ss) =>
        val heavy = ss.filter(s => s.taskTime >= threshold && s.wall > 0)
        if (heavy.isEmpty) None
        else Some(g -> heavy.map(_.par).min)
      }
  }
}
