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
  */
final class QueryMetricsListener extends SparkListener {

  private final case class JobMeta(group: String, execId: String,
                                   nStages: Int)

  private val jobMeta = TrieMap[Int, JobMeta]()
  private val stageJob = TrieMap[Int, Int]()
  private val jobStageWall = TrieMap[Int, Double]()
  private val jobTaskTime = TrieMap[Int, Double]()
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
      jid <- stageJob.get(si.stageId)
      sub <- si.submissionTime
      done <- si.completionTime
    } jobStageWall.updateWith(jid)(o => Some(o.getOrElse(0.0) + (done - sub) / 1e3))
  }

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
    for {
      jid <- stageJob.get(te.stageId)
      ti <- Option(te.taskInfo)
    } jobTaskTime.updateWith(jid)(o => Some(o.getOrElse(0.0) + ti.duration / 1e3))

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

  /** (stageWall, taskTime) per query group, then reset. */
  def snapshotAndReset(): (Map[String, Double], Map[String, Double]) = {
    val groups = resolvedGroups()
    def agg(per: TrieMap[Int, Double]): Map[String, Double] =
      per.toSeq
        .groupBy { case (jid, _) => groups.getOrElse(jid, "") }
        .map { case (g, kv) => g -> kv.map(_._2).sum }
    val s = (agg(jobStageWall), agg(jobTaskTime))
    jobMeta.clear(); stageJob.clear()
    jobStageWall.clear(); jobTaskTime.clear()
    s
  }

  /** Wait (bounded) until the async listener bus has delivered
    * everything: all started jobs ended AND two successive metric
    * fingerprints identical. Returns true if quiescent, false if the
    * bound was hit (metrics may undercount — callers should flag). */
  def awaitQuiescent(maxWaitMs: Long = 10000, pollMs: Long = 100): Boolean = {
    val deadline = System.nanoTime() + maxWaitMs * 1000000L
    def fingerprint(): (Long, Long, Int, Int, Double, Double) =
      (jobsStarted.get(), jobsEnded.get(), jobStageWall.size,
        jobTaskTime.size, jobStageWall.values.sum, jobTaskTime.values.sum)
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
