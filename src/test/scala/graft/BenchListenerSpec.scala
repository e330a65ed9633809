package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench attribution contract (round-6 verdict item 7 + the
  * listener-drain ADVICE): stage wall / task time land on the query
  * group that owns the work — including broadcast-exchange jobs,
  * which run on a shared pool and can carry no (or a foreign) job
  * group — and the snapshot is taken only after the async listener
  * bus is quiescent, not after a fixed sleep. */
class BenchListenerSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("broadcast-heavy concurrent queries attribute to their own groups; no unattributed bucket") {
    val listener = new graft.bench.QueryMetricsListener
    spark.sparkContext.addSparkListener(listener)
    try {
      // two queries, each forcing an explicit broadcast join, run
      // concurrently under distinct job groups from distinct threads
      def broadcastQuery(group: String, seed: Int): Unit = {
        spark.sparkContext.setJobGroup(group, group, interruptOnCancel = false)
        try {
          val fact = spark.range(0, 20000)
            .select((col("id") % 97).as("k"), (col("id") * seed).as("v"))
          val dim = spark.range(0, 97)
            .select(col("id").as("k"), concat(lit(s"dim$seed-"), col("id")).as("name"))
          fact.join(broadcast(dim), "k")
            .groupBy("name").agg(sum("v"))
            .write.format("noop").mode("overwrite").save()
        } finally spark.sparkContext.clearJobGroup()
      }
      listener.snapshotAndReset()
      val t1 = new Thread(() => broadcastQuery("qa", 3))
      val t2 = new Thread(() => broadcastQuery("qb", 7))
      t1.start(); t2.start(); t1.join(); t2.join()

      assert(listener.awaitQuiescent(maxWaitMs = 15000),
        "listener bus did not quiesce within the bound")
      val (stageWall, taskTime) = listener.snapshotAndReset()
      // every job (incl. the broadcast-exchange jobs) resolves to one
      // of the two query groups — nothing lands in the "" bucket
      assert(stageWall.keySet.subsetOf(Set("qa", "qb")),
        s"unattributed stage time: $stageWall")
      assert(taskTime.keySet.subsetOf(Set("qa", "qb")),
        s"unattributed task time: $taskTime")
      assert(stageWall.getOrElse("qa", 0.0) > 0.0, s"qa got no stage wall: $stageWall")
      assert(stageWall.getOrElse("qb", 0.0) > 0.0, s"qb got no stage wall: $stageWall")
      assert(taskTime.getOrElse("qa", 0.0) > 0.0, s"qa got no task time: $taskTime")
      assert(taskTime.getOrElse("qb", 0.0) > 0.0, s"qb got no task time: $taskTime")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("snapshotAndReset resets: second snapshot is empty") {
    val listener = new graft.bench.QueryMetricsListener
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup("solo", "solo", interruptOnCancel = false)
      try spark.range(1000).select(sum("id"))
        .write.format("noop").mode("overwrite").save()
      finally spark.sparkContext.clearJobGroup()
      assert(listener.awaitQuiescent(maxWaitMs = 15000))
      val (sw1, _) = listener.snapshotAndReset()
      assert(sw1.contains("solo"), s"expected solo in $sw1")
      val (sw2, tt2) = listener.snapshotAndReset()
      assert(sw2.isEmpty && tt2.isEmpty)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("stage retries: attempts accounted separately — a serial retried stage cannot dodge the watchdog") {
    import org.apache.spark.scheduler._
    val listener = new graft.bench.QueryMetricsListener
    // synthetic events, fed directly (no bus): one job, one stage that
    // runs twice (attempt 0 fetch-failed and was resubmitted as
    // attempt 1), each attempt 10 s wall with ONE 10 s task — a
    // genuinely serial stage. The pre-fix put-by-stageId keyed wall to
    // the LAST attempt (10 s) while task time summed across attempts
    // (20 s), reading par=2.0; correct accounting reads par=1.0 per
    // attempt and 20 s total wall.
    def stageInfo(attempt: Int): StageInfo = {
      val si = new StageInfo(7, attempt, "s7", 1, Seq.empty, Seq.empty,
        "details", null, Seq.empty, None, 0, false, 0)
      si.submissionTime = Some(0L)
      si.completionTime = Some(10000L)
      si
    }
    val props = new java.util.Properties()
    props.setProperty("spark.jobGroup.id", "retryq")
    listener.onJobStart(SparkListenerJobStart(1, 0L, Seq(stageInfo(0)), props))
    def taskEnd(attempt: Int): SparkListenerTaskEnd = {
      val ti = new TaskInfo(100L + attempt, 0, 0, 0, 0L, "exec1", "host1",
        TaskLocality.PROCESS_LOCAL, false)
      ti.finishTime = 10000L // duration = 10 s
      SparkListenerTaskEnd(7, attempt, "ResultTask",
        org.apache.spark.Success, ti, null, null)
    }
    listener.onTaskEnd(taskEnd(0))
    listener.onStageCompleted(SparkListenerStageCompleted(stageInfo(0)))
    listener.onTaskEnd(taskEnd(1))
    listener.onStageCompleted(SparkListenerStageCompleted(stageInfo(1)))
    listener.onJobEnd(SparkListenerJobEnd(1, 20000L, JobSucceeded))

    val snap = listener.snapshot()
    assert(math.abs(snap.stageWall("retryq") - 20.0) < 1e-9,
      s"both attempts' wall must count: ${snap.stageWall}")
    assert(math.abs(snap.taskTime("retryq") - 20.0) < 1e-9)
    val par = snap.heavyStagePar(0.5)("retryq")
    assert(math.abs(par - 1.0) < 1e-9,
      s"serial retried stage must read par=1.0, not attempt-mixed: $par")
  }
}
