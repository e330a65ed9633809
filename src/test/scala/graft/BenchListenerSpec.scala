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
}
