package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** q61d wave anatomy: capture EVERY stage of one memo-cleared
  * clusterMaintenanceReplay with full task-metric breakdown, so the
  * residual per-wave cost can be attributed (compute vs shuffle write
  * vs per-stage floor). */
object StageCost3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkTuning.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class Rec(id: Int, tasks: Int, run: Long, cpu: Long, gc: Long,
                   write: Long, submitted: Long, completed: Long)
    @volatile var recs = Vector.empty[Rec]
    val l = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) recs = recs :+ Rec(s.stageInfo.stageId,
          s.stageInfo.numTasks, m.executorRunTime,
          m.executorCpuTime / 1000000, m.jvmGCTime,
          m.shuffleWriteMetrics.writeTime / 1000000,
          s.stageInfo.submissionTime.getOrElse(0L),
          s.stageInfo.completionTime.getOrElse(0L))
      }
    }
    spark.sparkContext.addSparkListener(l)

    // warm (memoized), then clear + measure
    graft.operators.Dedup.queries("q61d_cluster_maintenance")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    graft.operators.Dedup.clearMaintainMemo()
    recs = Vector.empty
    val t0 = System.nanoTime()
    graft.operators.Dedup.queries("q61d_cluster_maintenance")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    val w = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000)
    val rs = recs
    println(f"Q61D wall=$w%.3f stages=${rs.size} " +
      f"sum_run=${rs.map(_.run).sum}ms sum_cpu=${rs.map(_.cpu).sum}ms " +
      f"sum_gc=${rs.map(_.gc).sum}ms sum_write=${rs.map(_.write).sum}ms")
    // stage-wall sum (serialized driver time between stages = wall - covered)
    val spans = rs.map(r => (r.submitted, r.completed)).sortBy(_._1)
    var covered = 0L; var cursor = 0L
    spans.foreach { case (s, e) =>
      if (e > cursor) { covered += e - math.max(s, cursor); cursor = e } }
    println(f"stage-covered wall=${covered / 1000.0}%.3f s " +
      f"(gaps = driver-only time)")
    val hist = rs.groupBy(r => if (r.run >= 1000) ">=1s task" else if (r.run >= 200) "0.2-1s" else "<0.2s")
    hist.foreach { case (k, v) =>
      println(f"  bucket $k: ${v.size} stages, sum_run=${v.map(_.run).sum}ms") }
    rs.sortBy(-_.run).take(10).foreach { r =>
      println(f"  stage=${r.id} tasks=${r.tasks} run=${r.run}ms cpu=${r.cpu}ms " +
        f"gc=${r.gc}ms write=${r.write}ms wall=${(r.completed - r.submitted)}ms") }
    spark.stop()
  }
}
