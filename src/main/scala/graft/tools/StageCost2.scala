package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-metric breakdown probe: where inside the heavy shuffle-map
  * stage does the per-task constant live (cpu / gc / shuffle write /
  * deserialize / serialize)? */
object StageCost2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = graft.SparkTuning.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
    // A/B knobs via env (core confs — session-build time only)
    val b1 = sys.env.get("PROBE_BYPASS_THR")
      .map(v => b0.config("spark.shuffle.sort.bypassMergeThreshold", v))
      .getOrElse(b0)
    val b2 = sys.env.get("PROBE_LOCAL_DIR")
      .map(v => b1.config("spark.local.dir", v)).getOrElse(b1)
    val spark = b2.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var rows = Seq.empty[String]
    val l = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null && m.executorRunTime > 200) {
          rows = rows :+ (f"stage=${s.stageInfo.stageId} " +
            f"tasks=${s.stageInfo.numTasks} run=${m.executorRunTime}ms " +
            f"cpu=${m.executorCpuTime / 1000000}ms " +
            f"gc=${m.jvmGCTime}ms " +
            f"deser=${m.executorDeserializeTime}ms " +
            f"resSer=${m.resultSerializationTime}ms " +
            f"shufWrite=${m.shuffleWriteMetrics.writeTime / 1000000}ms " +
            f"shufBytes=${m.shuffleWriteMetrics.bytesWritten} " +
            f"shufRecs=${m.shuffleWriteMetrics.recordsWritten} " +
            f"input=${m.inputMetrics.recordsRead}")
        }
      }
    }
    spark.sparkContext.addSparkListener(l)

    def run(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save() // warm
      rows = Seq.empty
      mk.write.format("noop").mode("overwrite").save()
      Thread.sleep(1500)
      println(s"== $name")
      rows.foreach(r => println("  " + r))
    }

    graft.operators.Dedup.queries("q33_minhash_pairs")(spark, dir)
      .write.format("noop").mode("overwrite").save()

    run("bands_only") { graft.operators.Dedup.bandsForProbe(spark, dir, 32) }
    run("buckets") { graft.operators.Dedup.bucketsForProbe(spark, dir, 32) }
    run("countagg") {
      graft.operators.Dedup.bandsForProbe(spark, dir, 32)
        .groupBy(col("band"), col("bh")).agg(count(lit(1)).as("c"))
        .where(col("c").between(2, 20))
    }
    spark.stop()
  }
}
