package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-task-constant decomposition probe (round 17): the stagepar
  * sweep shows one ~10-14 task-sec 32-task stage in nearly every
  * heavy query — ~0.3-0.4 s PER TASK against a ~230 ms
  * single-threaded whole-corpus featurize. This isolates where that
  * per-task constant lives. Co-tenant noise swings single
  * measurements ~2x, so each probe reports the MIN heavy-stage task
  * time over `reps` measured runs (min tracks true compute). */
object StageCost {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkTuning.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new graft.bench.QueryMetricsListener
    spark.sparkContext.addSparkListener(listener)

    def probe(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save() // warm
      val samples = (1 to reps).map { _ =>
        listener.snapshotFullAndReset()
        spark.sparkContext.setJobGroup(name, name, interruptOnCancel = false)
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        val w = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.clearJobGroup()
        listener.awaitQuiescent()
        val snap = listener.snapshotFullAndReset()
        val ss = snap.stages.getOrElse(name, Nil)
        (w, ss.map(_.taskTime).sum, ss.map(_.taskTime).maxOption.getOrElse(0.0))
      }
      val minW = samples.map(_._1).min
      val minT = samples.map(_._2).min
      val minH = samples.map(_._3).min
      println(f"STAGECOST $name min_wall=$minW%.3f min_task_total=$minT%.3f " +
        f"min_heaviest_stage=$minH%.3f reps=$reps")
    }

    // materialize the shared shingle cache once
    graft.operators.Dedup.queries("q33_minhash_pairs")(spark, dir)
      .write.format("noop").mode("overwrite").save()

    // interleaved A/B: session-time drift (GC, co-tenant ramps) must
    // not masquerade as a shape effect. Compare, per round:
    //   collect  = groupBy(band,bh).collect_list (current shape)
    //   countagg = groupBy(band,bh).count (declarative codegen agg)
    //   joinpair = count-gated self-join pair generation (no object agg)
    def bands = graft.operators.Dedup.bandsForProbe(spark, dir, 32)
    for (round <- 1 to 3) {
      System.gc()
      probe(s"collect_r$round") {
        graft.operators.Dedup.bucketsForProbe(spark, dir, 32)
      }
      System.gc()
      probe(s"countagg_r$round") {
        bands.groupBy(col("band"), col("bh")).agg(count(lit(1)).as("c"))
          .where(col("c").between(2, 20))
      }
      System.gc()
      probe(s"joinpair_r$round") {
        val ok = bands.groupBy(col("band"), col("bh"))
          .agg(count(lit(1)).as("c"))
          .where(col("c").between(2, 20))
          .select(col("band"), col("bh"))
        val okBands = bands.join(ok, Seq("band", "bh"), "left_semi")
        val a = okBands.select(col("band"), col("bh"),
          col("doc_id").as("doc1"))
        val b = okBands.select(col("band"), col("bh"),
          col("doc_id").as("doc2"))
        a.join(b, Seq("band", "bh"))
          .where(col("doc2") > col("doc1"))
          .select(col("doc1"), col("doc2")).distinct()
      }
    }
    spark.stop()
  }
}
