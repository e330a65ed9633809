package graft

import java.util.concurrent.Executors
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Methodology (round-2 verdict asked for attributable numbers):
  *  - every query materializes fully through the `noop` sink (count()
  *    would let Catalyst prune computed columns away);
  *  - pass 1 (unmeasured): full-suite warm-up — JVM/Janino JIT,
  *    codegen cache, parquet footers;
  *  - pass 2 (measured, `queries` + `sequential_total`): each query
  *    SEQUENTIALLY on the idle engine — true warm latency,
  *    regressions attributable to a single query. The q61 cluster
  *    memo is cleared right before its timing so the number is the
  *    real materialization, not a cache hit (round-5 verdict);
  *  - pass 3 (measured, `value` = `concurrent_wall`): 8-way
  *    concurrent, run FIVE times — `value` is the MEDIAN wall (one
  *    lucky quiet window cannot set the committed number;
  *    `concurrent_wall_best` records the floor, all walls publish in
  *    `concurrent_walls`), plus ONE further pass with every
  *    trained-model memo cleared → `concurrent_wall_train_inclusive`
  *    (model training inside the wall: the cold-start pipeline
  *    number, so the headline cannot improve by moving work into
  *    memos). Per-query latencies under load go to
  *    `queries_concurrent`, with `queries_stage_wall` (Σ stage
  *    submit→complete) and `queries_task_time` (Σ executor task
  *    time) from [[graft.bench.QueryMetricsListener]] so CONTENTION
  *    separates from DATA WORK: latency − stage_wall ≈ DAG/FAIR-pool
  *    queueing, and stage_wall × cores vs task_time shows in-stage
  *    core starvation (the round-5 q7/q8/q9 question);
  *  - `sched_floor_sec`: median latency of an empty one-task job —
  *    the per-query cost floor Spark charges regardless of data
  *    volume. sequential_total ≈ Σ(data work) + N * floor; the floor
  *    is flat in data size (it is the number to divide out when
  *    comparing against an embedded single-process engine at small
  *    scale factors).
  *
  * Output contract (round-6 verdict item 1): the driver keeps only
  * the TAIL (~2000 chars) of the printed line, so four full 95-entry
  * maps (~10k chars) pushed `queries_concurrent` out of BENCH_rN.
  * The COMPLETE result now goes to a file (`SPARK_GRAFT_BENCH_OUT`,
  * default `BENCH_full.json`, committed per round); the printed line
  * carries the headline keys plus only the 10 slowest sequential and
  * 10 slowest concurrent entries — the set every cross-round
  * regression analysis starts from. Headline keys still print LAST
  * so a harsher truncation keeps them.
  */
object Bench {

  /** Queries whose operator memoizes a derived artifact (cluster
    * labels, trained models): bypassed in the attributable sequential
    * pass by clearing ONLY the memo that query owns — clearing a
    * foreign memo would leave it cold for the concurrent passes,
    * whose timings assume every memo is warm (the
    * memoized_in_concurrent contract). The JSON flags the set. */
  private[graft] val MemoBypass: Map[String, () => Unit] = Map(
    "q61_dedup_clusters" -> (() => graft.operators.Dedup.clearClusterMemo()),
    "q89_bpe_merges" -> (() => graft.operators.Curation.clearBpeMemo()),
    "q89b_bpe_vocab" -> (() => graft.operators.Curation.clearBpeMemo()),
    "q89d_bpe_byte_merges" -> (() => graft.operators.Curation.clearBpeMemo()),
    "q88_kmeans_cells" -> (() => graft.operators.Similarity.clearLloydMemo()),
    "q88b_knn_ivf_lloyd" -> (() => graft.operators.Similarity.clearLloydMemo()),
    "q96_perceptron_weights" -> (() => graft.operators.Classifier.clearPerceptronMemo()),
    "q96b_perceptron_confusion" -> (() => graft.operators.Classifier.clearPerceptronMemo()),
    "q96d_perceptron_incremental" -> (() => graft.operators.Classifier.clearIncMemo()),
    // q61c: clear the maintained-label memo, NOT the pre-batch
    // artifacts (labels/bands/counts of the ingested corpus) — those
    // model persisted tables, the same contract as q87's banded corpus
    "q61c_incremental_clusters" -> (() => graft.operators.Dedup.clearIncClustersMemo()),
    "q61d_cluster_maintenance" -> (() => graft.operators.Dedup.clearMaintainMemo()))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_full.json")
    val spark = graft.SparkTuning.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new graft.bench.QueryMetricsListener
    spark.sparkContext.addSparkListener(listener)

    def run1(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      spark.sparkContext.setJobGroup(name, name, interruptOnCancel = false)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      finally spark.sparkContext.clearJobGroup()
      (System.nanoTime() - t0) / 1e9
    }

    val suite = SparkEntry.queries.toSeq.sortBy(_._1)

    // calm-host guard (round-12 verdict Next #9): the r12 driver bench
    // ran under external load and published a 24.9 s wall plus
    // spurious serial suspects. Wait (bounded) for the 1-min loadavg
    // to fall below half the cores before measuring, and publish the
    // load either way so a still-loaded run is self-identifying.
    val cores = Runtime.getRuntime.availableProcessors
    def loadavg: Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val loadWaitSec = sys.env.get("SPARK_GRAFT_BENCH_LOADWAIT")
      .flatMap(_.toIntOption).getOrElse(180)
    val calmT0 = System.nanoTime()
    var hostLoad = loadavg
    while (hostLoad > cores / 2.0 &&
           (System.nanoTime() - calmT0) / 1e9 < loadWaitSec) {
      System.err.println(
        f"[bench] host loadavg $hostLoad%.1f > ${cores / 2}: waiting for calm")
      Thread.sleep(15000)
      hostLoad = loadavg
    }

    // pass 1: full-suite warm-up (unmeasured) — warms the codegen
    // cache for every query shape, not just two representatives
    suite.foreach { case (n, f) => run1(s"warmup-$n", f) }

    // scheduling floor: empty one-task job, median of 5
    val floors = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      spark.range(1).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    val floor = floors(2)

    // pass 2: sequential warm latencies — memoized artifacts are
    // re-materialized so each number is attributable work. The
    // serial-stage snapshot is taken HERE (idle engine): under the
    // 8-way concurrent passes, host contention inflates every task
    // past the heavy-stage bar and a one-task 0.2 s scan reads as a
    // serial suspect — only the idle pass isolates the PLAN's
    // parallelism from the host's.
    listener.snapshotFullAndReset()
    val seqT0 = System.nanoTime()
    val sequential = suite.map { case (name, fn) =>
      MemoBypass.get(name).foreach(clear => clear())
      name -> run1(name, fn)
    }
    val seqTotal = (System.nanoTime() - seqT0) / 1e9
    listener.awaitQuiescent(maxWaitMs = 10000)
    val seqSnap = listener.snapshotFullAndReset()

    // pass 3: 8-way concurrent throughput, three times (best wall
    // reported below; all walls published in `concurrent_walls`).
    def concurrentPass(): (Seq[(String, Double)], Double, Boolean,
                           graft.bench.QueryMetricsListener.Snapshot) = {
      listener.snapshotFullAndReset()
      val pool = Executors.newFixedThreadPool(8)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val t0 = System.nanoTime()
      val futures = suite.map { case (name, fn) => Future(name -> run1(name, fn)) }
      val results = Await.result(Future.sequence(futures), Duration.Inf)
      val w = (System.nanoTime() - t0) / 1e9
      pool.shutdown()
      // the listener bus drains asynchronously; a fixed sleep can
      // drop late events on a loaded host — poll to quiescence
      // (bounded) and record whether the bound was hit
      val drained = listener.awaitQuiescent(maxWaitMs = 10000)
      (results, w, drained, listener.snapshotFullAndReset())
    }
    // FIVE passes, MEDIAN wall reported (round-7 verdict item 3: the
    // shared host shows multi-second variance beats — same binary,
    // same data: 3.3s and 8.5s walls minutes apart — and a best-of-3
    // lets one lucky quiet window set the committed number; the
    // median tracks the engine, `concurrent_wall_best` still records
    // the floor). The memoized caches (codebooks, shingle
    // projections, cluster labels — "the model store") stay warm
    // across passes by design. gc() between passes keeps a major
    // collection from landing mid-pass (observed 3s -> 9s outliers).
    val passes = scala.collection.mutable.ArrayBuffer.from((1 to 5).map { _ =>
      System.gc()
      concurrentPass()
    })
    // re-run protocol (round-12 verdict Next #9): a transient load
    // burst that inflated some of the five walls must not set the
    // committed median — keep adding passes (bounded) until the
    // median sits within 2x of the best wall, so BENCH_r{N}.json is
    // calm-host by construction (or visibly failed to be, via
    // `extra_passes` at its cap and the spread still wide)
    var extraPasses = 0
    while (extraPasses < 4 && {
      val ws = passes.map(_._2).toSeq
      ws.sorted.apply(ws.length / 2) > 2.0 * ws.min
    }) {
      extraPasses += 1
      System.err.println(s"[bench] wall spread > 2x best: extra pass $extraPasses")
      System.gc()
      passes += concurrentPass()
    }
    val walls = passes.map(_._2).toSeq
    val medianWall = walls.sorted.apply(walls.length / 2)
    val (concurrent, wall, drained, snap) =
      passes.minBy(p => math.abs(p._2 - medianWall))
    val (stageWall, taskTime) = (snap.stageWall, snap.taskTime)
    // serial-stage watchdog (round-8 verdict item 7): per query, the
    // minimum effective parallelism (taskTime/stageWall) over stages
    // with >= 0.5 s of task time, measured on the IDLE sequential
    // pass. Entries < 4.0 on a 32-core host are AQE-coalesced (or
    // file-layout-collapsed) serial stages — the q35b/q87b disease —
    // and publish as `serial_suspects` so a regression cannot hide in
    // per-query sums.
    val heavyParRaw: Map[String, Double] =
      seqSnap.heavyStagePar(listener.HeavyStageSec)
    // suspect RETRY (round-13): the sequential pass runs once and is
    // not load-guarded mid-run — a host burst stretches stage walls
    // and a genuinely-parallel query reads par ~1 (observed: q96
    // family + q94 flagged at 0.99 under loadavg 12, absent on a calm
    // host). A PLAN defect is serial on every attempt; a load
    // artifact clears on retry. Re-run each flagged query alone (gc +
    // brief calm wait first) and keep the MAX par across attempts —
    // only persistent entries publish. Round-14 hardening (r13
    // ADVICE): a FAILED retry run proves nothing and keeps the
    // original reading; a retry with no heavy stage clears the
    // suspect only when the retried wall is itself small (a
    // multi-second query with no >=0.5 s stage would be a listener
    // anomaly, not evidence of parallelism) — cleared queries publish
    // under `retry_cleared`, never as fake ratios in the par map.
    val retryCleared = scala.collection.mutable.ArrayBuffer[String]()
    def retryRun(name: String,
                 fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Boolean) = {
      spark.sparkContext.setJobGroup(name, name, interruptOnCancel = false)
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] retry $name failed: ${e.getMessage}"); false }
        finally spark.sparkContext.clearJobGroup()
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    val heavyPar: Map[String, Double] = heavyParRaw.flatMap { case (q, p0) =>
      var p = p0
      var cleared = false
      var attempts = 0
      while (p < 4.0 && !cleared && attempts < 2) {
        attempts += 1
        System.gc()
        var waited = 0
        while (loadavg > cores / 2.0 && waited < loadWaitSec) {
          Thread.sleep(5000); waited += 5
        }
        suite.find(_._1 == q).foreach { case (name, fn) =>
          MemoBypass.get(name).foreach(clear => clear())
          listener.snapshotFullAndReset()
          val (retryWall, retryOk) = retryRun(name, fn)
          listener.awaitQuiescent(maxWaitMs = 10000)
          val parOpt = listener.snapshotFullAndReset()
            .heavyStagePar(listener.HeavyStageSec).get(name)
          if (!retryOk) {
            System.err.println(
              f"[bench] suspect retry $q: run FAILED — keeping par $p0%.2f")
          } else parOpt match {
            case Some(par) => if (par > p) p = par
            case None =>
              if (retryWall < 4.0 * listener.HeavyStageSec) cleared = true
              else System.err.println(
                f"[bench] suspect retry $q: no heavy stage but wall " +
                f"$retryWall%.2f s — keeping par $p%.2f")
          }
        }
      }
      if (attempts > 0)
        System.err.println(f"[bench] suspect retry $q: par $p0%.2f -> " +
          (if (cleared) "cleared (not heavy when idle)" else f"$p%.2f") +
          s" ($attempts attempts)")
      if (cleared) { retryCleared += q; None } else Some(q -> p)
    }
    val suspects = heavyPar.filter(_._2 < 4.0).toSeq.sortBy(_._2)

    // train-INCLUSIVE wall (round-7 verdict item 2): one more
    // concurrent pass with every trained-model memo cleared first, so
    // model training (clusters, codebooks, BPE merges) is INSIDE the
    // measured wall. Published next to the memoized number so the
    // headline cannot silently improve by moving work into memos; a
    // serving deployment reads the memoized wall, a cold-start
    // pipeline this one.
    // median-of-3 (round-14 verdict item 8): a single cold pass swung
    // 11.3-19.7 s across rounds on host noise alone — round-over-round
    // comparison needs a stable estimator. Memos are re-cleared before
    // every pass so each one retrains.
    val trainInclusiveWall = (1 to 3).map { _ =>
      MemoBypass.values.foreach(clear => clear())
      System.gc()
      concurrentPass()._2
    }.sorted.apply(1)

    def r3(v: Double): String = f"$v%.3f"
    def jmap(kv: Seq[(String, Double)]): String =
      kv.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val names = suite.map(_._1)
    def aligned(m: Map[String, Double]): Seq[(String, Double)] =
      names.map(n => n -> m.getOrElse(n, 0.0))
    // the driver's contract keys LEAD, in the contract's order:
    // {"metric": ..., "value": N, "unit": "sec", "queries": {...},
    //  "sf": ...} — and "queries" carries the COMPLETE sequential map
    // (ALL queries, a strict superset of the former slowest-10 view,
    // whose membership varied with host timing and would have read as
    // queries appearing/dropping between rounds).
    val contract =
      s"""{"metric":"total","value":${r3(wall)},"unit":"sec",""" +
      s""""queries":${jmap(sequential)},"sf":"$sfDir","""
    val headline =
      s""""memoized_in_concurrent":[${
        MemoBypass.keys.toSeq.sorted.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""listener_drained":$drained,""" +
      s""""sequential_total":${r3(seqTotal)},"concurrent_wall":${r3(wall)},""" +
      s""""concurrent_wall_best":${r3(walls.min)},""" +
      s""""concurrent_wall_train_inclusive":${r3(trainInclusiveWall)},""" +
      s""""train_inclusive_estimator":"median_of_3",""" +
      s""""concurrent_walls":[${walls.map(r3).mkString(",")}],""" +
      s""""host_load_at_start":${r3(hostLoad)},""" +
      s""""extra_passes":$extraPasses,""" +
      s""""sched_floor_sec":${r3(floor)},"n_queries":${suite.length}"""

    // full record → file (complete per-query maps, all four units)
    val full = contract +
      s""""queries_concurrent":${jmap(concurrent)},""" +
      s""""queries_stage_wall":${jmap(aligned(stageWall))},""" +
      s""""queries_task_time":${jmap(aligned(taskTime))},""" +
      s""""queries_heavy_stage_par":${jmap(heavyPar.toSeq.sortBy(_._1))},""" +
      s""""retry_cleared":[${
        retryCleared.sorted.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""serial_suspects":${jmap(suspects)},""" +
      headline + "}"
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      full.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    // printed line → driver stdout (bare, unprefixed — see build.sbt's
    // outputStrategy note): contract keys first, full concurrent map
    // ("queries_concurrent" = latencies under load, same key name the
    // driver tail always carried), then the headline keys
    println(contract +
      s""""queries_concurrent":${jmap(concurrent)},""" +
      s""""serial_suspects":${jmap(suspects)},""" +
      s""""bench_full":"$outPath",""" +
      headline + "}")
    spark.stop()
  }
}
