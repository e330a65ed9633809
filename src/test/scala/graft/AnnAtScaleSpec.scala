package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The 100 TB ANN pattern end-to-end: bucket the corpus ONCE at ingest
  * (cell = partition column), then serve probes as partition-pruned
  * scans — each query reads nprobe/k of the corpus from disk, not a
  * filtered full scan. This is the materialized form of q37/q41's
  * in-query bucketing (SCALING.md "Similarity search"). */
class AnnAtScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  test("cell-partitioned corpus serves probes via partition pruning") {
    import graft.functions.expressions.ArrayOps
    val tmp = java.nio.file.Files.createTempDirectory("annscale").toString
    val planes = {
      val rnd = new scala.util.Random(42)
      Seq.fill(4)(Seq.fill(64)(rnd.nextDouble() * 2 - 1))
    }
    val corpus = graft.sources.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("ve"))
      .withColumn("cell", ArrayOps.hyperplaneBucket(col("ve"), planes))
    // ingest-time bucketing: one shuffle-free write, cell as partition
    corpus.write.partitionBy("cell").mode("overwrite").parquet(tmp)

    val served = spark.read.parquet(tmp)
    val probe = served.where(col("cell").isin(3L, 5L))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"probe not partition-pruned:\n$plan")
    // pruning is real: the probe's scan reads a strict subset of files
    // (inputFiles ignores pruning; the scan metric does not)
    val expected = corpus.where(col("cell").isin(3L, 5L)).count()
    assert(probe.count() == expected)
    probe.collect()
    val scan = probe.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    val probedFiles = scan.metrics("numFiles").value
    val allFiles = served.inputFiles.length
    assert(probedFiles > 0 && probedFiles < allFiles,
      s"probed $probedFiles of $allFiles files")
  }

  test("clustered corpora bend IVF recall above the scan fraction") {
    // round-16 verdict item 3 as a PINNED quality gate, not just a
    // probe: on a mixture-of-Gaussians corpus (the realistic regime —
    // real embedding corpora cluster, which is why IVF exists), the
    // recall at a half-scan operating point must clearly exceed the
    // scanned fraction. On near-uniform vectors recall ≈ scan
    // fraction, so this asserts the property the ScaleLab sweeps
    // measure (np=2/16 cells → recall 0.58-0.70 vs 0.34 uniform).
    val tmp = java.nio.file.Files.createTempDirectory("annclustered").toString
    graft.tools.ScaleLab.genClusteredEmbeddings(spark, tmp,
      nVecs = 2000, nClusters = 16, spread = 0.06)
    val p = graft.operators.Similarity.AnnParams(ivfK = 8, ivfProbe = 4)
    val rec = graft.operators.Similarity.annRecall(spark, tmp, p)
      .agg(avg(col("recall"))).collect()(0).getDouble(0)
    assert(rec >= 0.75,
      f"mean IVF recall on the clustered corpus at half scan: $rec%.3f " +
        "— expected well above the 0.5 scan fraction")
  }
}
