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
}
