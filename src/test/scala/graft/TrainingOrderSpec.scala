package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Similarity}
import graft.operators.Similarity.AnnParams

/** q90/q90b global training order, q91 Bloom-prefiltered decontam,
  * q92 ANN recall — the round-8 additions.
  *
  * The q90 contract under test: bucketed enumeration (per-bucket
  * counts → broadcast offsets → bucket-local rank) produces EXACTLY
  * the positions a global ORDER BY would, without ever range-
  * partitioning the corpus into one task. */
class TrainingOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  private def order(banded: Boolean, seed: String) =
    Curation.globalOrder(spark, dir, banded, seed)

  test("q90 curriculum order is the exact global sort's enumeration") {
    val got = order(banded = true, seed = "").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = got.length
    assert(n > 0)
    // a permutation: positions are exactly 1..n
    assert(got.map(_._3).sorted.toSeq == (1L to n).toSeq)
    // equals the brute-force global sort (the oracle semantics, in-JVM)
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        least(expr("size(split(text, ' ')) div 100"), lit(9))
          .cast("long").as("band"),
        md5(col("text").cast("binary")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val expected = docs.sortBy(t => (t._2, t._3, t._1)).zipWithIndex
      .map { case ((id, band, _), i) => (id, band, i + 1L) }.toSet
    assert(got.toSet == expected)
  }

  test("q90 plan never range-partitions the corpus globally") {
    val plan = order(banded = true, seed = "")
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("rangepartitioning"),
      "global order must come from bucket offsets, not a global sort")
  }

  test("q90b epoch shuffle: deterministic per seed, distinct across seeds") {
    val e1 = order(banded = false, seed = "epoch-1").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    val e1again = order(banded = false, seed = "epoch-1").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    val e2 = order(banded = false, seed = "epoch-2").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(e1 == e1again)                      // replayable epoch
    assert(e1.keySet == e2.keySet)             // same corpus
    assert(e1 != e2)                           // genuinely re-shuffled
    assert(e1.values.toSeq.sorted == e2.values.toSeq.sorted)
  }

  test("q91 bloom decontam == q55 exact decontam, with the prefilter planted") {
    val exact = Curation.queries("q55_decontam")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val df = Curation.bloomDecontam(spark, dir)
    val bloom = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bloom == exact)
    assert(exact.nonEmpty)
    // the Bloom membership test is really in the plan, below the join
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom prefilter in:\n$plan")
  }

  test("q92 recall: probing every cell recovers brute force exactly") {
    val p = AnnParams.Default
    val full = Similarity.annRecall(spark, dir, p.copy(ivfProbe = p.ivfK))
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(full.nonEmpty)
    assert(full.values.forall(_ == 1.0),
      s"probe=k must equal ground truth, got $full")
  }

  test("q94 SQ8: ADC distance within the quantization error bound of exact L2") {
    // per-dim decode error <= span_i/255, so |adc - exact| over the
    // expansion is bounded by sum_i (2|q_i| + 2|x_i| + span_i) * span_i/255
    // — loose but cheap; here we just pin a corpus-level sanity: every
    // ADC distance is within 10% + 0.5 of the exact distance computed
    // from raw doubles on the same pairs.
    val adc = Similarity.sqAdcTopK(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(adc.nonEmpty)
    val exact = {
      val n = graft.sources.Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("ve"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
      adc.keys.map { case k @ (q, d) =>
        k -> exactL2(n(q), n(d))
      }.toMap
    }
    adc.foreach { case (k, a) =>
      assert(math.abs(a - exact(k)) <= 0.1 * exact(k) + 0.5,
        s"pair $k: adc=$a exact=${exact(k)}")
    }
  }

  private def exactL2(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("q95 binary codes: hamming bounded by the dimension") {
    val rows = Similarity.binaryKnn(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getLong(2)
      assert(h >= 0 && h <= 64, s"hamming $h out of [0, 64]")
    }
  }

  test("q92 recall knob: narrower probe can only lose recall") {
    def avgRecall(probe: Int): Double = {
      val rows = Similarity.annRecall(spark, dir,
        AnnParams.Default.copy(ivfProbe = probe))
        .collect().map(_.getDouble(3))
      rows.sum / rows.length
    }
    val wide = avgRecall(AnnParams.Default.ivfProbe) // 4
    val narrow = avgRecall(1)
    assert(narrow <= wide + 1e-9, s"narrow=$narrow wide=$wide")
    assert(wide > 0.0)
    Similarity.annRecall(spark, dir, AnnParams.Default).collect()
      .foreach(r => assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
  }
}
