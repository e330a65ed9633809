package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Generative differential tests for the round-5 operators: random
  * corpora/skews evaluated by the Spark operator AND by a plain-Scala
  * reference — the DifferentialSpec approach extended to ranking and
  * skew machinery (a fixed corpus can miss tie-breaks, empty
  * posting lists, single-salt degenerations). */
class GenerativeOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // -- BM25 over random corpora ---------------------------------------

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta")
  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(3, 25)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 40)
      ws <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield ws.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("bm25 matches the scalar reference on random corpora (30 seeds)") {
    import spark.implicits._
    val params = graft.operators.Search.Bm25Params(
      Seq("alpha", "gamma", "eps"), topN = 10)
    samples(corpusGen, 30).zipWithIndex.foreach { case (docs, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"bm25gen$i").toString
      docs.toDF("doc_id", "text").write.mode("overwrite")
        .parquet(s"$tmp/documents.parquet")
      val got = graft.operators.Search.bm25(spark, tmp, params).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val want = Bm25Reference.score(docs, params)
      assert(got == want, s"seed ${i + 1}: $docs")
    }
  }

  // -- salted window cumsum over random skews -------------------------

  private val skewGen: Gen[Seq[(String, Long, Long)]] = for {
    hotN <- Gen.choose(50, 400)
    coldKeys <- Gen.choose(1, 10)
    coldN <- Gen.choose(0, 30)
    vs <- Gen.listOfN(hotN + coldKeys * coldN, Gen.choose(-5L, 20L))
  } yield {
    val hot = (1 to hotN).map(i => ("hot", i.toLong))
    val cold = for {
      k <- 1 to coldKeys; i <- 1 to coldN
    } yield (s"k$k", i.toLong)
    (hot ++ cold).zip(vs).map { case ((k, o), v) => (k, o, v) }
  }

  test("saltedCumSum equals the plain window on random skews (20 seeds)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    samples(skewGen, 20).zipWithIndex.foreach { case (rows, i) =>
      val df = rows.toDF("k", "o", "v").repartition(4)
      val plain = df.withColumn("cum",
          sum($"v").over(Window.partitionBy($"k").orderBy($"o")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select($"k", $"o", $"cum")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      // a deliberately coarse AND a fine salt must both agree
      for (bucket <- Seq(7L, 64L)) {
        val got = graft.operators.Skew
          .saltedCumSum(df, $"k", $"o", $"v", floor($"o" / bucket.toDouble))
          .select($"k", $"o", $"cum")
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
        assert(got == plain, s"seed ${i + 1} bucket $bucket")
      }
    }
  }
}
