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

  // -- round-7 native rewrites vs independent references --------------

  /** Tiny vocab forces within- and cross-array repeats, the regimes
    * where sorted-merge vs hash-set and first-occurrence bookkeeping
    * can diverge. */
  private val tinyDocGen: Gen[Seq[String]] = for {
    len <- Gen.choose(0, 60)
    ws <- Gen.listOfN(len, Gen.oneOf(Vector("a", "b", "c", "ab", "x")))
  } yield ws

  test("sorted-hash merge equals distinct string intersection on random arrays") {
    val s = spark
    import s.implicits._
    val pairs = samples(Gen.zip(tinyDocGen, tinyDocGen), 60)
    val df = pairs.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a.distinct, b.distinct) }
      .toDF("id", "a", "b")
      .select($"id",
        graft.functions.expressions.ArrayOps.sortedIntersectCount(
          graft.functions.expressions.ArrayOps.sortedHashes($"a"),
          graft.functions.expressions.ArrayOps.sortedHashes($"b")).as("got"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    pairs.zipWithIndex.foreach { case ((a, b), i) =>
      val want = a.distinct.toSet.intersect(b.distinct.toSet).size
      assert(df(i.toLong) == want, s"pair $i: $a vs $b")
    }
  }

  test("native intra-doc dedup equals a brute-force span reference on random docs") {
    val s = spark
    import s.implicits._
    val w = 5
    val docs = samples(tinyDocGen, 60)
    // independent reference: repeated (by token SEQUENCE) w-gram
    // occurrences cover their window; first occurrences stay. The
    // native path keys on the md5 span hash — agreement also checks
    // that the hash family is collision-free on these inputs.
    def ref(toks: Seq[String]): (Long, String) = {
      val n = toks.length
      val covered = Array.fill(n)(false)
      if (n >= w) {
        val seen = scala.collection.mutable.HashSet[Seq[String]]()
        for (i <- 0 to n - w) {
          val g = toks.slice(i, i + w)
          if (!seen.add(g)) (i until i + w).foreach(covered(_) = true)
        }
      }
      val kept = toks.indices.filterNot(covered).map(toks)
      (kept.size.toLong, kept.mkString(" "))
    }
    val got = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
      .toDF("doc_id", "toks")
      .select($"doc_id", graft.functions.expressions.ArrayOps
        .intraDocDedup($"toks", w).as("r"))
      .select($"doc_id", $"r.kept_tokens", $"r.kept_text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    docs.zipWithIndex.foreach { case (d, i) =>
      assert(got(i.toLong) == ref(d), s"doc $i: ${d.mkString(" ")}")
    }
  }
}
