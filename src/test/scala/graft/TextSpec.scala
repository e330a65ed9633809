package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Text

class TextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokens and shingles") {
    val df = Seq("a b c d", "x y", "z").toDF("text")
      .select(Text.tokens(col("text")).as("t"))
      .select(col("t"), Text.shingles(col("t"), 3).as("sh"))
    val rows = df.collect()
    assert(rows(0).getSeq[String](0) == Seq("a", "b", "c", "d"))
    assert(rows(0).getSeq[String](1) == Seq("a b c", "b c d"))
    assert(rows(1).getSeq[String](1) == Seq()) // shorter than k
    assert(rows(2).getSeq[String](1) == Seq())
  }

  test("minhash is deterministic and identical for identical shingle sets") {
    val df = Seq("the quick brown fox", "the quick brown fox", "totally different words here")
      .toDF("text")
      .select(Text.minhash(
        array_distinct(Text.shingles(Text.tokens(col("text")), 2)), 16).as("mh"))
    val rows = df.collect().map(_.getSeq[Long](0))
    assert(rows(0) == rows(1))
    assert(rows(0) != rows(2))
    assert(rows(0).length == 16)
  }

  test("minhash signature agreement tracks jaccard (2-independence regression)") {
    // Two 20-token docs sharing 18 of their 19 bigram shingles
    // (J = 18/20 = 0.9): E[agreeing positions] = 32 * J ≈ 29. The
    // pre-fix linear family g_j = h1 + j*h2 scored 0/32 on exactly
    // this shape (one Pareto-dominant unshared shingle owned every
    // minimum), which is why its LSH recall collapsed mid-range; the
    // multiply-mod family must stay near the expectation. Bound set
    // at 22 — ~4 sigma below E, far above the failure mode.
    val base = "red orange yellow green blue indigo violet ultra infra " +
      "sonic gold silver bronze copper iron tin lead zinc nickel"
    val sigs = Seq(s"$base mercury", s"$base cobalt").toDF("text")
      .select(graft.functions.expressions.ArrayOps.minhashSig(
        array_distinct(Text.shingles(Text.tokens(col("text")), 2)), 32)
        .as("mh"))
      .collect().map(_.getSeq[Long](0))
    val agree = (0 until 32).count(i => sigs(0)(i) == sigs(1)(i))
    assert(agree >= 22, s"only $agree/32 positions agree at J=0.9")
    // and the HOF documentation form is the SAME family
    val hof = Seq(s"$base mercury").toDF("text")
      .select(Text.minhash(
        array_distinct(Text.shingles(Text.tokens(col("text")), 2)), 32)
        .as("mh"))
      .collect().head.getSeq[Long](0)
    assert(hof == sigs(0),
      "Text.minhash (HOF) drifted from the native ArrayOps.minhashSig family")
  }

  test("simhash: identical texts agree, near-identical texts are close") {
    val df = Seq(
      ("a", "spark query engine for big data processing at scale"),
      ("b", "spark query engine for big data processing at scale"),
      ("c", "spark query engine for huge data processing at scale"),
      ("d", "completely unrelated sentence about cooking pasta tonight"))
      .toDF("id", "text")
      .select(col("id"), Text.simhash64(Text.tokens(col("text"))).as("sh"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("a") == m("b"))
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(m("a"), m("c")) < ham(m("a"), m("d")))
  }

  test("stopword count and lang guess") {
    val df = Seq("the cat and the dog", "le chat et la mer", "qqq www eee")
      .toDF("text")
      .select(
        Text.stopwordCount(Text.tokens(col("text"))).as("sc"),
        Text.langGuess(Text.tokens(col("text"))).as("lang"))
    val rows = df.collect()
    assert(rows(0).getInt(0) == 3) // the, and, the
    assert(rows(0).getString(1) == "en")
    assert(rows(1).getString(1) == "fr")
    assert(rows(2).getString(1) == "unknown")
  }

  test("rolling fingerprint: shared windows survive for near-dup docs") {
    val df = Seq(
      "one two three four five six seven eight",
      "zero one two three four five six seven eight") // shifted by one
      .toDF("text")
      .select(Text.rollingFingerprint(Text.tokens(col("text")), 4, 3).as("fp"))
    val rows = df.collect().map(_.getSeq[Long](0).toSet)
    assert(rows(0).intersect(rows(1)).nonEmpty) // winnowing keeps overlap
  }
}

class RegexTokensSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("BPE-ish regex tokenizer splits letter runs, digits, symbols") {
    val rows = Seq("hello world42, x!").toDF("text")
      .select(graft.functions.Text.regexTokens(col("text")).as("t"))
      .collect()
    assert(rows.head.getSeq[String](0) ==
      Seq("hello", "world", "42", ",", "x", "!"))
  }
}

class MultimodalTypedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.operators.Multimodal

  test("mapPartitions featurize path: typed in/out, deterministic, no shuffle") {
    import spark.implicits._
    val assets = Seq(
      Multimodal.Asset(1L, "s1", "hello".getBytes("UTF-8")),
      Multimodal.Asset(2L, "s2", "world!".getBytes("UTF-8")))
      .toDS().repartition(2)
    val out = Multimodal.featurizePartitioned(assets)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"featurize must not shuffle:\n$plan")
    val rows = out.collect().sortBy(_.doc_id)
    assert(rows.length == 2)
    assert(rows(0).byte_len == 5 && rows(1).byte_len == 6)
    assert(rows(0).features.length == 8)
    val again = Multimodal.featurizePartitioned(assets).collect()
      .sortBy(_.doc_id)
    assert(rows(0).features.sameElements(again(0).features))
  }

  test("PII redaction actually fires on every doc (planted PII; never vacuous)") {
    val rows = graft.operators.TextAnalysis
      .queries("q58_pii_redact")(TestSpark.spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("n_emails") == 1, s"email not planted/found: $r")
      assert(r.getAs[Int]("n_phones") == 1, s"phone not planted/found: $r")
      // [EMAIL]/[PHONE] are shorter than what they replace
      assert(r.getAs[Int]("chars_removed") > 0)
    }
  }

  test("normalization collapses the planted mess on every doc") {
    val rows = graft.operators.TextAnalysis
      .queries("q60_normalize")(TestSpark.spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Int]("chars_collapsed") > 0))
  }

  test("repetition ranking is deterministic and bounded") {
    val rows = graft.operators.TextAnalysis
      .queries("q59_repetition")(TestSpark.spark, TestSpark.sfDir).collect()
    assert(rows.length == 20)
    val ratios = rows.map(_.getAs[Double]("dup_ratio"))
    assert(ratios.zip(ratios.tail).forall { case (a, b) => a >= b })
    assert(ratios.forall(r => r >= 0.0 && r < 1.0))
  }

  test("quality deciles: 10 near-equal buckets per language, monotone boundaries") {
    val rows = graft.operators.TextAnalysis
      .queries("q71_quality_deciles")(TestSpark.spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1),
        r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val byLang = rows.groupBy(_._1)
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, ds) =>
      assert(ds.map(_._2).sorted.toSeq == (1 to 10), s"$lang deciles: ${ds.map(_._2).sorted.toSeq}")
      // ntile: bucket sizes differ by at most one
      val sizes = ds.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$lang sizes: ${sizes.toSeq}")
      // decile boundaries are monotone: decile d's max <= decile d+1's min
      val ordered = ds.sortBy(_._2)
      ordered.zip(ordered.tail).foreach { case (lo, hi) =>
        assert(lo._5 <= hi._4 + 1e-12,
          s"$lang decile ${lo._2} max ${lo._5} > decile ${hi._2} min ${hi._4}")
      }
      ds.foreach(d => assert(d._4 >= 0.0 && d._5 <= 1.0))
    }
  }

  test("spread ntile == window ntile, including languages smaller than the bucket count") {
    // The round-16 scale path for q71 (range-bucket + offset rank +
    // the piecewise ntile formula) must be byte-identical to the
    // window ntile it replaces — including the total<n regime where
    // floor((rank-1)*n/total)+1 is NOT ntile (it skips bucket ids;
    // SQL gives 3 rows deciles 1,2,3). Planted: a 3-doc language, a
    // 25-doc language (10*2+5: first five deciles one larger), a
    // 1000-doc language with heavy ratio ties, and null-ratio-free
    // corpus like the fixture. threshold=0 forces the spread path.
    val s = TestSpark.spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(42)
    val rows =
      (1 to 3).map(i => ("tiny", i.toLong, 10 + i, rnd.nextDouble())) ++
      (1 to 25).map(i => ("small", 100L + i, 20 + i, rnd.nextDouble())) ++
      (1 to 1000).map(i => ("big", 10000L + i, 5 + i % 7,
        (i % 13).toDouble / 13.0)) // 13 distinct values → massive ties
    val base = rows.toDF("lang", "doc_id", "n_tokens", "ratio")
    val w = Window.partitionBy(col("lang")).orderBy(col("ratio"), col("doc_id"))
    val expected = base.withColumn("decile", ntile(10).over(w))
      .select("lang", "doc_id", "decile").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    s.conf.set("spark.graft.spread.threshold", "0")
    try {
      val got = graft.operators.TextAnalysis.perKeyNtile(base, 10)
        .select("lang", "doc_id", "decile").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
      assert(got.size == expected.size)
      val diffs = expected.collect {
        case (k, v) if got.get(k) != Some(v) => (k, v, got.get(k))
      }
      assert(diffs.isEmpty, s"spread ntile diverges: ${diffs.take(5)}")
    } finally s.conf.unset("spark.graft.spread.threshold")
  }

  test("q73 gopher rules: flags consistent, recomputed in scalar Scala") {
    val rows = graft.operators.TextAnalysis
      .queries("q73_gopher_rules")(TestSpark.spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    val texts = graft.sources.Tables
      .load(TestSpark.spark, TestSpark.sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val stop = Set("the", "a", "of", "and", "to", "in")
    var kept = 0
    rows.foreach { r =>
      val (id, n, rLen, rWl, rStop, rDup, nFailed, keep) =
        (r.getLong(0), r.getInt(1), r.getBoolean(2), r.getBoolean(3),
         r.getBoolean(4), r.getBoolean(5), r.getInt(6), r.getBoolean(7))
      // internal consistency
      assert(nFailed == Seq(rLen, rWl, rStop, rDup).count(!_))
      assert(keep == (nFailed == 0))
      if (keep) kept += 1
      // scalar recomputation
      val toks = texts(id).split(" ", -1)
      assert(n == toks.length)
      assert(rLen == (n >= 25 && n <= 90))
      val meanWl = toks.map(_.length).sum.toDouble / n
      assert(rWl == (meanWl >= 4.0 && meanWl <= 5.0))
      assert(rStop == (toks.count(stop) >= 2))
      val dup = 1.0 - toks.distinct.length.toDouble / n
      assert(rDup == (dup <= 0.65))
    }
    // the composite filter neither keeps nor drops everything
    assert(kept > 0 && kept < rows.length, s"kept $kept of ${rows.length}")
  }

  test("q77 tokenizer fertility: planted mixed-script text makes bpe > ws per language") {
    val rows = graft.operators.TextAnalysis
      .queries("q77_tokenizer_fertility")(TestSpark.spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, n, ws, bpe, fert) =>
      // the planted suffix " v<id>.r-<k>" adds 2 ws tokens but >= 6
      // regex tokens, so fertility strictly exceeds 1 everywhere
      assert(bpe > ws, s"$lang: bpe $bpe <= ws $ws")
      assert(fert == bpe.toDouble / ws)
      assert(n > 0)
    }
  }
}
