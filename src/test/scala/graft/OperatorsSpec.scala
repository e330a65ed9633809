package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, Relational, Similarity, TextAnalysis}

/** Sanity assertions per operator family on sf0.001. Exact value parity
  * vs DuckDB is the driver's t2 gate (tools/oracle_check.py locally);
  * these specs pin structural invariants that the hash compare can't
  * explain when it fails. */
class OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  test("q1 pricing summary: 6 flag/status groups, positive measures") {
    val rows = Relational.queries("q1_pricing_summary")(spark, dir).collect()
    assert(rows.length == 6)
    assert(rows.forall(r => r.getDouble(r.fieldIndex("sum_qty")) > 0))
    assert(rows.forall(r => r.getLong(r.fieldIndex("count_order")) > 0))
  }

  test("q7 multiway join: 25 nations, revenue positive, dims broadcast") {
    val df = Relational.queries("q7_join_multiway")(spark, dir)
    assert(df.collect().length == 25)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dims must broadcast")
  }

  test("q16 topk uses TakeOrderedAndProject (no global sort)") {
    val df = Relational.queries("q16_topk")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    val prices = df.collect().map(_.getDouble(1))
    assert(prices.sameElements(prices.sortBy(-(_: Double))))
  }

  test("semi/anti join partition: every customer is in exactly one side") {
    val semi = Relational.queries("q8_semijoin_in")(spark, dir).count()
    val nCust = spark.read.parquet(s"$dir/customer.parquet").count()
    val antiF = Relational.queries("q9_antijoin_exists")(spark, dir).count()
    assert(semi <= nCust && antiF <= nCust)
  }

  test("sessionize: session counts bounded by event counts") {
    val rows = Relational.queries("q26_sessionize")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_sessions")) <= r.getLong(r.fieldIndex("n_events")))
    }
  }

  test("dedup exact: unique + dupes == total") {
    val r = Dedup.queries("q31_dedup_exact")(spark, dir).collect().head
    assert(r.getLong(0) == r.getLong(1) + r.getLong(2))
  }

  test("minhash LSH finds planted near-duplicates") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "s", 10L),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda", "en", "s", 10L), // near-dup of 1
      (3L, "one two three four five six seven eight nine ten", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_dedup").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = Dedup.queries("q33_minhash_pairs")(spark, tmp).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      s"expected (1,2) in ${pairs.mkString(",")}")
    assert(!pairs.exists(r => r.getLong(1) == 3L || r.getLong(0) == 3L))
  }

  test("incremental near-dedup: batch probes the corpus, never itself") {
    import spark.implicits._
    // batch = doc_id % 10 == 7: 7 is an exact twin of corpus doc 1,
    // 17 a near-dup of corpus doc 2, 27 unique, 37 a near-dup of 27
    // (batch-INTERNAL — stays out of the corpus-probe PAIRS view, but
    // the keep gate rejects it, keeping cluster-min 27), 47 an exact
    // batch-internal twin of 27 (keep-first rejects it too)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "s", 10L),
      (2L, "red orange yellow green blue indigo violet ultra infra sonic gold silver bronze copper iron tin lead zinc nickel mercury", "en", "s", 10L),
      (3L, "one two three four five six seven eight nine ten", "en", "s", 10L),
      (7L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "s", 10L),
      (17L, "red orange yellow green blue indigo violet ultra infra sonic gold silver bronze copper iron tin lead zinc nickel cobalt", "en", "s", 10L),
      (27L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do", "en", "s", 10L),
      (37L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed dont", "en", "s", 10L),
      (47L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_incdedup").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = Dedup.queries("q87_incremental_neardup")(spark, tmp).collect()
    assert(pairs.exists(r => r.getLong(0) == 7L && r.getLong(1) == 1L),
      s"exact twin (7,1) not flagged in ${pairs.mkString(",")}")
    assert(pairs.exists(r => r.getLong(0) == 17L && r.getLong(1) == 2L),
      s"near-dup (17,2) not flagged in ${pairs.mkString(",")}")
    assert(!pairs.exists(r => r.getLong(0) == 37L || r.getLong(1) == 37L),
      s"batch-internal pair leaked into corpus-probe ${pairs.mkString(",")}")
    val kept = Dedup.queries("q87b_incremental_keep")(spark, tmp)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(27L), s"kept=$kept (expected only cluster-min 27)")
  }

  test("variable-length span dedup removes a planted 50-token run byte-exactly, keeps short overlaps") {
    import spark.implicits._
    // R: a 50-token run shared by docs 1 and 2 (different contexts);
    // P: a 10-token phrase shared by docs 1 and 3. q83 removes both;
    // q83b (minRun=20) removes ONLY the run — and removes it as a
    // unit, byte-exactly, leaving each doc's unique context intact.
    val run = (1 to 50).map(i => s"r$i").mkString(" ")
    val phrase = (1 to 10).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 a4 a5 $run b1 b2 b3 b4 b5 $phrase c1 c2", "en", "s", 10L),
      (2L, s"d1 d2 d3 d4 d5 $run e1 e2 e3 e4 e5", "en", "s", 10L),
      (3L, s"f1 f2 f3 f4 f5 $phrase g1 g2 g3 g4 g5", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_runs").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Dedup.queries("q83b_span_dedup_runs")(spark, tmp)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getString(3))).toMap
    assert(got(1L)._2 ==
      s"a1 a2 a3 a4 a5 b1 b2 b3 b4 b5 $phrase c1 c2", s"doc1=${got(1L)}")
    assert(got(1L)._1 == 22L)
    assert(got(2L)._2 == "d1 d2 d3 d4 d5 e1 e2 e3 e4 e5")
    assert(got(3L)._2 == s"f1 f2 f3 f4 f5 $phrase g1 g2 g3 g4 g5",
      "short overlap must survive the run threshold")
    // contrast: q83's any-shared-gram removal strips the phrase too
    val aggressive = Dedup.queries("q83_span_dedup_apply")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(aggressive(3L) == "f1 f2 f3 f4 f5 g1 g2 g3 g4 g5")
  }

  test("ngram jaccard is 1.0 for identical docs within the band") {
    val rows = Dedup.queries("q35_ngram_jaccard")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(r.fieldIndex("jaccard")) >= 0.0 &&
                             r.getDouble(r.fieldIndex("jaccard")) <= 1.0))
  }

  test("knn brute: 10 queries x top5, cosine within [-1,1], sorted desc per query") {
    val rows = Similarity.queries("q36_knn_brute")(spark, dir).collect()
    assert(rows.length == 50)
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 10)
    byQ.values.foreach { rs =>
      val cos = rs.map(_.getDouble(2))
      assert(cos.forall(c => c >= -1.0001 && c <= 1.0001))
    }
  }

  test("knn lsh returns a subset of the corpus scored within buckets") {
    val lsh = Similarity.queries("q37_knn_lsh")(spark, dir).collect()
    assert(lsh.nonEmpty)
    assert(lsh.forall(r => r.getDouble(2) >= -1.0001 && r.getDouble(2) <= 1.0001))
    // ANN must never return MORE than brute-force top-k per query
    val perQuery = lsh.groupBy(_.getLong(0)).values.map(_.length)
    assert(perQuery.forall(_ <= 5))
  }

  test("multimodal features: deterministic, fixed dim, bounded") {
    val a = Multimodal.queries("q39_multimodal_features")(spark, dir).collect()
    val b = Multimodal.queries("q39_multimodal_features")(spark, dir).collect()
    assert(a.length == b.length)
    val featCols = (0 until 8).map(i => s"f$i")
    val fa = featCols.map(c => a.head.getDouble(a.head.fieldIndex(c)))
    val fb = featCols.map(c => b.head.getDouble(b.head.fieldIndex(c)))
    assert(fa == fb && fa.length == 8)
    assert(fa.forall(f => f >= 0d && f < 1d))
  }

  test("langid confusion matrix covers all labeled languages") {
    val rows = TextAnalysis.queries("q29_langid")(spark, dir).collect()
    val langs = rows.map(_.getString(0)).toSet
    assert(langs == Set("en", "fr", "es", "zh", "de"))
  }

  test("dedup clusters: components agree with pairs, min-id representative") {
    val pairs = Dedup.queries("q33_minhash_pairs")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Dedup.queries("q61_dedup_clusters")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(clusters.nonEmpty)
    // every paired doc is labeled, and both ends share a cluster
    pairs.foreach { case (a, b) =>
      assert(clusters(a)._1 == clusters(b)._1, s"pair ($a,$b) split across clusters")
    }
    // cluster id == min member id; exactly that member is the representative
    clusters.groupBy(_._2._1).foreach { case (cid, members) =>
      assert(members.keys.min == cid, s"cluster $cid: min is ${members.keys.min}")
      members.foreach { case (doc, (_, rep)) => assert(rep == (doc == cid)) }
    }
    // transitivity probe on a synthetic chain a-b, b-c
    import spark.implicits._
    val chain = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "s", 10L),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda", "en", "s", 10L),
      (3L, "alpha beta gamma delta epsilon zeta eta theta mu lambda", "en", "s", 10L),
      (4L, "one two three four five six seven eight nine ten", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_cc").toString
    chain.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val cc = Dedup.queries("q61_dedup_clusters")(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1-2 and 2-3 pair up; 1-3 may not — transitive closure must still
    // put all three in cluster 1, and 4 in none
    assert(cc.get(1L).contains(1L) && cc.get(2L).contains(1L) &&
      cc.get(3L).contains(1L), s"chain not closed: $cc")
    assert(!cc.contains(4L))
  }

  test("dedup apply: kept corpus = all docs minus non-representatives") {
    val clusters = Dedup.queries("q61_dedup_clusters")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val nonRep = clusters.count(!_._2)
    val total = graft.sources.Tables.load(spark, dir, "documents").count()
    val kept = Dedup.queries("q61b_dedup_apply")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.values.sum == total - nonRep,
      s"kept ${kept.values.sum} != $total - $nonRep")
    assert(nonRep > 0, "no duplicates found — apply test is vacuous")

    // q61e keep-best: same kept COUNT as the min-id policy (one
    // survivor per cluster either way), and each cluster's survivor
    // is its longest member (tie min id) — checked against the
    // cluster table directly
    import org.apache.spark.sql.functions._
    val keptBest = Dedup.queries("q61e_dedup_keep_best")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keptBest.values.sum == kept.values.sum,
      "keep-best must keep exactly one doc per cluster, like min-id")
    val tk = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byCluster = Dedup.queries("q61_dedup_clusters")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2).values
    // expected survivors under keep-longest
    val expectedSurvivors = byCluster.map(ms =>
      ms.map(_._1).maxBy(id => (tk(id), -id))).toSet
    val keptTokens = Dedup.queries("q61e_dedup_keep_best")(spark, dir)
      .collect().map(r => r.getLong(2)).sum
    val allDocTokens = tk.values.sum
    val droppedTokens = byCluster.flatMap(ms => ms.map(_._1))
      .filterNot(expectedSurvivors).map(tk).sum
    assert(keptTokens == allDocTokens - droppedTokens,
      "keep-best kept-token total diverges from the per-cluster argmax")
  }
}

class SimhashPairsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("simhash band join finds planted near-identical docs") {
    import spark.implicits._
    // hamming<=3 (the standard 4x16-band setting) catches content whose
    // simhash barely moved — an exact copy has distance 0; a one-token
    // edit in a short doc can flip ~6 vote-margin bits, so it is the
    // negative here along with the unrelated doc
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base, "en", "s", 10L),
      (2L, base, "en", "s", 10L), // exact duplicate: hamming 0
      (3L, (100 to 140).map(i => s"q$i").mkString(" "), "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_sh").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = graft.operators.Dedup.queries("q34b_simhash_pairs")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"expected (1,2) in $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("span coverage matches an independent recomputation; planted duplicate is fully covered") {
    import spark.implicits._
    // planted: docs 1/2 share an identical 12-token run embedded in
    // different surroundings; doc 3 shares nothing
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 $shared z1 z2", "en", "s", 0L),
      (2L, s"b1 $shared y1 y2 y3 y4", "en", "s", 0L),
      (3L, (1 to 20).map(i => s"u$i").mkString(" "), "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_span").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.operators.Dedup.queries("q70_span_coverage")(spark, tmp)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // exactly the 12 shared positions are covered in each of docs 1/2
    // (17 tokens each: 3+12+2 and 1+12+4)
    assert(got(1L) == (17L, 12L), s"doc1: ${got(1L)}")
    assert(got(2L) == (17L, 12L), s"doc2: ${got(2L)}")
    assert(got(3L) == (20L, 0L), s"doc3: ${got(3L)}")
    // independent recomputation on the real corpus
    val corpus = graft.sources.Tables.load(spark, TestSpark.sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val spans = corpus.flatMap { case (id, toks) =>
      (0 to toks.length - 5).map(i => (id, i, toks.slice(i, i + 5).mkString(" ")))
    }
    val rep = spans.groupBy(_._3).filter(_._2.map(_._1).distinct.length >= 2).keySet
    val want = corpus.map { case (id, toks) =>
      val covered = spans.filter(s => s._1 == id && rep(s._3))
        .flatMap(s => s._2 until s._2 + 5).distinct.length
      id -> (toks.length.toLong, covered.toLong)
    }.toMap
    val real = graft.operators.Dedup.queries("q70_span_coverage")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(real == want)
    // the operator has teeth on the real corpus too
    assert(want.values.map(_._2).sum > 0, "no repeated spans at this SF")
  }

  test("q81 containment: values match scalar recomputation; full containment found") {
    val rows = graft.operators.Dedup.queries("q81_containment")(
      spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val shingles = graft.sources.Tables
      .load(spark, TestSpark.sfDir, "documents")
      .select("doc_id", "text").collect()
      .map { r =>
        val t = r.getString(1).split(" ", -1)
        r.getLong(0) -> t.sliding(2).map(_.mkString(" ")).toSet
      }.toMap
    rows.foreach { case (d1, d2, c1, c2) =>
      val (s1, s2) = (shingles(d1), shingles(d2))
      val inter = (s1 & s2).size
      def r4(x: Double) =
        BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(c1 == r4(inter.toDouble / s1.size), s"($d1,$d2) cont1")
      assert(c2 == r4(inter.toDouble / s2.size), s"($d1,$d2) cont2")
      assert(math.max(c1, c2) >= 0.5)
    }
    // the asymmetric measure has teeth: at least one FULL containment
    // (a doc's entire shingle set inside another's) at this SF
    assert(rows.exists { case (_, _, c1, c2) => c1 == 1.0 || c2 == 1.0 },
      "no full-containment pair found")
  }

  test("q79 funnel: stage counts are monotone and every stage reached") {
    val r = graft.operators.Relational.queries("q79_funnel")(
      spark, TestSpark.sfDir).collect()(0)
    val (users, view, vc, full) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(users >= view && view >= vc && vc >= full,
      s"funnel not monotone: $users >= $view >= $vc >= $full")
    assert(full > 0, "no user completed the funnel at this SF")
  }

  test("q80 retention: offset-0 equals cohort size, later offsets never exceed it") {
    val rows = graft.operators.Relational.queries("q80_retention")(
      spark, TestSpark.sfDir).collect()
      .map(r => (r.getDate(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (cohort, ds) =>
      val d0 = ds.find(_._2 == 0)
      assert(d0.isDefined, s"cohort $cohort missing offset 0")
      ds.foreach { case (_, off, n) =>
        assert(n <= d0.get._3, s"cohort $cohort offset $off retains $n > day0 ${d0.get._3}")
      }
    }
  }
}
