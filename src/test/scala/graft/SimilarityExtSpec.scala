package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.engine.{QueryEngine, RangerDdl}

class SimilarityExtSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  test("IVF knn: valid shape and decent recall vs brute force") {
    val brute = Similarity.queries("q36_knn_brute")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.queries("q41_knn_ivf")(spark, dir).collect()
    assert(ivf.nonEmpty)
    val ivfPairs = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val perQ = ivf.groupBy(_.getLong(0)).values.map(_.length)
    assert(perQ.forall(_ <= 5))
    // nprobe=4 of k=16 cells should recover a solid share of true top-5
    val recall = ivfPairs.intersect(brute).size.toDouble / brute.size
    info(f"IVF recall@5: $recall%.2f")
    assert(recall >= 0.3, s"recall too low: $recall")
  }

  test("multi-probe LSH recall vs brute force") {
    val brute = Similarity.queries("q36_knn_brute")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.queries("q37_knn_lsh")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = lsh.intersect(brute).size.toDouble / brute.size
    info(f"multi-probe LSH recall@5: $recall%.2f")
    assert(recall >= 0.2, s"recall too low: $recall")
  }

  test("embedding near-dup pairs are high-cosine, well-formed, and non-empty") {
    val rows = Similarity.queries("q42_embed_neardup")(spark, dir).collect()
    // round 1 returned 0 rows at threshold 0.8 (the synthetic corpus
    // has no planted dups; max same-bucket cosine is ~0.46) — a check
    // over an empty result verifies nothing, so the threshold now sits
    // at the top percentile and this spec requires rows.
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= Similarity.NearDupCosine)
    }
  }

  test("parameterized ANN/LSH: two operating points, values consistent with brute force") {
    import graft.operators.Similarity.AnnParams
    // exact cosine for every pair — the value oracle any approximate
    // variant must agree with on the pairs it returns
    val brute = Similarity.queries("q36_knn_brute")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for (p <- Seq(AnnParams.Default, AnnParams(numPlanes = 6))) {
      val lsh = Similarity.knnLsh(spark, dir, p).collect()
      assert(lsh.nonEmpty)
      assert(lsh.groupBy(_.getLong(0)).values.forall(_.length <= 5))
      // approximation changes WHICH pairs surface, never their cosine
      lsh.foreach { r =>
        val key = (r.getLong(0), r.getLong(1))
        assert(brute.get(key).forall(c => math.abs(c - r.getDouble(2)) < 1e-9),
          s"cosine mismatch vs brute force at $key (planes=${p.numPlanes})")
      }
    }
    for (p <- Seq(AnnParams.Default, AnnParams(ivfK = 8, ivfProbe = 2))) {
      val ivf = Similarity.knnIvf(spark, dir, p).collect()
      assert(ivf.nonEmpty)
      assert(ivf.groupBy(_.getLong(0)).values.forall(_.length <= 5))
    }
    // generated oracles interpolate the SAME parameters both sides
    assert(Similarity.lshOracleSql(AnnParams(numPlanes = 6))
      .contains("xor(bucket, 32)")) // 6th plane bit present
    assert(!Similarity.lshOracleSql(AnnParams.Default).contains("xor(bucket, 16)"))
    assert(Similarity.ivfOracleSql(AnnParams(ivfK = 8, ivfProbe = 2))
      .contains("BETWEEN 100 AND 107"))
    // MinHash at a second band count still yields verified-Jaccard pairs
    val b16 = graft.operators.Dedup.minhashPairs(spark, dir, 16).collect()
    assert(b16.forall(_.getDouble(2) >= 0.1))
    assert(graft.operators.Dedup.minhashOracleSql(16).contains("range(0, 16)"))
  }

  test("q106 edit-distance dedup: threshold holds, dists exact, filters the reorder pairs") {
    val rows = graft.operators.Dedup.queries("q106_edit_distance_dedup")(
      spark, dir).collect()
    assert(rows.nonEmpty, "q106 must produce pairs on the fixture")
    // decision bound holds on every output row (integer form)
    rows.foreach { r =>
      assert(r.getLong(2) * 5 <= r.getLong(3) * 2,
        s"pair ${r.getLong(0)}/${r.getLong(1)} violates dist*5 <= maxlen*2")
    }
    // and it FILTERS: the verify must prune part of the banded
    // candidate set (the fixture's reordered-token collisions sit at
    // NED ~0.7, far over the 0.4 bar; on this corpus Jaccard-0.1 and
    // NED-0.4 happen to agree pair-for-pair, so the pin is against
    // the CANDIDATES, not against q33's output)
    val cand = graft.operators.Dedup.lshCandidatePairs(spark, dir, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e.subsetOf(cand), "edit-verified pairs must come from the LSH candidates")
    assert(e.size < cand.size, "edit verify must prune at least one candidate")
    // exactness: recompute Levenshtein in-test for a sample of pairs
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = d(0); d(0) = i
        for (j2 <- 1 to b.length) {
          val t = d(j2)
          d(j2) = math.min(math.min(d(j2) + 1, d(j2 - 1) + 1),
            prev + (if (a(i - 1) == b(j2 - 1)) 0 else 1))
          prev = t
        }
      }
      d(b.length)
    }
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(5).foreach { r =>
      val expect = lev(texts(r.getLong(0)), texts(r.getLong(1)))
      assert(r.getLong(2) == expect,
        s"edit_dist mismatch for ${r.getLong(0)}/${r.getLong(1)}")
    }
  }

  test("q107 MMR: exact greedy replay, rank-1 is the top hit, and it actually diversifies") {
    val rows = Similarity.queries("q107_mmr_diversify")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(r => (r._1, r._2))
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == 10 && byQ.values.forall(_.map(_._2).toSeq.sorted == Seq(1L, 2L, 3L, 4L, 5L)),
      "each of the 10 queries must get ranks 1..5")
    // independent greedy replay from raw vectors (same double ops in
    // the same order as the operator's dot/norm/combine arithmetic)
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val nrm = embs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }
    for (qid <- 0L until 10L) {
      val rel = embs.keys.filter(_ != qid).map(d =>
        d -> dot(embs(qid), embs(d)) / (nrm(qid) * nrm(d))).toSeq
      val cand = rel.sortBy { case (d, c) => (-c, d) }.take(20)
      var sel = Vector.empty[(Long, Double)] // (id, mmr)
      for (_ <- 1 to 5) {
        val pick = cand.filterNot(c => sel.exists(_._1 == c._1)).map { case (d, c) =>
          val pen = if (sel.isEmpty) 0.0
            else sel.map(s => dot(embs(d), embs(s._1)) / (nrm(d) * nrm(s._1))).max
          (d, 0.7 * c - 0.3 * pen)
        }.minBy { case (d, m) => (-m, d) }
        sel :+= pick
      }
      val got = byQ(qid).sortBy(_._2).map(r => (r._3, r._5))
      val want = sel.map { case (d, m) =>
        (d, BigDecimal(m).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      assert(got.map(_._1).toSeq == want.map(_._1),
        s"q$qid selection order mismatch: got ${got.map(_._1).toSeq} want ${want.map(_._1)}")
      // rank 1 is the plain cosine top-1
      assert(got.head._1 == cand.head._1, s"q$qid rank-1 must be the top hit")
    }
    // diversification is real on this corpus: at least one query's
    // selected SET differs from its plain top-5 (measured: 9 of 10)
    val divergent = (0L until 10L).count { qid =>
      val rel = embs.keys.filter(_ != qid).map(d =>
        d -> dot(embs(qid), embs(d)) / (nrm(qid) * nrm(d))).toSeq
      val top5 = rel.sortBy { case (d, c) => (-c, d) }.take(5).map(_._1).toSet
      byQ(qid).map(_._3).toSet != top5
    }
    assert(divergent >= 1, "MMR never diverged from plain top-5 — no diversification happening")
  }

  test("SETTINGS compression=zstd becomes a parquet writer property") {
    val ct = RangerDdl.parse(
      "CREATE TABLE t (id int64) STORAGE filesystem SETTINGS compression=zstd")
    assert(ct.toSparkSql("default").contains("'parquet.compression'='zstd'"))
    assertThrows[RangerDdl.ParseError](RangerDdl.parse(
      "CREATE TABLE t (id int64) SETTINGS compression=rar"))
    // end-to-end: rows survive a zstd write+read
    val engine = new QueryEngine(spark)
    engine.execute("CREATE DATABASE IF NOT EXISTS dz")
    engine.execute("DROP TABLE IF EXISTS dz.z")
    engine.execute(
      "CREATE TABLE dz.z (id int64, v string) STORAGE filesystem SETTINGS compression=zstd")
    engine.execute("INSERT INTO dz.z VALUES (1,'a'),(2,'b')")
    assert(engine.execute("SELECT count(*) AS c FROM dz.z").data.head.head == 2L)
    engine.execute("DROP TABLE dz.z")
  }

  test("PQ encoding: 32-bit codes, deterministic, sample vectors reconstruct exactly") {
    val rows = Similarity.queries("q64_pq_encode")(spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.nonEmpty)
    rows.values.foreach { case (code, err) =>
      assert(code >= 0 && code < (1L << 32), s"code $code out of 32-bit range")
      assert(err >= 0.0, s"negative reconstruction error $err")
    }
    // the 16 codebook sample vectors (vec_id 200-215) are their own
    // nearest sub-centroids in every subvector: exact reconstruction
    (200L to 215L).foreach { id =>
      rows.get(id).foreach { case (_, err) =>
        assert(err == 0.0, s"sample vector $id should reconstruct exactly, err=$err")
      }
    }
    // deterministic re-run
    val again = Similarity.queries("q64_pq_encode")(spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows == again)
  }

  test("PQ ADC top-k: 10x5 shape, non-negative sorted distances, codes-only corpus") {
    val rows = Similarity.queries("q64b_pq_adc_knn")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 50)
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == 10)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_._3).forall(_ >= 0.0), s"negative ADC distance for query $q")
      assert(rs.map(_._2).distinct.length == 5, s"duplicate neighbors for $q")
      assert(!rs.exists(_._2 == q), "query must not match itself")
    }
    // deterministic re-run (codes + LUTs are content-derived)
    val again = Similarity.queries("q64b_pq_adc_knn")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.sortBy(r => (r._1, r._2)).toSeq ==
      again.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("IVF+PQ: probing dominance — cell-restricted top-k never beats full ADC") {
    def ranked(q: String): Map[Long, Seq[Double]] =
      Similarity.queries(q)(spark, TestSpark.sfDir).collect()
        .map(r => (r.getLong(0), r.getDouble(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val full = ranked("q64b_pq_adc_knn")     // ADC over the whole corpus
    val probed = ranked("q65_ivfpq_knn")     // ADC over probed cells only
    assert(probed.keySet == full.keySet)
    probed.foreach { case (q, ds) =>
      assert(ds.length == 5, s"query $q returned ${ds.length} rows")
      // restricting candidates to nprobe cells can only keep or worsen
      // each rank's distance (same scoring function, subset of corpus)
      ds.zip(full(q)).zipWithIndex.foreach { case ((p, f), i) =>
        assert(p >= f - 1e-9, s"query $q rank $i: probed $p < full $f")
      }
    }
  }

  test("semdedup matches an independent scalar recomputation; one survivor per cell") {
    val got = Similarity.queries("q68_semdedup")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // independent recomputation with the same arithmetic order
    val vecs = graft.sources.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val cents = vecs.filter { case (id, _) => id >= 100 && id <= 115 }
      .map(_._2)
    def assign(v: Array[Double]): Int =
      cents.zipWithIndex.map { case (c, ci) =>
        var d = 0.0
        var i = 0
        while (i < v.length) { val x = c(i) - v(i); d += x * x; i += 1 }
        (d, ci)
      }.min._2
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val byCell = vecs.groupBy { case (_, v) => assign(v).toLong }
    val want = byCell.map { case (cell, members) =>
      val dropped = members.count { case (bId, bv) =>
        members.exists { case (aId, av) =>
          aId < bId &&
            dot(av, bv) / (math.sqrt(dot(av, av)) * math.sqrt(dot(bv, bv))) >= 0.4
        }
      }
      cell -> (members.length.toLong, dropped.toLong)
    }
    assert(got == want, s"semdedup mismatch:\n got  $got\n want $want")
    // population partitions the corpus; the min-id member of a cell
    // can never be dropped, so every cell keeps at least one vector
    assert(got.values.map(_._1).sum == vecs.length)
    got.foreach { case (cell, (n, d)) =>
      assert(d < n, s"cell $cell dropped everything")
    }
    // second operating point (k=8, threshold 0.35): coarser cells ->
    // bigger cells; lower threshold -> at least as many drops overall
    // per vector pair considered; corpus still partitions
    val b = Similarity.queries("q68b_semdedup_k8")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(b.keySet.size <= 8)
    assert(b.values.map(_._1).sum == vecs.length)
    b.foreach { case (cell, (n, d)) => assert(d < n, s"cell $cell") }
  }

  test("ivfK tracks corpus size: sqrt heuristic, clamps, auto conf") {
    import Similarity.AnnParams
    // sqrt regime with floor/ceiling clamps
    assert(AnnParams.ivfKFor(100) == 16)        // floor: Default.ivfK
    assert(AnnParams.ivfKFor(500) == 23)        // ceil(sqrt(500))
    assert(AnnParams.ivfKFor(2000) == 45)       // sf0.1 corpus
    assert(AnnParams.ivfKFor(200000) == 448)
    assert(AnnParams.ivfKFor(10000000000L) == 65536) // ceiling clamp
    // monotone: growing the corpus never shrinks the codebook
    val ks = Seq(1L, 500L, 5000L, 500000L, 5000000000L)
      .map(AnnParams.ivfKFor)
    assert(ks == ks.sorted, ks.toString)
    // no conf -> auto-derived from the corpus (500 vectors here)
    assert(Similarity.annParamsFor(spark, dir).ivfK == 23)
    // explicit conf wins; "auto" derives explicitly
    spark.conf.set("spark.graft.ann.ivf.k", "8")
    try assert(Similarity.annParamsFor(spark, dir).ivfK == 8)
    finally spark.conf.unset("spark.graft.ann.ivf.k")
    spark.conf.set("spark.graft.ann.ivf.k", "auto")
    try assert(Similarity.annParamsFor(spark, dir).ivfK == 23)
    finally spark.conf.unset("spark.graft.ann.ivf.k")
  }

  test("session-tunable params: conf-driven runs equal the explicit operating points") {
    // spark.graft.ann.* -> AnnParams.from drives the SAME pipeline as
    // an explicit params value (the SETTINGS-tunable path the
    // operating-point queries q37b/q41b pin with generated oracles)
    spark.conf.set("spark.graft.ann.planes", "6")
    spark.conf.set("spark.graft.ann.ivf.k", "8")
    spark.conf.set("spark.graft.ann.ivf.nprobe", "2")
    try {
      val p = Similarity.AnnParams.from(spark)
      assert(p == Similarity.AnnParams(numPlanes = 6, ivfK = 8, ivfProbe = 2))
      val gotLsh = Similarity.knnLsh(spark, dir, p).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val wantLsh = Similarity.queries("q37b_knn_lsh_p6")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(gotLsh == wantLsh)
      val gotIvf = Similarity.knnIvf(spark, dir, p).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val wantIvf = Similarity.queries("q41b_knn_ivf_k8")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(gotIvf == wantIvf)
    } finally Seq("spark.graft.ann.planes", "spark.graft.ann.ivf.k",
                  "spark.graft.ann.ivf.nprobe").foreach(spark.conf.unset)
    // spark.graft.minhash.bands -> bandsFor drives minhashPairs
    spark.conf.set("spark.graft.minhash.bands", "16")
    try {
      assert(graft.operators.Dedup.bandsFor(spark) == 16)
      val got = graft.operators.Dedup
        .minhashPairs(spark, dir, graft.operators.Dedup.bandsFor(spark))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = graft.operators.Dedup.queries("q33b_minhash_b16")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want)
    } finally spark.conf.unset("spark.graft.minhash.bands")
  }

  test("embedding decontamination (q75): scalar recomputation of max-cosine ranking") {
    val got = Similarity.queries("q75_embed_decontam")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 50)
    // descending contamination scores; corpus side only; bench ids valid
    assert(got.map(_._3).sameElements(got.map(_._3).sorted(Ordering[Double].reverse)))
    got.foreach { case (id, b, _) => assert(id >= 10 && b < 10) }
    // scalar recomputation (same sequential dot arithmetic)
    val vecs = graft.sources.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val bench = vecs.filter(_._1 < 10)
    val want = vecs.filter(_._1 >= 10).map { case (id, v) =>
      val (bid, mc) = bench.map { case (b, bv) =>
        (b, dot(bv, v) / (math.sqrt(dot(bv, bv)) * math.sqrt(dot(v, v))))
      }.maxBy { case (b, c) => (c, b) }
      (id, bid, mc)
    }.sortBy { case (id, _, mc) => (-mc, id) }.take(50)
      .map { case (id, b, mc) =>
        (id, b, BigDecimal(mc).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    assert(got.toSeq == want.toSeq)
  }

  test("cluster-balanced sampling (q74): per-cell caps, corpus partition, distance order") {
    val corpusSize = graft.sources.Tables.load(spark, dir, "embeddings").count()
    for ((name, m) <- Seq("q74_cluster_sample" -> 10,
                          "q74b_cluster_sample_k8" -> 5)) {
      val rows = Similarity.queries(name)(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                   r.getDouble(3), r.getDouble(4)))
      assert(rows.nonEmpty, name)
      // cells partition the corpus
      assert(rows.map(_._2).sum == corpusSize, name)
      rows.foreach { case (cell, nVec, nKept, minD, maxKeptD) =>
        // keep exactly min(m, population) per cell — the balance property
        assert(nKept == math.min(m.toLong, nVec), s"$name cell $cell")
        // kept members are the closest: min distance is a kept distance
        assert(minD <= maxKeptD + 1e-12, s"$name cell $cell")
        assert(minD >= 0.0, s"$name cell $cell")
      }
    }
  }

  test("Lloyd refinement (q88): WSS decreases vs the sampled codebook; cells partition the corpus") {
    val corpusSize = graft.sources.Tables.load(spark, dir, "embeddings").count()
    def wss(iters: Int): (Long, Long) = {
      val rows = Similarity.kmeansCells(spark, dir, 16, iters).collect()
        .map(r => (r.getLong(1), r.getLong(2)))
      (rows.map(_._1).sum, rows.map(_._2).sum)
    }
    val (n0, w0) = wss(0) // sampled codebook, no refinement
    val (n2, w2) = wss(2)
    assert(n0 == corpusSize && n2 == corpusSize) // every vector lands in a cell
    // Lloyd monotonicity: each assign+mean round cannot increase total
    // within-cell sum of squares (quantization distortion is bounded by
    // k*Dim counts of 2^-20 — far below the improvement on real data)
    assert(w2 < w0, s"refined WSS $w2 should beat sampled WSS $w0")
    info(f"WSS sampled=$w0 refined(2)=$w2 (${100.0 * (w0 - w2) / w0}%.1f%% down)")
  }

  test("Lloyd empty-cell rule: a centroid that loses all members survives unchanged") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    // 4 vectors near [1,0,...] and a far-away init centroid nobody picks:
    // after one round, cell 0 keeps its (never-chosen) init coordinates.
    val base = Seq.tabulate(4)(i =>
      (i.toLong, Array.tabulate(64)(j => if (j == 0) 1.0f + i * 0.01f else 0.0f)))
      .toDF("vec_id", "embedding")
    val n = base.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("ve"))
    val far = Seq.tabulate(64)(j => if (j == 1) 100.0 else 0.0)
    val near = Seq.tabulate(64)(j => if (j == 0) 0.5 else 0.0)
    val refined = Similarity.lloydRefine(n, Seq(far, near), iters = 1)
    assert(refined(0) == far, "empty cell must keep its previous centroid")
    // the winning cell moved to the quantized mean of its 4 members
    assert(math.abs(refined(1)(0) - 1.015) < 1e-4)
    assert(refined(1)(1) == 0.0)
  }

  test("hard negatives: every row is wrong-label, top-k, and matches the window formulation") {
    import org.apache.spark.sql.functions._
    val anchors = spark.read.parquet(s"$dir/embeddings.parquet")
      .where(col("vec_id") < 10).select(col("vec_id"), col("label"))
      .collect()
      .map(r => r.getAs[Number](0).longValue -> r.getAs[Number](1).longValue)
      .toMap
    val rows = Similarity.queries("q104_hard_negatives")(spark, dir).collect()
    assert(rows.nonEmpty)
    // k rows per anchor, every negative carries a label != the anchor's
    val perQ = rows.groupBy(_.getLong(0))
    assert(perQ.values.forall(_.length <= 5))
    rows.foreach { r =>
      assert(r.getAs[Number](2).longValue != anchors(r.getLong(0)),
        s"same-label negative for anchor ${r.getLong(0)}: $r")
      assert(r.getLong(1) >= 10, "anchors must not appear as negatives")
    }
    // the TopKPerKey plan == the window+row_number formulation, row for row
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label"))
    val brute = Similarity.queries("q36_knn_brute")(spark, dir)
    // reference: rank brute-style but with the label filter, via window
    import org.apache.spark.sql.expressions.Window
    val n = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("ve"))
      .withColumn("nrm", sqrt(graft.functions.expressions.ArrayOps
        .dotProduct(col("ve"), col("ve"))))
    val q = n.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
              col("ve").as("qve"), col("nrm").as("qnrm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val ref = n.where(col("vec_id") >= 10)
      .join(q, col("label") =!= col("qlabel"))
      .withColumn("cosine", graft.functions.expressions.ArrayOps
        .dotProduct(col("qve"), col("ve")) / (col("qnrm") * col("nrm")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
              col("label").as("neg_label"), col("cosine"))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("neg_label"),
              round(col("cosine"), 4).as("cosine"))
      .collect().map(_.toSeq).toSet
    assert(rows.map(_.toSeq).toSet == ref)
    val _ = (labels, brute)
  }

  test("hard negatives IVF: subset semantics and useful recall vs exact") {
    val exact = Similarity.queries("q104_hard_negatives")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val celled = Similarity.queries("q104b_hard_negatives_ivf")(spark, dir)
      .collect()
    assert(celled.nonEmpty)
    assert(celled.groupBy(_.getLong(0)).values.forall(_.length <= 5))
    val recall = celled.map(r => (r.getLong(0), r.getLong(1))).toSet
      .intersect(exact).size.toDouble / exact.size
    info(f"hard-negative IVF recall@5: $recall%.2f")
    assert(recall >= 0.3, s"recall too low: $recall")
  }
}
