package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Classifier, Curation, Dedup, Similarity}

/** The three round-8 additions: the distributed-perceptron classifier
  * (q96 family), the leakage-safe split (q97), and the binary-prefilter
  * rerank (q95b). Each is pinned against an independent in-memory
  * reference, not just the DuckDB oracle. */
class PerceptronSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private val Stop = Set("the", "a", "of", "and", "to", "in")

  /** Pure in-memory replica of the iterative-parameter-mixing trainer
    * (features, sharding, fold order, truncated mean) built straight
    * from the raw documents — shares NOTHING with the Spark
    * implementation. `part`: -1 all docs, 0 corpus (doc_id%10 != 7),
    * 1 the arriving batch. */
  private def referenceExamples(part: Int)
      : Array[(Long, Long, Long, Array[Long])] = {
    val D = Classifier.D; val NF = Classifier.NF; val S = Classifier.S
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      .filter { case (id, _) => part match {
        case 0 => id % 10 != 7
        case 1 => id % 10 == 7
        case _ => true } }
    docs.flatMap { case (id, text) =>
      val toks = text.split(" ", -1)
      val marg = 20L * toks.count(Stop) - toks.length
      if (math.abs(marg) < Classifier.Deadband) None
      else {
        val y = if (marg >= 0) 1L else -1L
        val x = Array.fill(NF)(0L); x(D) = 1L
        toks.foreach { t =>
          val j = (java.lang.Long.parseLong(md5hex(t).substring(8, 16), 16) % D).toInt
          x(j) += 1L
        }
        val sh = java.lang.Long.parseLong(md5hex(text).substring(0, 8), 16) % S
        Some((sh, id, y, x))
      }
    }
  }

  private def referenceMix(ex: Array[(Long, Long, Long, Array[Long])],
                           init: Array[Long], epochs: Int): Array[Long] = {
    val NF = Classifier.NF; val S = Classifier.S
    var w = init
    for (_ <- 0 until epochs) {
      val seed = w
      val byShard = ex.groupBy(_._1)
      val ws = byShard.toSeq.map { case (_, rows) =>
        var wv = seed.clone()
        rows.sortBy(_._2).foreach { case (_, _, y, x) =>
          val dot = (0 until NF).map(k => wv(k) * x(k)).sum
          if (y * dot <= 0L) wv = Array.tabulate(NF)(k => wv(k) + y * x(k))
        }
        wv
      }
      val absent = S - ws.length
      w = Array.tabulate(NF) { k =>
        (ws.map(_(k)).sum + absent * seed(k)) / S
      }
    }
    w
  }

  private def referenceTrain(): (Array[Long], Seq[(Long, Array[Long])]) = {
    val ex = referenceExamples(-1)
    val w = referenceMix(ex, Array.fill(Classifier.NF)(0L), Classifier.Epochs)
    (w, ex.toSeq.map(e => (e._3, e._4)))
  }

  test("q96: trained weights equal the from-scratch reference trainer") {
    val (refW, _) = referenceTrain()
    val got = Classifier.queries("q96_perceptron_weights")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.length === Classifier.NF)
    val gotW = got.map(_._2)
    assert(gotW.toSeq === refW.toSeq)
  }

  test("q96: training converges — zero training error at the fixed point") {
    val (refW, ex) = referenceTrain()
    val errs = ex.count { case (y, x) =>
      y * (0 until Classifier.NF).map(k => refW(k) * x(k)).sum <= 0L }
    assert(errs === 0, s"training error $errs after ${Classifier.Epochs} epochs")
  }

  test("q96b: confusion matrix is diagonal and accounts every labeled doc") {
    val (_, ex) = referenceTrain()
    val rows = Classifier.queries("q96b_perceptron_confusion")(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(rows.keys.forall { case (l, p) => l == p },
      s"off-diagonal predictions: $rows")
    assert(rows.values.sum === ex.length)
  }

  test("q97: no near-dup cluster spans two splits (the leakage property)") {
    val assign = Dedup.splitAssignments(spark, dir, 32)
      .select("doc_id", "gid", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // every group maps to exactly one split
    val perGroup = assign.groupBy(_._2).map { case (_, xs) =>
      xs.map(_._3).distinct.length }
    assert(perGroup.forall(_ == 1))
    // and the split is the group REPRESENTATIVE's content bucket
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assign.foreach { case (_, gid, split) =>
      val b = java.lang.Long.parseLong(md5hex(texts(gid)).substring(0, 8), 16) % 100
      val want = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(split === want)
    }
    // totals account every document exactly once
    assert(assign.length === texts.size)
  }

  test("q97: pairs from the verifier land in the same split") {
    val assign = Dedup.splitAssignments(spark, dir, 32)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val pairs = Dedup.queries("q33_minhash_pairs")(spark, dir)
      .select("doc1", "doc2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(assign(a) === assign(b), s"near-dups $a/$b split apart") }
  }

  test("q96d: incremental warm-start equals the partitioned reference protocol") {
    val base = referenceMix(referenceExamples(0),
      Array.fill(Classifier.NF)(0L), Classifier.Epochs)
    val batch = referenceExamples(1)
    val upd = referenceMix(batch, base, Classifier.IncEpochs)
    val got = Classifier.queries("q96d_perceptron_incremental")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).map(_._2)
    assert(got.toSeq === upd.toSeq)
    // the production claims: batch epochs never see corpus docs, and
    // a base that already classifies the batch perfectly is a FIXED
    // POINT (no drift -> no update)
    def errs(w: Array[Long]) = batch.count { case (_, _, y, x) =>
      y * (0 until Classifier.NF).map(k => w(k) * x(k)).sum <= 0L }
    info(s"batch errors: base=${errs(base)} updated=${errs(upd)}")
    if (errs(base) == 0) assert(upd.toSeq === base.toSeq)
    assert(errs(upd) <= errs(base))
  }

  test("q98: curriculum is a permutation with all predicted-clean docs first") {
    val (refW, _) = referenceTrain()
    val rows = Classifier.queries("q98_score_curriculum")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.length === n)
    assert(rows.map(_._3).sorted.toSeq === (1L to n).toSeq,
      "global_pos must be the permutation 1..n")
    // every band-0 position precedes every band-1 position
    val maxClean = rows.filter(_._2 == 0L).map(_._3).max
    val minNoisy = rows.filter(_._2 == 1L).map(_._3).min
    assert(maxClean < minNoisy, "curriculum bands interleaved")
    // band agrees with the trained model's per-doc decision
    val scores = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("sc", graft.operators.Classifier.scoreExpr(refW.toSeq))
      .select("doc_id", "sc").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    rows.foreach { case (id, band, _) =>
      assert(band === (if (scores(id) > 0) 0L else 1L)) }
  }

  test("per-row scoreExpr equals the dense w·x margin on every labeled doc") {
    val (refW, _) = referenceTrain()
    val w = refW.toSeq
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val got = docs
      .withColumn("sc", graft.operators.Classifier.scoreExpr(w))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val texts = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    texts.foreach { case (id, text) =>
      val x = Array.fill(Classifier.NF)(0L); x(Classifier.D) = 1L
      text.split(" ", -1).foreach { t =>
        val j = (java.lang.Long.parseLong(md5hex(t).substring(8, 16), 16)
          % Classifier.D).toInt
        x(j) += 1L
      }
      val dense = (0 until Classifier.NF).map(k => w(k) * x(k)).sum
      assert(got(id) === dense, s"doc $id per-row vs dense margin")
    }
  }

  test("qualityScoreStream == batch scoring row-for-row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val w = graft.operators.Classifier
      .trainWeights(spark, dir)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Doc]
    val q = graft.streaming.DocStream.qualityScoreStream(input.toDF(), w)
      .writeStream.format("memory").queryName("quality_scores")
      .outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      val batch = Seq(
        Doc(200, "the a of and to in x", "s1", t0),
        Doc(201, "key agg row scan slow fast table value part hash", "s1", t0))
      input.addData(batch: _*)
      q.processAllAvailable()
      val streamed = spark.table("quality_scores").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1)
      val batchDf = batch.toDF()
      val expected = graft.streaming.DocStream
        .qualityScoreStream(batchDf, w).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1)
      assert(streamed.toSeq === expected.toSeq)
      // the stopword-dense doc scores positive, the word-soup one negative
      val byId = streamed.map(r => r._1 -> r._3).toMap
      assert(byId(200L) === 1L)
      assert(byId(201L) === -1L)
    } finally q.stop()
  }

  test("q95b: rerank cosines are exact and candidates come from the shortlist") {
    val rer = Similarity.queries("q95b_binary_rerank")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rer.nonEmpty)
    val perQ = rer.groupBy(_._1)
    assert(perQ.values.forall(_.length <= 5))
    // exact cosine recomputation from the raw embeddings
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble))).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    rer.foreach { case (q, n, c) =>
      assert(math.abs(cos(emb(q), emb(n)) - c) < 1e-4) }
  }

  test("q95b: exact rerank recovers brute-force top-k on shortlisted queries") {
    val brute = Similarity.queries("q36_knn_brute")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rer = Similarity.queries("q95b_binary_rerank")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = rer.intersect(brute).size.toDouble / brute.size
    info(f"binary-prefilter rerank recall@5: $recall%.2f")
    // the float pass can only lose neighbors the sign codes dropped;
    // the 8x shortlist keeps well over half of the true top-5
    assert(recall >= 0.5, s"rerank recall too low: $recall")
  }
}
