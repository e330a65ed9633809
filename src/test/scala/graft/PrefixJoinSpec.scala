package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** q35b exact prefix-filtering similarity join: the candidate stage
  * must be a SUPERSET of the true >= t pairs (the prefix theorem), and
  * the verified output must equal a brute-force quadratic Jaccard —
  * exactness is the operator's whole contract vs the LSH families. */
class PrefixJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bruteForce(corpus: Seq[(Long, String)], num: Int, den: Int)
      : Set[(Long, Long)] = {
    val sets = corpus.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSet }.toMap
    (for {
      (i, si) <- sets.toSeq; (j, sj) <- sets.toSeq
      if i < j
      inter = (si & sj).size; uni = (si | sj).size
      if inter * den >= uni * num
    } yield (i, j)).toSet
  }

  private def runJoin(corpus: Seq[(Long, String)], num: Int, den: Int)
      : Set[(Long, Long)] =
    Dedup.prefixSimilarityJoin(corpus.toDF("doc_id", "text"), num, den)
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet

  test("planted pairs: exact dup, near-dup above t, pair below t") {
    val corpus = Seq[(Long, String)](
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota mu"),
      (4L, "alpha beta gamma nu xi omicron pi rho sigma tau"),
      (5L, "completely different tokens here none shared with others"))
    val got = runJoin(corpus, 9, 10)
    assert(got == bruteForce(corpus, 9, 10))
    assert(got.contains((1L, 2L))) // J = 1.0
    // docs 1 and 3 share 9 of 11 distinct tokens: J = 9/11 < 0.9
    assert(!got.contains((1L, 3L)) && !got.contains((1L, 4L)))
    // and at t = 0.8 the 9/11 pair is STILL below, but 9/10-overlap sets join
    val got08 = runJoin(corpus, 4, 5)
    assert(got08 == bruteForce(corpus, 4, 5))
  }

  test("random corpora match brute force at several thresholds") {
    val rng = new scala.util.Random(53)
    val vocab = (0 until 60).map("w" + _)
    val corpus: Seq[(Long, String)] = (0 until 80).map { i =>
      // clustered generation so some pairs land near every threshold
      val seed = vocab.drop((i % 7) * 5).take(12)
      val noise = (0 until rng.nextInt(3)).map(_ => vocab(rng.nextInt(60)))
      (i.toLong, rng.shuffle(seed ++ noise).mkString(" "))
    }
    for ((num, den) <- Seq((9, 10), (4, 5), (3, 5)))
      assert(runJoin(corpus, num, den) == bruteForce(corpus, num, den),
             s"mismatch at t=$num/$den")
  }

  test("Zipf corpus: candidate stage prunes and still covers all matches") {
    val rng = new scala.util.Random(59)
    // Zipfian token draws — realistic DF skew, so DF-ranked prefixes
    // are rare tokens and the candidate join must prune hard
    def zipfTok(): String = {
      val r = rng.nextDouble()
      "z" + math.min((1.0 / math.max(r, 1e-4) - 1).toInt, 2000)
    }
    val corpus: Seq[(Long, String)] = (0 until 300).map { i =>
      val toks = (0 until 30).map(_ => zipfTok()).distinct
      (i.toLong, toks.mkString(" "))
    } ++ Seq((9001L, "p q r s t u v w x y"), (9002L, "p q r s t u v w x y"))
    val brute = bruteForce(corpus, 9, 10)
    assert(brute.contains((9001L, 9002L)))
    assert(runJoin(corpus, 9, 10) == brute)

    import graft.functions.expressions.ArrayOps
    val base = corpus.toDF("doc_id", "text").select(col("doc_id"),
      array_distinct(ArrayOps.sortedHashes(
        array_distinct(graft.functions.Text.tokens(col("text"))))).as("hs"))
    val candidates = Dedup.prefixCandidatePairs(base, 9, 10).count()
    val totalPairs = corpus.size.toLong * (corpus.size - 1) / 2
    assert(candidates < totalPairs / 10,
      s"prefix+length filters should prune >90% on Zipf data " +
        s"($candidates of $totalPairs)")
  }

  test("exact-duplicate grouping: replicated docs expand exactly, empty sets stay out") {
    // the r12 restructure runs candidates+verify once per DISTINCT
    // token set and expands — a replicated corpus (the 10x scale
    // replica, template corpora) must produce byte-identical pairs to
    // brute force, including intra-group (J=1.0) and cross-group
    // near-dup pairs, and docs with no tokens must not pair at all
    val protoA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val protoB = "alpha beta gamma delta epsilon zeta eta theta iota lambda xi"
    val corpus: Seq[(Long, String)] =
      (0 until 5).map(i => (i.toLong, protoA)) ++          // group A x5
      (10 until 13).map(i => (i.toLong, protoB)) ++        // group B x3
      Seq((20L, "totally unrelated content here")) ++
      Seq((21L, null.asInstanceOf[String])) ++             // null set
      Seq((23L, protoA.split(" ").reverse.mkString(" ")))  // same SET as A
    val brute = bruteForce(corpus.filter(_._2 != null), 9, 10)
    val got = runJoin(corpus, 9, 10)
    assert(got == brute, s"got=$got\nbrute=$brute")
    // group A (+23, same set) has C(6,2)=15 intra pairs, all present
    assert((0 until 5).combinations(2).forall(p =>
      got.contains((p(0).toLong, p(1).toLong))))
    assert(got.contains((0L, 23L)))
    // a null-text doc (null token set) appears nowhere — it never
    // enters the ungrouped algorithm, so it must not form a group
    assert(!got.exists { case (a, b) => a == 21L || b == 21L })
    // jaccard values: intra pairs are exactly 1.0
    val j = Dedup.prefixSimilarityJoin(corpus.toDF("doc_id", "text"), 9, 10)
      .where(col("doc1") === 0L && col("doc2") === 1L)
      .select("jaccard").collect()
    assert(j.head.getDouble(0) == 1.0)
  }

  test("positional bound theorem: the filter never loses a true pair, and it prunes") {
    // Adversarial-for-positional corpus: long docs whose TAIL overlaps
    // short docs' PREFIX. The prefix+length filters admit these (the
    // shared token is in both prefixes once DF-ranked, lengths within
    // ratio), but the positional upper bound
    //   min(p, q) + 1 + min(nx-p-1, ny-q-1)
    // proves the overlap cannot reach ceil(t(nx+ny)/(1+t)) — so the
    // verify join shrinks while results stay EXACTLY brute force.
    val rng = new scala.util.Random(61)
    val vocab = (0 until 40).map("v" + _)
    val corpus: Seq[(Long, String)] = (0 until 120).map { i =>
      val start = (i % 10) * 3
      val len = 10 + rng.nextInt(3)
      (i.toLong,
        (0 until len).map(j => vocab((start + j) % 40)).distinct.mkString(" "))
    } ++ Seq(
      (8001L, "v0 v1 v2 v3 v4 v5 v6 v7 v8 v9"),
      (8002L, "v0 v1 v2 v3 v4 v5 v6 v7 v8 v9"))
    val brute = bruteForce(corpus, 9, 10)
    assert(brute.contains((8001L, 8002L)))
    // completeness at several thresholds — the theorem's actual claim
    for ((num, den) <- Seq((9, 10), (4, 5), (3, 5)))
      assert(runJoin(corpus, num, den) == bruteForce(corpus, num, den),
        s"positional filter lost pairs at t=$num/$den")

    // and it PRUNES: candidates with the positional conjunct stay
    // strictly below the quadratic floor the overlap-structure implies
    import graft.functions.expressions.ArrayOps
    val base = corpus.toDF("doc_id", "text").select(col("doc_id"),
      array_distinct(ArrayOps.sortedHashes(
        array_distinct(graft.functions.Text.tokens(col("text"))))).as("hs"))
    val cands = Dedup.prefixCandidatePairs(base, 9, 10)
      .as[(Long, Long)].collect().toSet
    assert(brute.subsetOf(cands), "candidates must cover all true pairs")
    val totalPairs = corpus.size.toLong * (corpus.size - 1) / 2
    assert(cands.size < totalPairs / 4,
      s"positional+prefix+length should prune hard (${cands.size} of $totalPairs)")
  }
}
