package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Curation

/** The batched-BPE selection theorem, tested two ways:
  *
  *  1. unit cases for every stop rule of `Curation.selectBatch`
  *     (conflict closes the batch, self-pair closes it, merged-output
  *     string collision closes it, ties with the first excluded pair
  *     are truncated);
  *  2. a generative differential: random word-frequency tables over a
  *     TINY alphabet (so ties, self-pairs, and string collisions are
  *     common), trained by a pure sequential-greedy reference and by a
  *     pure replica of the batched driver loop (same 4B+1 candidate
  *     limit, same selectBatch) — merge lists must be identical for
  *     every batch size.
  *
  * This is the evidence that lets q89's Spark side run merges/B driver
  * rounds while the DuckDB oracle replays one-merge-per-round greedy
  * and still hash-matches. */
class BpeBatchSpec extends AnyFunSuite {

  type Word = Vector[String]
  type Merge = (String, String, Long)

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def pairCounts(words: Map[Word, Long]): Map[(String, String), Long] = {
    val m = scala.collection.mutable.Map
      .empty[(String, String), Long].withDefaultValue(0L)
    for ((syms, c) <- words; i <- 0 until syms.length - 1)
      m((syms(i), syms(i + 1))) += c
    m.toMap
  }

  /** Greedy left-to-right merge application — the same scan the
    * separator-invariant `replace` performs on the Spark side. */
  private def applyMerge(words: Map[Word, Long], a: String, b: String)
      : Map[Word, Long] =
    words.groupBy { case (syms, _) =>
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }.view.mapValues(_.values.sum).toMap

  private def sortedPairs(words: Map[Word, Long]): IndexedSeq[Merge] =
    pairCounts(words).toIndexedSeq
      .map { case ((a, b), c) => (a, b, c) }
      .sortBy { case (a, b, c) => (-c, a, b) }

  /** One merge per round — the semantics the DuckDB oracle replays. */
  private def seqGreedy(words0: Map[Word, Long], rounds: Int): List[Merge] = {
    var words = words0
    val out = List.newBuilder[Merge]
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val ps = sortedPairs(words)
      if (ps.isEmpty) done = true
      else {
        val (a, b, c) = ps.head
        out += ((a, b, c))
        words = applyMerge(words, a, b)
      }
      r += 1
    }
    out.result()
  }

  /** Pure replica of the batched driver loop in Curation.bpeTrain:
    * candidates capped at 4m+1 (with the exhaustive flag when the cap
    * is not reached), selectBatch picks the safe prefix, merges apply
    * in order. */
  private def batched(words0: Map[Word, Long], rounds: Int,
                      batchMax: Int): List[Merge] = {
    var words = words0
    val out = List.newBuilder[Merge]
    var n = 0
    var done = false
    while (n < rounds && !done) {
      val m = math.min(batchMax, rounds - n)
      val limit = 4 * m + 1
      val all = sortedPairs(words)
      val top = all.take(limit)
      if (top.isEmpty) done = true
      else {
        val sel = Curation.selectBatch(top, m, exhaustive = top.length < limit)
        for ((a, b, c) <- sel) {
          out += ((a, b, c))
          words = applyMerge(words, a, b)
          n += 1
        }
      }
    }
    out.result()
  }

  // -- selectBatch stop rules -----------------------------------------

  test("conflict closes the batch as a prefix (no skipping past it)") {
    val top = IndexedSeq(("a", "b", 10L), ("b", "c", 9L), ("x", "y", 8L))
    assert(Curation.selectBatch(top, 3, exhaustive = true) ==
      IndexedSeq(("a", "b", 10L)))
  }

  test("self-pair is only ever the last element of a batch") {
    val top = IndexedSeq(("a", "a", 10L), ("x", "y", 9L))
    assert(Curation.selectBatch(top, 2, exhaustive = true) ==
      IndexedSeq(("a", "a", 10L)))
    // ...but a self-pair ranked later still joins (then closes)
    val top2 = IndexedSeq(("x", "y", 10L), ("a", "a", 9L), ("u", "v", 8L))
    assert(Curation.selectBatch(top2, 3, exhaustive = true) ==
      IndexedSeq(("x", "y", 10L), ("a", "a", 9L)))
  }

  test("a pair whose symbol equals an earlier merged output closes the batch") {
    val top = IndexedSeq(("a", "b", 10L), ("ab", "c", 9L), ("x", "y", 8L))
    assert(Curation.selectBatch(top, 3, exhaustive = true) ==
      IndexedSeq(("a", "b", 10L)))
  }

  test("selected tail tied with the first excluded pair is truncated") {
    // F = (a,c) with c=5; (x,y) ties it and is dropped; p1 survives
    // even when everything ties (p1 alone IS sequential greedy).
    val top = IndexedSeq(("a", "b", 10L), ("x", "y", 5L), ("a", "c", 5L))
    assert(Curation.selectBatch(top, 3, exhaustive = true) ==
      IndexedSeq(("a", "b", 10L)))
    val allTied = IndexedSeq(("a", "b", 5L), ("x", "y", 5L), ("a", "c", 5L))
    assert(Curation.selectBatch(allTied, 3, exhaustive = true) ==
      IndexedSeq(("a", "b", 5L)))
  }

  test("an exhaustive conflict-free list needs no truncation") {
    val top = IndexedSeq(("a", "b", 5L), ("x", "y", 5L))
    assert(Curation.selectBatch(top, 2, exhaustive = true) == top)
  }

  test("a truncated list that never reveals F is rejected") {
    val top = IndexedSeq(("a", "b", 5L), ("x", "y", 5L))
    intercept[IllegalArgumentException] {
      Curation.selectBatch(top, 2, exhaustive = false)
    }
  }

  // -- generative differential: batched == sequential greedy ----------

  // Tiny alphabet + short words makes collisions the NORM: merged
  // outputs like "ab"/"aa" quickly equal other merge inputs, counts
  // tie constantly, runs of one letter exercise self-pairs.
  private val wordTableGen: Gen[Map[Word, Long]] = for {
    n <- Gen.choose(2, 14)
    entries <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 6)
      cs <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
      cnt <- Gen.choose(1L, 8L)
    } yield (cs.toVector, cnt))
  } yield entries.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap

  test("batched merge list == sequential greedy for every batch size (300 random tables)") {
    for (words <- samples(wordTableGen, 300)) {
      val ref = seqGreedy(words, 12)
      for (b <- Seq(1, 2, 3, 4, 16)) {
        val got = batched(words, 12, b)
        assert(got == ref,
          s"batch=$b diverged on $words:\n got=$got\n ref=$ref")
      }
    }
  }

  // -- local incremental trainer == sequential greedy ------------------

  private def toTable(words: Map[Word, Long]): Array[(Array[String], Long)] =
    words.toArray.map { case (syms, c) => (syms.toArray, c) }

  test("incremental local trainer == sequential greedy (300 random tables)") {
    for (words <- samples(wordTableGen, 300)) {
      val ref = seqGreedy(words, 12)
      val got = graft.operators.BpeTrainer.train(toTable(words), 12)._1
        .map { case (_, a, b, _, c) => (a, b, c) }.toList
      assert(got == ref, s"local trainer diverged on $words")
    }
  }

  test("local trainer orders non-ASCII symbols by UTF-8 bytes, not UTF-16") {
    import graft.operators.BpeTrainer
    // U+FF10 '０' (UTF-8: ef bc 90) vs U+10000 '𐀀' (surrogate pair in
    // UTF-16, but UTF-8: f0 90 80 80 — AFTER ef bc 90). String.compareTo
    // sorts the surrogate pair FIRST (\ud800 < ０); byte order must
    // not.
    val hi = "𐀀" // U+10000
    val full = "０"     // U+FF10
    assert(full.compareTo(hi) > 0)          // UTF-16 order
    assert(BpeTrainer.utf8Compare(full, hi) < 0) // UTF-8 order
    // two tied pairs whose winner differs under the two orders: the
    // trainer must merge (full, x) before (hi, x)
    val words = Map(
      Vector(full, "x") -> 5L,
      Vector(hi, "x") -> 5L)
    val got = BpeTrainer.train(toTable(words), 1)._1
    assert(got.head._2 == full, s"picked ${got.head._2}: UTF-16 ordering")
  }

  test("local trainer on a diverse table: per-merge work is posting-bounded") {
    // smoke the incremental path at a scale where a recount-per-round
    // trainer would visibly crawl: 20k distinct words, 512 merges
    val rnd = new scala.util.Random(7)
    val letters = "abcdefghijklmnop"
    val words = (1 to 20000).map { _ =>
      Vector.fill(4 + rnd.nextInt(8))(
        letters(rnd.nextInt(letters.length)).toString)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t0 = System.nanoTime()
    val got = graft.operators.BpeTrainer.train(toTable(words), 512)._1
    val sec = (System.nanoTime() - t0) / 1e9
    assert(got.size == 512)
    // counts non-increasing (greedy invariant)
    val cs = got.map(_._5)
    assert(cs.zip(cs.drop(1)).forall { case (x, y) => y <= x })
    assert(sec < 30.0, f"local trainer too slow: $sec%.1f s")
  }

  test("engineered self-pair dominance stays equivalent") {
    // "aaaa"-style runs: merging (a,a) creates (aa,a)/(a,aa) pairs
    // whose counts are NOT bounded by the first excluded pair — the
    // self-pair stop rule is what keeps these equal.
    val words = Map(
      Vector("a", "a", "a", "a", "a") -> 100L,
      Vector("b", "c") -> 90L,
      Vector("c", "b") -> 80L)
    for (b <- Seq(1, 2, 4, 16))
      assert(batched(words, 8, b) == seqGreedy(words, 8))
  }
}
