package graft.operators

/** Exact in-memory BPE trainer over a collected word-frequency table —
  * the single-node half of q89's two-mode architecture.
  *
  * Real tokenizer trainers (the HuggingFace / SentencePiece shape) do
  * exactly this split: the corpus-sized work — tokenize + count — is
  * distributed (one Spark groupBy here), and the merge loop runs over
  * the WORD TABLE, which is vocab-sized (a 100 TB web corpus has
  * ~10^8 distinct words ≈ a few GB — driver-sized, and 10^6× smaller
  * than the corpus). Per merge, only the words that actually contain
  * the merged pair are touched (posting lists), and the argmax comes
  * from a lazy-deletion heap — so a 30k-merge vocabulary is seconds of
  * driver CPU and ZERO extra Spark jobs, versus one vocab-sized
  * shuffle per batch in the distributed mode (Curation.bpeTrain),
  * which remains the fallback for word tables too large to collect.
  *
  * Bit-exactness: the merge order is (count DESC, a, b) with UNSIGNED
  * UTF-8 BYTE string comparison — the order Spark's `orderBy` and
  * DuckDB's `ORDER BY` both apply — so local mode, distributed mode,
  * and the DuckDB oracle replay produce identical merge lists even on
  * non-ASCII corpora (java's String.compareTo would diverge there:
  * UTF-16 code units order supplementary characters differently).
  */
object BpeTrainer {

  /** Unsigned UTF-8 byte comparison (memcmp order). */
  private[graft] def utf8Compare(x: String, y: String): Int = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(a.length, b.length)
    var i = 0
    var c = 0
    while (c == 0 && i < n) {
      c = (a(i) & 0xff) - (b(i) & 0xff)
      i += 1
    }
    if (c != 0) c else a.length - b.length
  }

  private[graft] val utf8Order: Ordering[String] =
    (x: String, y: String) => utf8Compare(x, y)

  /** Greedy left-to-right merge application — the same scan the
    * separator-invariant `replace` performs in the distributed mode. */
  private[graft] def applyMerge(syms: Array[String], a: String,
                                b: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def pairsOf(syms: Array[String])
      : scala.collection.mutable.Map[(String, String), Long] = {
    val m = scala.collection.mutable.Map
      .empty[(String, String), Long].withDefaultValue(0L)
    var i = 0
    while (i + 1 < syms.length) {
      m((syms(i), syms(i + 1))) += 1L
      i += 1
    }
    m
  }

  /** Train `rounds` greedy merges over `table` (symbol arrays with
    * word frequencies). Returns ((round, a, b, merged, count) per
    * executed merge, post-merge symbol arrays index-aligned with
    * `table`); stops early when no adjacent pair remains. */
  def train(table: Array[(Array[String], Long)], rounds: Int)
      : (Seq[(Int, String, String, String, Long)], Array[Array[String]]) = {
    val words = table.map(_._1)
    val cnts = table.map(_._2)
    val pairCount = scala.collection.mutable.Map
      .empty[(String, String), Long].withDefaultValue(0L)
    val postings = scala.collection.mutable.Map
      .empty[(String, String), scala.collection.mutable.Set[Int]]
    for (w <- words.indices; m = pairsOf(words(w)); (p, k) <- m) {
      pairCount(p) += k * cnts(w)
      postings.getOrElseUpdate(
        p, scala.collection.mutable.Set.empty[Int]) += w
    }
    // lazy-deletion heap: entries are (pair, count-at-push); an entry
    // is live iff its count still matches pairCount. Stale entries pop
    // and drop — the standard trick that keeps each merge
    // O(affected words × log heap) instead of O(all pairs).
    val ord = new java.util.Comparator[((String, String), Long)] {
      def compare(x: ((String, String), Long),
                  y: ((String, String), Long)): Int = {
        val c = java.lang.Long.compare(y._2, x._2)
        if (c != 0) c
        else {
          val ca = utf8Compare(x._1._1, y._1._1)
          if (ca != 0) ca else utf8Compare(x._1._2, y._1._2)
        }
      }
    }
    val heap = new java.util.PriorityQueue[((String, String), Long)](
      math.max(1, pairCount.size), ord)
    pairCount.foreach { case (p, c) => heap.add((p, c)) }

    def bump(p: (String, String), delta: Long, w: Int,
             present: Boolean): Unit = {
      val nc = pairCount(p) + delta
      if (nc <= 0L) { pairCount.remove(p); postings.remove(p) }
      else {
        pairCount(p) = nc
        val post = postings.getOrElseUpdate(
          p, scala.collection.mutable.Set.empty[Int])
        if (present) post += w else post -= w
        heap.add((p, nc))
      }
    }

    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      var top: ((String, String), Long) = null
      while (top == null && !heap.isEmpty) {
        val e = heap.poll()
        if (pairCount.getOrElse(e._1, 0L) == e._2) top = e
      }
      if (top == null) exhausted = true
      else {
        val ((a, b), c) = top
        merges += ((r, a, b, a + b, c))
        val affected = postings.getOrElse(a -> b, Set.empty[Int]).toArray
        for (w <- affected) {
          val before = pairsOf(words(w))
          words(w) = applyMerge(words(w), a, b)
          val after = pairsOf(words(w))
          for (p <- before.keySet ++ after.keySet) {
            val d = after(p) - before(p)
            // d == 0 means p survives in w with the same multiplicity —
            // count and posting presence both unchanged
            if (d != 0L) bump(p, d * cnts(w), w, present = after(p) > 0L)
          }
        }
        pairCount.remove(a -> b)
        postings.remove(a -> b)
      }
      r += 1
    }
    (merges.result(), words)
  }
}
