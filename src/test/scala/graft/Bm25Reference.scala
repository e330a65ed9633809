package graft

/** The single scalar BM25 reference implementation both differential
  * specs compare against (SearchSpec on the driver corpus,
  * GenerativeOpsSpec on random corpora) — one copy of the formula, so
  * a constant change cannot silently leave a stale replica validating
  * the old arithmetic. */
object Bm25Reference {
  def score(docs: Seq[(Long, String)], p: graft.operators.Search.Bm25Params)
      : Seq[(Long, Long, Long)] = {
    val toks = docs.map { case (id, t) => (id, t.split(" ", -1).toSeq) }
    val n = toks.size.toLong
    val avgdl = toks.map(_._2.size.toLong).sum.toDouble / n
    val tset = p.terms.toSet
    val tfs = toks.map { case (id, ws) =>
      (id, ws.size, ws.filter(tset).groupBy(identity)
        .map { case (w, g) => w -> g.size.toLong }) }
    val df = p.terms.map(w => w -> tfs.count(_._3.contains(w)).toLong).toMap
    tfs.flatMap { case (id, dl, tf) =>
      if (tf.isEmpty) None
      else Some((id, tf.size.toLong, tf.map { case (w, f) =>
        val idf = (n - df(w) + 0.5) / (df(w) + 0.5)
        val sat = f * 2.2 / (f + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
        math.floor(1000000.0 * idf * sat).toLong
      }.sum))
    }.sortBy { case (id, _, s) => (-s, id) }.take(p.topN)
  }
}
