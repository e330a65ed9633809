package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Text

/** Keyword retrieval over the `documents` table: BM25-scored top-k
  * search — the inverted-index workload every corpus-curation stack
  * runs for eval-set mining, targeted filtering, and "find docs about
  * X" debugging (reference analog: the engine's SELECT surface has no
  * relevance ranking; this is a superset capability, same family as
  * the ANN operators in [[Similarity]]).
  *
  * Scale design (the Spark rendering of an inverted index probe):
  *  - the corpus is scanned ONCE; tokens are filtered to the query's
  *    terms BEFORE the shuffle, so the posting stream is O(matching
  *    postings), never O(corpus tokens);
  *  - document frequencies aggregate from that same filtered stream
  *    (|terms| rows) and BROADCAST back — the corpus side never
  *    shuffles for the join;
  *  - corpus stats (N, avgdl) are one tiny aggregate, broadcast as a
  *    single row;
  *  - scoring is integer-valued: each term's BM25 contribution is
  *    floor(1e6 * idf * tf_saturation) — one fixed double expression
  *    tree evaluated identically by Spark and DuckDB (IEEE ops are
  *    deterministic; only REDUCTION order isn't, and the reduction
  *    here sums longs) — which is what lets a ranking operator carry
  *    an exact hash-match oracle;
  *  - idf is the log-free odds form (N - df + 0.5) / (df + 0.5):
  *    monotone in the classic Robertson idf, and rational arithmetic
  *    cross-engine where ln() is last-ulp hazardous.
  * At 100 TB: same plan — the posting filter pushes into the scan,
  * per-term df partial-aggregates map-side, and the final top-k
  * collapses to TakeOrderedAndProject.
  */
object Search {

  /** BM25 constants — written as source literals on BOTH engines (the
    * Spark Column tree and the generated DuckDB SQL parse the same
    * decimal strings to the same doubles; never ship a computed
    * constant like k1+1 across engines). k1=1.2, b=0.75. */
  private val K1Plus1 = "2.2"   // k1 + 1
  private val K1 = "1.2"
  private val OneMinusB = "0.25" // 1 - b
  private val B = "0.75"

  /** Query-term sets are operating points, not constants — q72/q72b
    * run two different queries through the same pipeline + generated
    * oracle (the q33b/q37b/q41b parameterization pattern). */
  final case class Bm25Params(terms: Seq[String], topN: Int = 15)
  val DefaultQuery: Bm25Params = Bm25Params(Seq("spark", "query", "join"))
  val AltQuery: Bm25Params = Bm25Params(Seq("vector", "index", "stream", "scan"))

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** The full postings list (w, doc_id, dl, tf) — what a materialized
    * inverted index stores. In-query, [[bm25]] computes only the
    * query terms' slice of it; at rest, write it `bucketBy(w)` and
    * probes read just the matching buckets (IndexAtScaleSpec). */
  def allPostings(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")))
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("w"))
      .groupBy(col("w"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))

  /** One-row corpus stats (N, total token count) — the index's
    * metadata sidecar. */
  def corpusStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(size(Text.tokens(col("text"))).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))

  /** BM25 scoring over a postings slice already filtered to the query
    * terms — shared verbatim by the scan path ([[bm25]]) and the
    * materialized-index path, so both produce the identical ranking
    * and identical integer points. */
  def scorePostings(postings: DataFrame, stats: DataFrame,
                    p: Bm25Params): DataFrame = {
    // per-term document frequency: |terms| rows, broadcast back
    val dfreq = postings.groupBy(col("w")).agg(count(lit(1)).as("df"))
    postings
      .join(broadcast(dfreq), "w")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("idf",
        (col("n_docs") - col("df") + expr("0.5d")) / (col("df") + expr("0.5d")))
      .withColumn("tfs",
        col("tf") * expr(s"${K1Plus1}d") /
          (col("tf") + expr(s"${K1}d") *
            (expr(s"${OneMinusB}d") +
              expr(s"${B}d") * (col("dl") / col("avgdl")))))
      .withColumn("pts", floor(expr("1000000.0d") * col("idf") * col("tfs")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("pts")).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(p.topN)
  }

  /** BM25 top-k: returns (doc_id, n_terms matched, integer score). */
  def bm25(s: SparkSession, dir: String, p: Bm25Params): DataFrame = {
    val base = docs(s, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")))
    // one-row corpus stats; broadcast
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    // postings: filter to query terms BEFORE the shuffle
    val postings = base
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("w"))
      .where(col("w").isin(p.terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("w"))
      .agg(count(lit(1)).as("tf"))
    scorePostings(postings, stats, p)
  }

  /** DuckDB oracle for [[bm25]], generated from the same params —
    * identical expression trees, so every double is bit-identical and
    * the floor()ed points agree exactly.
    *
    * Every numeric literal is CAST to DOUBLE: DuckDB parses a bare
    * `2.2` as DECIMAL(2,1) and evaluates `tf * 2.2` EXACTLY (for
    * tf=3: decimal 6.6, which rounds to the double 6.6), while Spark
    * computes `3 * 2.2d = 6.6000000000000005` — one ulp apart, enough
    * to flip floor() when 1e6*idf*tfs lands near an integer. The
    * casts force DuckDB onto the same double-at-every-step
    * arithmetic as Spark. */
  def bm25OracleSql(p: Bm25Params): String = {
    // Bm25Params is public API: escape quotes so a term containing '
    // renders as valid (non-injected) oracle SQL.
    val termList =
      p.terms.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    val (k1p1, k1, oneMinusB, b) =
      (s"CAST($K1Plus1 AS DOUBLE)", s"CAST($K1 AS DOUBLE)",
       s"CAST($OneMinusB AS DOUBLE)", s"CAST($B AS DOUBLE)")
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |stats AS (
       |  SELECT count(*) AS n_docs,
       |    CAST(sum(len(toks)) AS DOUBLE) / count(*) AS avgdl
       |  FROM t),
       |post AS (
       |  SELECT doc_id, dl, w, count(*) AS tf
       |  FROM (SELECT doc_id, len(toks) AS dl, unnest(toks) AS w FROM t)
       |  WHERE w IN ($termList)
       |  GROUP BY doc_id, dl, w),
       |dfreq AS (SELECT w, count(*) AS df FROM post GROUP BY w),
       |scored AS (
       |  SELECT post.doc_id,
       |    CAST(floor(CAST(1000000.0 AS DOUBLE)
       |      * ((stats.n_docs - dfreq.df + CAST(0.5 AS DOUBLE))
       |         / (dfreq.df + CAST(0.5 AS DOUBLE)))
       |      * (post.tf * $k1p1 / (post.tf + $k1
       |           * ($oneMinusB + $b * (post.dl / stats.avgdl)))))
       |      AS BIGINT) AS pts
       |  FROM post JOIN dfreq ON post.w = dfreq.w, stats)
       |SELECT doc_id, count(*) AS n_terms, CAST(sum(pts) AS BIGINT) AS score
       |FROM scored GROUP BY doc_id
       |ORDER BY score DESC, doc_id ASC LIMIT ${p.topN}""".stripMargin
  }

  /** TF-IDF keyword extraction (q82): the top-k most distinctive
    * terms per document — corpus tagging/topic-descriptor pass, the
    * per-document dual of [[bm25]]'s per-query ranking. Same integer
    * points (floor(1e6 * tf * odds_idf)); N is one row and broadcast,
    * but df is VOCABULARY-sized — corpus-proportional (10⁸-10⁹ terms
    * at 100 TB), so its join is deliberately un-hinted: `tf` is
    * already keyed by `w`, AQE broadcasts when the vocabulary is
    * small and shuffles on `w` (one exchange) when it isn't — the
    * q79/q80 discipline. The per-doc top-k is a window over (doc_id)
    * — partition-parallel across docs. */
  def tfidfKeywords(s: SparkSession, dir: String, k: Int): DataFrame = {
    // (A scan-parallelism repartition pin was A/B'd here and REVERTED:
    // the explode/agg stages are allocation-bound, and spreading them
    // across all 32 local cores raised GC pressure enough to WORSEN
    // the idle wall 0.81 → 1.05 s. The one-task scan stays under the
    // 0.5 s heavy-stage bar; at warehouse file counts the scan
    // parallelizes by layout anyway.)
    val base = docs(s, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
    val nDocs = base.agg(count(lit(1)).as("n_docs"))
    val tf = base.select(col("doc_id"), explode(col("toks")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    // tf is the per-(doc, term) INSTANCE table — ban it from being a
    // broadcast build (see GraftBridge.neverBroadcast: Generate's
    // static estimate is the compressed scan's bytes, and at 10x the
    // planner built a driver HashedRelation of it); dfreq stays
    // AQE-broadcastable when the vocab truly fits
    val scored = org.apache.spark.sql.GraftBridge.neverBroadcast(tf)
      .join(dfreq, "w")
      .crossJoin(broadcast(nDocs))
      .withColumn("pts", floor(expr("1000000.0d") * col("tf") *
        ((col("n_docs") - col("df") + expr("0.5d")) /
          (col("df") + expr("0.5d")))))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("pts").desc, col("w").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("w").as("keyword"), col("pts"))
  }

  /** DuckDB oracle for [[tfidfKeywords]] — every literal CAST to
    * DOUBLE (the bm25 DECIMAL-drift lesson). */
  def tfidfOracleSql(k: Int): String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |nd AS (SELECT count(*) AS n_docs FROM t),
       |tf AS (
       |  SELECT doc_id, w, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(toks) AS w FROM t)
       |  GROUP BY doc_id, w),
       |dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
       |scored AS (
       |  SELECT tf.doc_id, tf.w,
       |    CAST(floor(CAST(1000000.0 AS DOUBLE) * tf.tf
       |      * ((nd.n_docs - dfreq.df + CAST(0.5 AS DOUBLE))
       |         / (dfreq.df + CAST(0.5 AS DOUBLE)))) AS BIGINT) AS pts
       |  FROM tf JOIN dfreq ON tf.w = dfreq.w, nd),
       |ranked AS (
       |  SELECT doc_id, w, pts,
       |    row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY pts DESC, w ASC) AS rank
       |  FROM scored)
       |SELECT doc_id, CAST(rank AS INTEGER) AS rank, w AS keyword, pts
       |FROM ranked WHERE rank <= $k""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q72_bm25_search" -> ((s, dir) => bm25(s, dir, DefaultQuery)),
    "q72b_bm25_alt" -> ((s, dir) => bm25(s, dir, AltQuery)),
    "q82_tfidf_keywords" -> ((s, dir) => tfidfKeywords(s, dir, 3))
  )

  val oracleSql: Map[String, String] = Map(
    "q72_bm25_search" -> bm25OracleSql(DefaultQuery),
    "q72b_bm25_alt" -> bm25OracleSql(AltQuery),
    "q82_tfidf_keywords" -> tfidfOracleSql(3)
  )
}
