package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Text

/** Deduplication operators over `documents`: exact (hash-groupBy),
  * MinHash+LSH near-dup, SimHash fingerprints, n-gram Jaccard.
  *
  * Scale design (the part that matters at 100 TB):
  *  - exact dedup is a single hash-shuffle on a 16-byte digest, with
  *    map-side partial aggregation;
  *  - MinHash/LSH shuffles (band, bandHash) keys — each doc is
  *    replicated `numBands` times (small constant), never pairwise;
  *  - candidate pairs are generated *inside* buckets with a bucket-size
  *    cap, so a degenerate bucket (all-identical boilerplate docs)
  *    cannot go quadratic — the standard guard in web-scale dedup;
  *  - verification (exact Jaccard) touches only candidate pairs.
  */
object Dedup {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Shingle size: word bigrams give a usable Jaccard range on the
    * driver's short synthetic docs; production text would use 5-9. */
  private val ShingleK = 2
  private val NumHashes = 32
  // S-curve tuning, measured on the driver corpus: background pair
  // jaccard is <= ~0.1, true near-dups ~0.97. r=4 rows/band puts the
  // collision knee at j ~ 0.5: P(candidate | j=0.1) = 8*1e-4 (no
  // explosion), P(candidate | j=0.8) = 98.5%, j=0.97 ≈ 100%.
  private val NumBands = 8
  private val RowsPerBand = NumHashes / NumBands
  private val BucketCap = 20

  private def jaccard(inter: Column, n1: Column, n2: Column): Column =
    inter.cast("double") / (n1 + n2 - inter)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_dedup_exact" -> ((s, dir) =>
      // one-shuffle exact dedup summary on the content digest
      docs(s, dir)
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text"))).as("n_unique"),
          (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dupes"))),

    "q32_dedup_keep_first" -> ((s, dir) =>
      // representative-per-group dedup (keep lowest doc_id), the
      // groupBy form every exact-dedup pipeline reduces to
      docs(s, dir)
        .groupBy(col("lang"), col("source"))
        .agg(min(col("doc_id")).as("keeper"),
             count(lit(1)).as("group_size"),
             sum(col("n_chars")).as("total_chars"))),

    "q33_minhash_pairs" -> ((s, dir) => {
      // MinHash + LSH banding near-dup candidates, verified with exact
      // shingle-set Jaccard. No oracle (not SQL-expressible in DuckDB
      // at reasonable effort) → driver rows-only check.
      // cache: `base` feeds both the banding pass and the two
      // verification joins — without it the shingle+minhash expression
      // re-evaluates three times. At warehouse scale this projection
      // would be a persisted/bucketed intermediate table instead.
      val base = docs(s, dir)
        .select(col("doc_id"),
                graft.functions.expressions.ArrayOps
                  .wordShingles(Text.tokens(col("text")), ShingleK).as("sh"))
        .withColumn("mh", graft.functions.expressions.ArrayOps
          .minhashSig(col("sh"), NumHashes))
        .cache()
      val bands = base.select(
        col("doc_id"),
        posexplode(Text.lshBands(col("mh"), NumBands, RowsPerBand)).as(Seq("band", "bh")))
      // bucket-local pair generation, capped: degenerate buckets are
      // dropped instead of exploding quadratically
      val buckets = bands.groupBy(col("band"), col("bh"))
        .agg(collect_list(col("doc_id")).as("ids"))
        .where(size(col("ids")).between(2, BucketCap))
      val cand = buckets
        .select(explode(expr(
          """flatten(transform(ids, a ->
            |  transform(filter(ids, b -> b > a),
            |            b -> named_struct('doc1', a, 'doc2', b))))""".stripMargin)).as("p"))
        .select(col("p.doc1").as("doc1"), col("p.doc2").as("doc2"))
        .distinct()
      val sets = base.select(col("doc_id"), col("sh"), size(col("sh")).as("n"))
      cand
        .join(sets.select(col("doc_id").as("doc1"), col("sh").as("sh1"), col("n").as("n1")), "doc1")
        .join(sets.select(col("doc_id").as("doc2"), col("sh").as("sh2"), col("n").as("n2")), "doc2")
        .withColumn("inter", graft.functions.expressions.ArrayOps
          .intersectCount(col("sh1"), col("sh2")))
        .select(
          col("doc1"), col("doc2"),
          round(jaccard(col("inter"), col("n1"), col("n2")), 4).as("jaccard"))
        .where(col("jaccard") >= 0.1)
    }),

    "q34_simhash" -> ((s, dir) =>
      // 64-bit SimHash fingerprints via the native Catalyst expression
      // (one O(N) codegen'd loop per row; see SimHash64Expr).
      // No oracle → rows-only check.
      docs(s, dir)
        .select(col("doc_id"), col("source"),
                graft.functions.expressions.SimHash64Expr
                  .simhash64(Text.tokens(col("text"))).as("simhash"))),

    "q34b_simhash_pairs" -> ((s, dir) => {
      // SimHash near-dup pairs at scale: split the 64-bit fingerprint
      // into 4 x 16-bit bands — two fingerprints within hamming
      // distance 3 must agree on at least one band (pigeonhole), so a
      // band-bucket join finds all candidates with 4x replication, no
      // pairwise compare; exact hamming verifies. No oracle → rows-only.
      val fp = docs(s, dir)
        .select(col("doc_id"),
                graft.functions.expressions.SimHash64Expr
                  .simhash64(Text.tokens(col("text"))).as("simhash"))
        .cache()
      val banded = fp.select(col("doc_id"), col("simhash"),
        explode(expr(
          """transform(sequence(0, 3),
            |  b -> named_struct('band', b,
            |    'bits', (simhash >> (b * 16)) & 65535L))""".stripMargin)).as("bb"))
        .select(col("doc_id"), col("simhash"),
                col("bb.band").as("band"), col("bb.bits").as("bits"))
      val a = banded.select(col("band"), col("bits"),
        col("doc_id").as("doc1"), col("simhash").as("sh1"))
      val b = banded.select(col("band"), col("bits"),
        col("doc_id").as("doc2"), col("simhash").as("sh2"))
      a.join(b, Seq("band", "bits"))
        .where(col("doc2") > col("doc1"))
        .select(col("doc1"), col("doc2"),
                Text.hamming64(col("sh1"), col("sh2")).as("hamming"))
        .distinct()
        .where(col("hamming") <= 3)
    }),

    "q35_ngram_jaccard" -> ((s, dir) => {
      // exact token-set Jaccard over a banded self-join (same source,
      // doc_id within +5): linear pair count, oracle-checkable.
      val t = docs(s, dir)
        .select(col("doc_id"), col("source"),
                array_distinct(Text.tokens(col("text"))).as("tset"))
        .withColumn("n", size(col("tset")))
      val a = t.select(col("source"), col("doc_id").as("doc1"),
                       col("tset").as("t1"), col("n").as("n1"))
      val b = t.select(col("source"), col("doc_id").as("doc2"),
                       col("tset").as("t2"), col("n").as("n2"))
      // doc_ids are assigned round-robin across sources (stride 20), so
      // the band must span >= a few strides to produce any pairs
      a.join(b, Seq("source"))
        .where(col("doc2") > col("doc1") && col("doc2") <= col("doc1") + 100)
        .withColumn("inter", graft.functions.expressions.ArrayOps
          .intersectCount(col("t1"), col("t2")))
        .select(col("source"), col("doc1"), col("doc2"),
                round(jaccard(col("inter"), col("n1"), col("n2")), 4).as("jaccard"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q31_dedup_exact" ->
      """SELECT count(*) AS n_docs,
        |  count(DISTINCT md5(text)) AS n_unique,
        |  count(*) - count(DISTINCT md5(text)) AS n_dupes
        |FROM documents""".stripMargin,

    "q32_dedup_keep_first" ->
      """SELECT lang, source,
        |  min(doc_id) AS keeper,
        |  count(*) AS group_size,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang, source""".stripMargin,

    "q35_ngram_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    list_distinct(string_split(text, ' ')) AS tset,
        |    len(list_distinct(string_split(text, ' '))) AS n
        |  FROM documents)
        |SELECT a.source AS source, a.doc_id AS doc1, b.doc_id AS doc2,
        |  round(CAST(len(list_intersect(a.tset, b.tset)) AS DOUBLE)
        |        / (a.n + b.n - len(list_intersect(a.tset, b.tset))), 4) AS jaccard
        |FROM t a, t b
        |WHERE a.source = b.source AND b.doc_id > a.doc_id
        |  AND b.doc_id <= a.doc_id + 100""".stripMargin
  )
}
