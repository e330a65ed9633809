package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the training-data pipeline
  * extensions (builder brief; SURVEY.md §4.2 north-star row).
  *
  * Everything here composes codegen'd built-in expressions (split,
  * transform, aggregate, xxhash64, …) — no Scala UDFs — so the whole
  * pipeline stays inside WholeStageCodegen and scales linearly with
  * executor count. Higher-order functions evaluate per-row with zero
  * shuffle; only the downstream groupBy/join operators shuffle.
  */
object Text {

  /** Whitespace tokenizer (the driver corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish regex tokenizer: letter runs, digit runs, or single
    * non-space symbols — the classic pre-tokenization split. */
  def regexTokens(text: Column): Column =
    expr(s"regexp_extract_all(${text.toString}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)")

  /** Word k-shingles as strings; empty array when the doc is shorter
    * than k tokens (sequence() would otherwise run backwards). */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
      .otherwise(array())

  /** Cross-engine md5-derived hash-family members (see
    * [[graft.functions.expressions.ArrayOpsImpl]] for the family
    * definition shared with the DuckDB oracle). */
  private def mdHash(s: Column, from: Int, len: Int): Column =
    conv(substring(md5(s.cast("binary")), from, len), 16, 10).cast("long")

  /** MinHash signature over the md5-derived 2-independent family
    * g_j(s) = (a_j*x(s) + b_j) mod p (constants from ArrayOpsImpl);
    * one digest per shingle. O(|shingles| * numHashes) per row, no
    * shuffle. HOF documentation form — the native
    * [[graft.functions.expressions.ArrayOps.minhashSig]] is the
    * production path. */
  def minhash(shingleSet: Column, numHashes: Int): Column = {
    import graft.functions.expressions.ArrayOpsImpl
    val aArr = array((0 until numHashes)
      .map(j => lit(ArrayOpsImpl.mhFamilyA(j))): _*)
    val bArr = array((0 until numHashes)
      .map(j => lit(ArrayOpsImpl.mhFamilyB(j))): _*)
    val xs = transform(shingleSet, s => mdHash(s, 1, 8))
    transform(sequence(lit(0), lit(numHashes - 1)),
      j => array_min(transform(xs,
        x => (element_at(aArr, (j + 1).cast("int")) * x +
              element_at(bArr, (j + 1).cast("int"))) % lit(ArrayOpsImpl.MhP))))
  }

  /** LSH band keys: `rowsPerBand` consecutive minhash components per
    * band, joined as a string (underscore-separated) so the exact key
    * is reproducible in DuckDB's array_to_string. Two docs collide in
    * a band iff that slice is identical — P(collide) = 1-(1-j^r)^b,
    * the standard S-curve.
    *
    * r17: native single-pass kernel ([[graft.functions.expressions
    * .BandKeysExpr]]); the previous nested-HOF form (kept below as
    * the executable spec it is tested against) ran three interpreted
    * lambda passes and allocated a slice + a cast array per band per
    * row — measured as the larger share of the band-explode stage
    * every LSH-family query pays. Byte-identical output. */
  def lshBandKeys(mh: Column, numBands: Int, rowsPerBand: Int): Column =
    graft.functions.expressions.ArrayOps.bandKeys(mh, numBands, rowsPerBand)

  /** The HOF formulation of [[lshBandKeys]] — the executable spec the
    * native kernel is pinned against (ArrayOpsExprSpec). */
  def lshBandKeysSpec(mh: Column, numBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)),
      b => concat_ws("_",
        transform(slice(mh, b * rowsPerBand + 1, lit(rowsPerBand)),
          _.cast("string"))))

  /** 64-bit SimHash over a token array: per bit, sum +/-1 weighted by
    * each token's hash bit, then pack the sign bits. Vote bits come
    * from the md5 family (lo = hex chars 1-8 for bits 0-31, hi =
    * chars 9-16 for bits 32-63) — reproducible in DuckDB.
    *
    * NOTE: O(64 * |tokens|) expression evaluation — the native
    * [[graft.functions.expressions.SimHash64Expr]] is the production
    * path (single pass over tokens); this HOF form exists as the
    * executable spec the native expression is tested against. */
  def simhash64(toks: Column): Column = {
    val t = toks.toString
    expr(
      s"""aggregate(
         |  transform(sequence(0, 63), i ->
         |    CASE WHEN aggregate($t, 0L,
         |                 (acc, tok) -> acc + CASE WHEN ((
         |                     CASE WHEN i < 32
         |                       THEN CAST(conv(substring(md5(CAST(tok AS BINARY)), 1, 8), 16, 10) AS BIGINT) >> i
         |                       ELSE CAST(conv(substring(md5(CAST(tok AS BINARY)), 9, 8), 16, 10) AS BIGINT) >> (i - 32)
         |                     END) & 1L) = 1L
         |                                     THEN 1L ELSE -1L END) > 0L
         |         THEN shiftleft(1L, i) ELSE 0L END),
         |  0L, (acc, b) -> acc | b)""".stripMargin)
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Rolling-hash document fingerprint: xxhash64 of each w-token
    * window, keep the numerically smallest `keep` (winnowing-style). */
  def rollingFingerprint(toks: Column, w: Int, keep: Int): Column =
    slice(array_sort(transform(shingles(toks, w), s => xxhash64(s))), 1, keep)

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** Count of stopword tokens (multiset count, not distinct). */
  def stopwordCount(toks: Column): Column =
    size(filter(toks, t => t.isin(stopwords: _*)))

  /** Heuristic language ID from stopword evidence. The driver corpus
    * is synthetic English-ish word salad, so real n-gram profiles would
    * be noise; the *shape* (per-row scoring → argmax CASE) is what a
    * real lang-id would use with per-language stopword tables. */
  def langGuess(toks: Column): Column = {
    def has(ws: String*) = size(filter(toks, t => t.isin(ws: _*))) > 0
    when(has("the", "and", "of"), "en")
      .when(has("le", "la", "et"), "fr")
      .when(has("el", "los", "y"), "es")
      .when(has("der", "die", "und"), "de")
      .otherwise("unknown")
  }
}
