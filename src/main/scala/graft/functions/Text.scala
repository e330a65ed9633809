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

  /** MinHash signature: `numHashes` independent hash family members via
    * xxhash64(shingle, seed_j); one pass over the distinct shingle set.
    * O(|shingles| * numHashes) per row, no shuffle. */
  def minhash(shingleSet: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      j => array_min(transform(shingleSet, s => xxhash64(s, j))))

  /** LSH band keys: hash `rowsPerBand` consecutive minhash components
    * per band. Two docs collide in a band iff that slice is identical —
    * P(collide) = 1-(1-j^r)^b, the standard S-curve. */
  def lshBands(mh: Column, numBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)),
      b => xxhash64(slice(mh, b * rowsPerBand + 1, lit(rowsPerBand)), b))

  /** 64-bit SimHash over a token array: per bit, sum +/-1 weighted by
    * each token's hash bit, then pack the sign bits.
    *
    * NOTE: O(64 * |tokens|) expression evaluation — correct and
    * shuffle-free but a candidate for a custom Catalyst Expression
    * with doGenCode (single pass over tokens) if it shows up hot. */
  def simhash64(toks: Column): Column = {
    val t = toks.toString
    expr(
      s"""aggregate(
         |  transform(sequence(0, 63), i ->
         |    CASE WHEN aggregate($t, 0L,
         |                 (acc, tok) -> acc + CASE WHEN ((xxhash64(tok) >> i) & 1L) = 1L
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
