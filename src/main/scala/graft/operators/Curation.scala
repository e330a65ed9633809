package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Text

/** Dataset-curation operators — the end of the training-data pipeline
  * where documents become splits: deterministic train/val/test
  * assignment, benchmark decontamination, and the composed
  * filter → dedup → split pipeline.
  *
  * Scale design:
  *  - split assignment is CONTENT-addressed (md5 of the text, not of
  *    an id or row position) so it is stable under re-sharding,
  *    re-ingestion, and dedup order — the property a reproducible
  *    100 TB dataset build actually needs; per-row codegen, zero
  *    shuffle until the final count;
  *  - decontamination broadcasts the benchmark's (small) shingle set
  *    and aggregates matches per training doc — shuffle is O(matching
  *    shingle pairs), never all-pairs, and the benchmark side never
  *    replicates the corpus;
  *  - the composed pipeline keeps every stage lazy in one plan, so
  *    Catalyst pushes the cheap gates (length) below the expensive
  *    ones (dedup shuffle) and the corpus is read once.
  */
object Curation {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Per-source cumulative token sum in content-hash order — the
    * shared spine of q63/q105 (budget cuts), q66/q66b (sequence
    * packing) — computed DISTRIBUTED above a size gate.
    *
    * The plain form is a running-sum window over (source): exact, but
    * each source's WHOLE stream sorts through one partition task —
    * parallelism collapses to n_sources, the same shape the 100x
    * fullsuite caught in q71's per-language ntile. Above the gate
    * (spark.graft.spread.threshold rows, default 250k) the same
    * cumulative sum is computed at sources x 256 parallelism: the
    * order key is ALREADY a uniform md5 hex string, so its first two
    * chars are 256 order-preserving range buckets for free (a hash
    * prefix is an order prefix; equal hashes share a bucket, doc_id
    * ties stay inside it) — per-(source,bucket) token sums prefix-sum
    * into offsets driver-side (sources x 256 rows, the globalOrderBy
    * metadata contract), and cum = bucket offset + the within-bucket
    * running sum. Byte-identical to the window by construction;
    * CumSumSpreadSpec pins window==spread through all four queries.
    *
    * Returns (source, doc_id, tk, h, cum); one plan-keyed cache entry
    * (cacheOnce) is shared by the sums pass, the gate count, and the
    * final read — and across the four queries, which build the same
    * base plan. */
  private[graft] def perSourceCumSum(s: SparkSession, docsDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = graft.operators.cacheOnce(
      docsDf
        .withColumn("tk", size(Text.tokens(col("text"))))
        .withColumn("h", md5(col("text").cast("binary")))
        .select(col("source"), col("doc_id"), col("tk"), col("h")))
    val spreadThreshold = s.conf
      .getOption("spark.graft.spread.threshold")
      .map(_.toLong).getOrElse(250000L)
    if (base.count() < spreadThreshold) {
      val w = Window.partitionBy(col("source"))
        .orderBy(col("h"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      return base.withColumn("cum", sum(col("tk")).over(w))
    }
    val bucketed = base.withColumn("bkt", substring(col("h"), 1, 2))
    val sums = bucketed.groupBy(col("source"), col("bkt"))
      .agg(sum(col("tk")).as("btk"))
      .collect() // sources x <=256 rows by construction
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    var curSrc: String = null
    var acc = 0L
    val offsetRows = sums.map { case (src, bkt, btk) =>
      if (src != curSrc) { curSrc = src; acc = 0L }
      val off = acc; acc += btk
      (src, bkt, off)
    }.toSeq
    import s.implicits._
    val offsets = offsetRows.toDF("source", "bkt", "off")
    val wb = Window.partitionBy(col("source"), col("bkt"))
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(offsets), Seq("source", "bkt"))
      .withColumn("cum", col("off") + sum(col("tk")).over(wb))
      .drop("bkt", "off")
  }

  /** Content-addressed split bucket in [0,100): md5 hex chars 1-8 of
    * the text, mod 100 (cross-engine md5 family — see ArrayOpsImpl). */
  private[operators] def splitBucket: Column =
    conv(substring(md5(col("text").cast("binary")), 1, 8), 16, 10)
      .cast("long") % 100

  private[operators] def splitName(bucket: Column): Column =
    when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")

  /** Per-language sampling rates (percent of the content-hash space)
    * for q62 — upsample English, downsample zh; any unlisted language
    * falls to the default. Literal here and interpolated into the
    * oracle, so both engines sample identically. */
  private val StratumRates: Seq[(String, Int)] =
    Seq("en" -> 90, "de" -> 50, "es" -> 50, "fr" -> 50, "zh" -> 25)
  private val DefaultRatePct = 10

  /** Per-source token budget for q63's mixture cut. */
  private val TokenBudgetPerSource = 600

  /** q105's corpus-wide token target. Small enough that every source
    * is OVERSUBSCRIBED at sf0.01+ (the regime where temperature
    * weights actually decide anything); the op degrades gracefully to
    * keep-everything for sources whose weighted share exceeds their
    * size. */
  private val MixTargetTokens = 20000L

  /** Fixed-point scale for the temperature weights (the repo-wide
    * integer trick): floor(sqrt(n) * 2^20) is bit-identical across
    * engines because IEEE sqrt is correctly rounded and the 2^20
    * scale is exact, so the weight SUM is an order-independent
    * integer — the one property a double sum lacks. */
  private val MixWeightScale = 1L << 20

  /** Training-sequence length (tokens) for q66's packing stats. */
  private val SeqLen = 512

  /** Segment width (tokens) and document-frequency threshold for
    * q67's boilerplate removal — segments whose exact text appears in
    * >= this many distinct docs are boilerplate. */
  private val SegTokens = 3
  private val BoilerplateDf = 2

  /** q86 retrieval-chunking geometry: fixed-width token chunks with a
    * small overlap carried from the previous chunk (stride = width -
    * overlap). Literals interpolated into the oracle. */
  private val ChunkTokens = 32
  private val ChunkOverlap = 8
  private val ChunkStride = ChunkTokens - ChunkOverlap

  /** BPE merge rounds for q89 — the tokenizer-training operator. */
  private[graft] val BpeRounds = 64

  /** Max merges applied per Spark round (`spark.graft.bpe.batch`
    * overrides). A real 30k-merge tokenizer at batch 1 is 30k serial
    * driver round-trips; batching keeps driver rounds ≈ merges / B
    * while [[selectBatch]] guarantees bit-identical output to
    * sequential greedy. */
  private val BpeBatchDefault = 16

  /** The BPE word table: each distinct corpus token with its
    * frequency, symbols initialized to characters, rendered as ONE
    * string with a fixed separator invariant — single space at each
    * end, double space between symbols (` h  i `). The invariant is
    * what makes merge application a plain `replace(w, ' a  b ',
    * ' ab ')`: the anchoring spaces cannot match inside a symbol, and
    * left-to-right non-overlapping replacement (the same semantics in
    * Spark and DuckDB) is exactly BPE's greedy scan. Word-frequency
    * space is where real BPE trainers run (corpus-sized work is ONE
    * groupBy; every merge round then touches only the vocab table). */
  private def bpeWords(docsDf: DataFrame): DataFrame =
    docsDf.select(explode(Text.tokens(col("text"))).as("tok"))
      .where(length(col("tok")) >= 1)
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .select(concat(lit(" "),
        concat_ws("  ", split(col("tok"), "")), lit(" ")).as("w"),
        col("cnt"))

  /** GPT-2-STYLE pre-tokenization for the byte-level trainer (q89d):
    * letter runs, digit runs, punctuation runs — each optionally
    * carrying ONE leading space — plus whitespace runs. Two deliberate
    * deviations from GPT-2's exact pattern, both so the SAME regex
    * replays in the DuckDB oracle (RE2): no English-contraction
    * alternatives ('s|'t|… — an English-specific tokenizer choice),
    * and no `\s+(?!\S)` lookahead (RE2 has none; the plain `\s+`
    * fallback differs only on multi-space runs preceding a token,
    * which the fixture corpus — single-space separated — never has). */
  private[graft] val BytePreTokenRe =
    " ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** The byte-level word table (q89d): pre-tokens from
    * [[BytePreTokenRe]], symbols initialized to the 256 GPT-2-mapped
    * UTF-8 BYTE symbols ([[graft.functions.expressions.ByteSymbolsExpr]])
    * instead of characters. The byte remap guarantees no symbol is or
    * contains a space, so the separator invariant — and with it the
    * ENTIRE two-mode trainer, batching theorem included — carries
    * over unchanged; the alphabet is total over bytes, which is the
    * no-UNK property (pinned in BpeByteSpec). */
  private def bpeByteWords(docsDf: DataFrame): DataFrame =
    docsDf.select(explode(
        regexp_extract_all(col("text"), lit(BytePreTokenRe), lit(0)))
        .as("ptok"))
      .where(length(col("ptok")) >= 1)
      .groupBy(col("ptok")).agg(count(lit(1)).as("cnt"))
      .select(concat(lit(" "),
        concat_ws("  ", graft.functions.expressions.ArrayOps
          .byteSymbols(col("ptok"))), lit(" ")).as("w"),
        col("cnt"))

  /** Adjacent symbol pairs of the current word table, counted by word
    * frequency (overlapping pairs count, the BPE convention). */
  private def bpePairs(words: DataFrame): DataFrame =
    words
      .select(col("cnt"), split(trim(col("w")), "  ").as("syms"))
      .select(col("cnt"), explode(arrays_zip(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
      .select(col("p").getField("0").as("a"), col("p").getField("1").as("b"),
              col("cnt"))
      .groupBy(col("a"), col("b")).agg(sum(col("cnt")).as("c"))

  /** BPE tokenizer training (q89): `rounds` greedy merges over the
    * corpus word-frequency table. Each SPARK round: count adjacent
    * symbol pairs (vocab-sized shuffle), collect the top candidates,
    * select a batch of up to B merges that [[selectBatch]] proves
    * identical to B steps of sequential greedy, and apply them as
    * chained separator-invariant `replace`s. Driver rounds are
    * therefore ≈ merges / B — a 30k-merge tokenizer is ~2k Spark jobs,
    * not 30k — while the merge list stays bit-identical to one-at-a-
    * time greedy (the sequential DuckDB oracle replays it unchanged).
    * The merge list IS the trained model — the Lloyd-codebook contract
    * (bounded driver state, corpus-sized work only in the initial
    * groupBy). Integer counts and binary string order make every round
    * deterministic. Returns (round, a, b, merged, c) per executed
    * merge; stops early when no pair remains. */
  /** Trained-model memo, keyed like the ANN codebooks: the merge list
    * and final word table are deterministic per (corpus, rounds), so
    * train once per JVM ("the memo IS the model store") — and the
    * cached word table is created once instead of per call. */
  private val bpeMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, String, Int, String),
    (Seq[(Int, String, String, String, Long)], DataFrame, DataFrame)]()

  private[graft] def bpeMerges(s: SparkSession, dir: String,
                               rounds: Int = BpeRounds,
                               byteLevel: Boolean = false)
      : (Seq[(Int, String, String, String, Long)], DataFrame) = {
    // sessionUUID, not identityHashCode: identity hashes can collide
    // across two live sessions, serving one a DataFrame bound to the
    // other (round-7 ADVICE).
    val (m, fin, _) = bpeMemo.computeIfAbsent(
      (org.apache.spark.sql.GraftBridge.sessionUUID(s), dir, rounds,
        if (byteLevel) "byte" else "char"),
      _ => bpeTrain(s, dir, rounds, byteLevel))
    (m, fin)
  }

  /** Bench hook (the q61 contract): drop trained models, unpersist the
    * cached BASE word table, and release any mid-train checkpoint
    * blocks the final word table sits on, so a sequential pass times
    * real training. */
  def clearBpeMemo(): Unit = {
    bpeMemo.values.forEach { case (_, fin, base) =>
      base.unpersist()
      try withRddLogSilenced {
        org.apache.spark.sql.GraftBridge.plan(fin).foreach {
          case l: org.apache.spark.sql.execution.LogicalRDD =>
            l.rdd.unpersist(blocking = false)
          case _ => ()
        }
      } catch { case _: Throwable => () }
    }
    bpeMemo.clear()
  }

  /** Driver rounds (Spark jobs) of the last [[bpeTrain]] — the
    * ScaleLab probe for "driver rounds ≈ merges / batch". */
  private[graft] val lastTrainJobs =
    new java.util.concurrent.atomic.AtomicInteger(0)

  /** Batched greedy selection: from `top` — candidate pairs in the
    * greedy total order (count DESC, a ASC, b ASC) — return the
    * longest PREFIX whose batched application is provably identical to
    * running sequential greedy BPE once per pair.
    *
    * Why a prefix, and why these stop rules. Merging (a, b) → "ab"
    * can only (1) remove adjacencies that involve a or b, and
    * (2) create adjacencies that involve the new symbol "ab" — an
    * adjacency between two OLD symbols is never created. So for any
    * pair that shares no symbol with the merges applied so far, its
    * count is untouched, and sequential greedy's next argmax is the
    * next such pair — PROVIDED nothing new can beat it:
    *
    *  - prefix property: every pair ranked above it is in the batch
    *    (already merged), so no skipped old pair outranks it — old
    *    pairs below it only lose count, which cannot flip the
    *    (c DESC, a, b) order upward;
    *  - new pairs: count(x, ab) ≤ old count(x, a) (every x-ab
    *    adjacency was an x-a adjacency), and (x, a) conflicts with
    *    the batch, so it is NOT in the prefix and is ranked at or
    *    below F, the first excluded pair ⇒ new counts ≤ c(F). Any
    *    selected pair TIED with c(F) could still lose the
    *    lexicographic tiebreak to such a new pair, so the tied tail
    *    is dropped (p1 alone is literally sequential greedy and
    *    always safe);
    *  - self-pair (a, a): its merge creates (a, aa)/(aa, a) whose
    *    counts are bounded by c(a, a) itself — NOT by c(F) — so a
    *    self-pair is only safe as the LAST element of a batch;
    *  - string collision: a later pair whose symbol EQUALS an earlier
    *    pair's merged output ("ab") would merge adjacencies that did
    *    not exist at count time; stop there too.
    *
    * `exhaustive` = `top` is the complete pair list (the collect's
    * LIMIT was not reached), in which case a batch that consumes the
    * whole list has no F and needs no tie truncation. */
  private[graft] def selectBatch(
      top: IndexedSeq[(String, String, Long)], maxB: Int,
      exhaustive: Boolean): IndexedSeq[(String, String, Long)] = {
    val used = scala.collection.mutable.Set.empty[String]
    val outs = scala.collection.mutable.Set.empty[String]
    val sel = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var i = 0
    var open = true
    while (open && i < top.length && sel.length < maxB) {
      val (a, b, _) = top(i)
      if (used(a) || used(b) || outs(a) || outs(b)) open = false
      else {
        sel += top(i); used += a; used += b; outs += (a + b)
        i += 1
        if (a == b) open = false
      }
    }
    require(i < top.length || exhaustive,
      "selectBatch: candidate list truncated before F was found — " +
        "collect limit must exceed maxB")
    if (i < top.length) {
      val cF = top(i)._3
      while (sel.length > 1 && sel.last._3 == cF) sel.dropRightInPlace(1)
    }
    sel.toIndexedSeq
  }

  /** Mode dispatch — the two-mode trainer architecture:
    *
    *  - `local` (the real-tokenizer shape): ONE Spark job builds the
    *    word-frequency table; the merge loop runs in driver memory
    *    with exact incremental pair updates ([[BpeTrainer]]). A 100 TB
    *    corpus's word table is vocab-sized (~10^8 rows, a few GB) —
    *    collecting it is what HuggingFace/SentencePiece trainers do,
    *    and it makes a 30k-merge vocabulary seconds of driver CPU.
    *  - `distributed`: batched Spark rounds ([[selectBatch]]'s exact
    *    prefix batching) for word tables too large to collect.
    *  - `auto` (default): local iff the word table has at most
    *    `spark.graft.bpe.localMaxWords` (default 2M) rows.
    *
    * All three produce bit-identical merge lists (pinned by
    * BpeBatchSpec + CurationSpec); the choice is purely a scale
    * switch. */
  private def bpeTrain(s: SparkSession, dir: String, rounds: Int,
                       byteLevel: Boolean = false)
      : (Seq[(Int, String, String, String, Long)], DataFrame, DataFrame) = {
    val mode = s.conf.getOption("spark.graft.bpe.mode").getOrElse("auto")
    val base = cacheOnce(if (byteLevel) bpeByteWords(docs(s, dir))
                else bpeWords(docs(s, dir)))
    val local = mode match {
      case "local" => true
      case "distributed" => false
      case _ =>
        val maxLocal = s.conf.getOption("spark.graft.bpe.localMaxWords")
          .getOrElse("2000000").toLong
        base.count() <= maxLocal
    }
    if (local) bpeTrainLocal(s, rounds, base)
    else bpeTrainDistributed(s, rounds, base)
  }

  private def bpeTrainLocal(s: SparkSession, rounds: Int, base: DataFrame)
      : (Seq[(Int, String, String, String, Long)], DataFrame, DataFrame) = {
    val table = base.collect().map { r =>
      (r.getString(0).trim.split("  "), r.getLong(1))
    }
    val (merges, finalWords) = BpeTrainer.train(table, rounds)
    import s.implicits._
    val fin = finalWords.zip(table.map(_._2)).toSeq
      .map { case (syms, c) => (syms.mkString(" ", "  ", " "), c) }
      .toDF("w", "cnt")
    lastTrainJobs.set(1)
    (merges, fin, base)
  }

  private def bpeTrainDistributed(s: SparkSession, rounds: Int,
                                  base: DataFrame)
      : (Seq[(Int, String, String, String, Long)], DataFrame, DataFrame) = {
    val batchMax = math.max(1, s.conf.getOption("spark.graft.bpe.batch")
      .getOrElse(BpeBatchDefault.toString).toInt)
    val reliable =
      s.conf.getOption("spark.graft.bpe.reliableCheckpoint").contains("true")
    if (reliable)
      require(s.sparkContext.getCheckpointDir.isDefined,
        "reliableCheckpoint needs spark.sparkContext.setCheckpointDir(...)")
    var words = base
    val merges = scala.collection.mutable.ListBuffer
      .empty[(Int, String, String, String, Long)]
    var exhausted = false
    var jobs = 0
    // lineage truncation: each merge chains a `replace` withColumn, so
    // a long training run otherwise re-analyzes an ever-deeper plan
    // per round (the q61 lesson). Truncate every ~32 applied merges;
    // reliable=true swaps localCheckpoint for an HDFS checkpoint on
    // long cluster runs (lost-executor recomputation, as in
    // Dedup.connectedComponents).
    var sinceTruncate = 0
    while (merges.size < rounds && !exhausted) {
      val m = math.min(batchMax, rounds - merges.size)
      val limit = 4 * m + 1
      val top = bpePairs(words)
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(limit).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toIndexedSeq
      jobs += 1
      if (top.isEmpty) exhausted = true
      else {
        val sel = selectBatch(top, m, exhaustive = top.length < limit)
        for ((a, b, c) <- sel) {
          merges += ((merges.size, a, b, a + b, c))
          words = words.withColumn("w", call_function("replace", col("w"),
            lit(s" $a  $b "), lit(s" $a$b ")))
        }
        sinceTruncate += sel.length
        if (sinceTruncate >= 32 && merges.size < rounds) {
          words = if (reliable) words.checkpoint(true)
                  else words.localCheckpoint(true)
          sinceTruncate = 0
        }
      }
    }
    lastTrainJobs.set(jobs)
    (merges.toSeq, words, base)
  }

  /** q89: the learned merge table. */
  def bpeMergeTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    bpeMerges(s, dir)._1
      .toDF("round", "a", "b", "merged", "c")
  }

  /** q89b: the learned vocabulary — every symbol surviving the merge
    * rounds, weighted by corpus token frequency. */
  def bpeVocab(s: SparkSession, dir: String): DataFrame =
    bpeMerges(s, dir)._2
      .select(explode(split(trim(col("w")), "  ")).as("sym"), col("cnt"))
      .groupBy(col("sym")).agg(sum(col("cnt")).as("n"))

  /** q89c: ENCODE the corpus with the trained tokenizer — the apply
    * step that closes the train→use loop (a tokenizer exists to be
    * applied). Word-level encoding is exact and cheap: the trained
    * word table already holds each distinct token's post-merge symbol
    * segmentation, so encoding a document is a join from its tokens
    * to that (vocab-sized, AQE-broadcastable) table plus a per-doc
    * sum — the corpus is scanned once and never re-segmented. Emits
    * (doc_id, n_ws_tokens, n_bpe_tokens): whitespace vs trained-BPE
    * token counts, the trained-tokenizer fertility q77 approximates
    * with a fixed regex. */
  def bpeEncodeCounts(s: SparkSession, dir: String): DataFrame = {
    val fin = bpeMerges(s, dir)._2
    val tokSyms = fin.select(
      call_function("replace", col("w"), lit(" "), lit("")).as("tok"),
      size(split(trim(col("w")), "  ")).as("n_sym"))
    docs(s, dir)
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
      .where(length(col("tok")) >= 1)
      .join(tokSyms, "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ws_tokens"),
           sum(col("n_sym")).cast("long").as("n_bpe_tokens"))
  }

  /** q89d: byte-level BPE merge table — the GPT-2/LLaMA-family
    * tokenizer shape (byte alphabet, no UNK) on the unchanged
    * two-mode trainer. */
  def bpeByteMergeTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    bpeMerges(s, dir, byteLevel = true)._1
      .toDF("round", "a", "b", "merged", "c")
  }

  /** q89e: ENCODE the corpus with the byte-level tokenizer. The join
    * key is the pre-token's MAPPED byte-symbol rendering (not the raw
    * pre-token): the trained word table stores words as mapped
    * symbols, so re-mapping each document pre-token reproduces the
    * exact key — and because the byte alphabet is total, every
    * pre-token finds its row (the no-UNK join: an inner join loses
    * nothing, which BpeByteSpec pins). */
  def bpeByteEncodeCounts(s: SparkSession, dir: String): DataFrame = {
    val fin = bpeMerges(s, dir, byteLevel = true)._2
    val tokSyms = fin.select(
      call_function("replace", col("w"), lit(" "), lit("")).as("mapped"),
      size(split(trim(col("w")), "  ")).as("n_sym"))
    docs(s, dir)
      .select(col("doc_id"), explode(
        regexp_extract_all(col("text"), lit(BytePreTokenRe), lit(0)))
        .as("ptok"))
      .where(length(col("ptok")) >= 1)
      .withColumn("mapped", concat_ws("",
        graft.functions.expressions.ArrayOps.byteSymbols(col("ptok"))))
      .join(tokSyms, "mapped")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pretokens"),
           sum(col("n_sym")).cast("long").as("n_bpe_tokens"))
  }

  /** DuckDB oracle CTE stack replaying [[bpeMerges]]: w0 = the word
    * table with the same separator invariant, then per round the pair
    * count / argmax / guarded replace. Empty-argmax rounds no-op in
    * both engines (scalar subqueries go NULL -> CASE keeps w). */
  /** w0 body for the byte-level oracle. Byte extraction is spelled as
    * `unicode(ptok[i])` — codepoint, not byte — which is CORRECT only
    * while the corpus is single-byte (ASCII): DuckDB's RE2 has no
    * byte-string split, and the driver fixture is ASCII by
    * construction. True byte behavior on multi-byte/invalid input is
    * pinned by BpeByteSpec against a from-scratch Scala reference,
    * not by this oracle. The CASE is the generating formula of
    * [[graft.functions.expressions.ByteSymbolsImpl.symbolTable]]
    * (GPT-2 bytes_to_unicode): passthrough for printable non-space
    * bytes, 256+rank for the 68 excluded ones (0-32 → rank b,
    * 127-160 → 33+b-127, 173 → 67).  */
  private def byteW0: String = {
    val mapChar =
      """CASE WHEN (unicode(ptok[i]) BETWEEN 33 AND 126)
        |       OR (unicode(ptok[i]) BETWEEN 161 AND 172)
        |       OR (unicode(ptok[i]) BETWEEN 174 AND 255) THEN ptok[i]
        |     WHEN unicode(ptok[i]) <= 32 THEN chr(256 + unicode(ptok[i]))
        |     WHEN unicode(ptok[i]) BETWEEN 127 AND 160
        |       THEN chr(289 + unicode(ptok[i]) - 127)
        |     ELSE chr(323) END""".stripMargin
    s"""w0 AS MATERIALIZED (
       |  SELECT ' ' || array_to_string(
       |      list_transform(generate_series(1, length(ptok)),
       |                     i -> $mapChar),
       |      '  ') || ' ' AS w,
       |    count(*) AS cnt
       |  FROM (SELECT unnest(regexp_extract_all(text, '$BytePreTokenRe'))
       |        AS ptok FROM documents)
       |  WHERE length(ptok) >= 1
       |  GROUP BY ptok)""".stripMargin
  }

  private def charW0: String =
    s"""w0 AS MATERIALIZED (
       |  SELECT ' ' || array_to_string(
       |      list_transform(generate_series(1, length(tok)), i -> tok[i]),
       |      '  ') || ' ' AS w,
       |    count(*) AS cnt
       |  FROM (SELECT unnest(string_split(text, ' ')) AS tok
       |        FROM documents)
       |  WHERE length(tok) >= 1
       |  GROUP BY tok)""".stripMargin

  private def bpeCtes(rounds: Int): String = bpeCtes(rounds, charW0)

  private def bpeCtes(rounds: Int, w0: String): String = {
    // every CTE is MATERIALIZED: DuckDB inlines plain CTEs at each
    // reference, and 8 chained rounds otherwise re-expand the whole
    // prefix per reference — exponential plan growth ("too many open
    // files" on the documents scan). The merge apply joins ONE guarded
    // best-row (LEFT JOIN ON TRUE) instead of scalar subqueries so
    // each round references its predecessor exactly twice.
    val roundCtes = (0 until rounds).map { r =>
      s"""p$r AS MATERIALIZED (
         |  SELECT s.syms[g.i] AS a, s.syms[g.i + 1] AS b,
         |    CAST(sum(s.cnt) AS BIGINT) AS c
         |  FROM (SELECT cnt, string_split(trim(w), '  ') AS syms
         |        FROM w$r) s,
         |       LATERAL (SELECT unnest(generate_series(1, len(s.syms) - 1))
         |                AS i) g
         |  GROUP BY a, b),
         |b$r AS MATERIALIZED (
         |  SELECT a, b, c FROM p$r ORDER BY c DESC, a, b LIMIT 1),
         |w${r + 1} AS MATERIALIZED (
         |  SELECT CASE WHEN g.a IS NOT NULL
         |    THEN replace(w.w, ' ' || g.a || '  ' || g.b || ' ',
         |                 ' ' || g.a || g.b || ' ')
         |    ELSE w.w END AS w, w.cnt AS cnt
         |  FROM w$r w LEFT JOIN b$r g ON TRUE)""".stripMargin
    }.mkString(",\n")
    s"""$w0,
       |$roundCtes""".stripMargin
  }

  def bpeMergesOracleSql(rounds: Int = BpeRounds): String = {
    val union = (0 until rounds).map(r =>
      s"SELECT $r AS round, a, b, a || b AS merged, c FROM b$r")
      .mkString("\nUNION ALL ")
    s"""WITH ${bpeCtes(rounds)}
       |$union""".stripMargin
  }

  def bpeByteMergesOracleSql(rounds: Int = BpeRounds): String = {
    val union = (0 until rounds).map(r =>
      s"SELECT $r AS round, a, b, a || b AS merged, c FROM b$r")
      .mkString("\nUNION ALL ")
    s"""WITH ${bpeCtes(rounds, byteW0)}
       |$union""".stripMargin
  }

  def bpeByteEncodeOracleSql(rounds: Int = BpeRounds): String = {
    val mapped =
      """CASE WHEN (unicode(ptok[i]) BETWEEN 33 AND 126)
        |       OR (unicode(ptok[i]) BETWEEN 161 AND 172)
        |       OR (unicode(ptok[i]) BETWEEN 174 AND 255) THEN ptok[i]
        |     WHEN unicode(ptok[i]) <= 32 THEN chr(256 + unicode(ptok[i]))
        |     WHEN unicode(ptok[i]) BETWEEN 127 AND 160
        |       THEN chr(289 + unicode(ptok[i]) - 127)
        |     ELSE chr(323) END""".stripMargin
    s"""WITH ${bpeCtes(rounds, byteW0)},
       |enc AS (
       |  SELECT replace(w, ' ', '') AS mapped,
       |         len(string_split(trim(w), '  ')) AS n_sym
       |  FROM w$rounds)
       |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_pretokens,
       |  CAST(sum(e.n_sym) AS BIGINT) AS n_bpe_tokens
       |FROM (SELECT doc_id,
       |        array_to_string(list_transform(
       |          generate_series(1, length(ptok)), i -> $mapped), '') AS mapped
       |      FROM (SELECT doc_id,
       |              unnest(regexp_extract_all(text, '$BytePreTokenRe')) AS ptok
       |            FROM documents)
       |      WHERE length(ptok) >= 1) d
       |JOIN enc e ON e.mapped = d.mapped
       |GROUP BY d.doc_id""".stripMargin
  }

  def bpeVocabOracleSql(rounds: Int = BpeRounds): String =
    s"""WITH ${bpeCtes(rounds)}
       |SELECT sym, CAST(sum(cnt) AS BIGINT) AS n FROM (
       |  SELECT unnest(string_split(trim(w), '  ')) AS sym, cnt
       |  FROM w$rounds)
       |GROUP BY sym""".stripMargin

  def bpeEncodeOracleSql(rounds: Int = BpeRounds): String =
    s"""WITH ${bpeCtes(rounds)},
       |enc AS (
       |  SELECT replace(w, ' ', '') AS tok,
       |         len(string_split(trim(w), '  ')) AS n_sym
       |  FROM w$rounds)
       |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_ws_tokens,
       |  CAST(sum(e.n_sym) AS BIGINT) AS n_bpe_tokens
       |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |      FROM documents) d
       |JOIN enc e ON e.tok = d.tok
       |WHERE length(d.tok) >= 1
       |GROUP BY d.doc_id""".stripMargin

  /** Shared quality gate (q28's keep rule) — also the streaming
    * gate ([[graft.streaming.DocStream.curateStream]]), so online and
    * offline curation can never drift apart on thresholds. */
  def qualityKeep: Column = {
    val toks = Text.tokens(col("text"))
    val stopRatio = Text.stopwordCount(toks).cast("double") / size(toks)
    size(toks).between(20, 2000) && stopRatio.between(0.01, 0.6)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    queriesHead ++ queriesCont

  private def queriesHead: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_hash_split" -> ((s, dir) =>
      // deterministic train/val/test assignment: 80/10/10 by content
      // hash; per-split doc and token counts
      docs(s, dir)
        .withColumn("split", splitName(splitBucket))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
             sum(size(Text.tokens(col("text")))).as("n_tokens"),
             sum(col("n_chars")).as("n_chars"))),

    // benchmark decontamination: training docs sharing >= 3 distinct
    // word 3-grams with the benchmark set (doc_id < 10 stands in for
    // the eval benchmark) are flagged. The benchmark shingle set is
    // benchmark-sized -> broadcast shape (see [[decontam]] for the
    // shuffle/bloom shapes as the eval set grows).
    "q55_decontam" -> ((s, dir) => decontam(s, dir, 10L, "broadcast")),

    "q89_bpe_merges" -> ((s, dir) => bpeMergeTable(s, dir)),
    "q89b_bpe_vocab" -> ((s, dir) => bpeVocab(s, dir)),
    "q89c_bpe_encode" -> ((s, dir) => bpeEncodeCounts(s, dir)),
    "q89d_bpe_byte_merges" -> ((s, dir) => bpeByteMergeTable(s, dir)),
    "q89e_bpe_byte_encode" -> ((s, dir) => bpeByteEncodeCounts(s, dir)),

    "q57_vocab_topk" -> ((s, dir) =>
      // corpus vocabulary heavy hitters: document frequency of each
      // token, top 20. Partial aggregation bounds the shuffle at
      // O(vocab); the top-k collapses to TakeOrderedAndProject — at
      // 100 TB this is the plan you want for vocab/hot-key stats.
      docs(s, dir)
        .select(col("doc_id"),
                explode(array_distinct(Text.tokens(col("text")))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("doc_freq"))
        .orderBy(col("doc_freq").desc, col("token").asc)
        .limit(20)),

    "q57b_heavy_hitters" -> ((s, dir) => {
      // exact heavy hitters (freq > n/256) WITHOUT a vocab-sized
      // shuffle: pass 1 folds each partition into a 255-counter
      // Misra-Gries summary (the custom Catalyst aggregate) whose
      // merge provably retains every token above the threshold — at
      // 100 TB the billions-strong token vocabulary never shuffles and
      // the driver sees <= 255 strings + one count, partition-count
      // independent. Pass 2 exact-counts ONLY the candidates (a
      // broadcast-literal IN prunes the scan) and applies the true
      // threshold, so the result is the exact answer — independent of
      // partition layout even though the candidate SET is not. q57's
      // full groupBy is the small-vocab plan; this is the one that
      // survives n-gram-scale vocabularies.
      import graft.functions.expressions.MisraGriesAgg.mgSummary
      val toks = docs(s, dir)
        .select(explode(Text.tokens(col("text"))).as("tok"))
      val summary = toks.agg(mgSummary(col("tok"), 255).as("s"))
        .head.getStruct(0)
      val total = summary.getLong(0)
      val cands = summary.getSeq[String](1)
      toks.filter(col("tok").isin(cands: _*))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("freq"))
        .where(col("freq") * lit(256L) > lit(total))
    }),

    "q62_stratified_sample" -> ((s, dir) => {
      // deterministic stratified sampling: each language stratum keeps
      // its own rate (the training-mix rebalance every multilingual
      // corpus build runs). CONTENT-addressed — the md5 bucket decides,
      // so the sample is stable under re-sharding and re-ingestion,
      // and two pipelines sampling the same corpus agree row-for-row.
      // Per-row codegen, zero shuffle until the final per-stratum agg.
      val rate = StratumRates.foldLeft(lit(DefaultRatePct): Column) {
        case (acc, (l, r)) => when(col("lang") === l, r).otherwise(acc)
      }
      val sampled = splitBucket < rate
      docs(s, dir)
        .withColumn("tk", size(Text.tokens(col("text"))))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
             sum(when(sampled, 1).otherwise(0)).as("n_sampled"),
             sum(when(sampled, col("tk")).otherwise(0)).as("sampled_tokens"))
    }),

    "q63_token_budget_mix" -> ((s, dir) => {
      // token-budget mixture: each source (domain) contributes docs in
      // deterministic content-hash order until its token budget is
      // spent — how a training mix hits per-domain token targets
      // reproducibly. The running sum is perSourceCumSum — distributed
      // range-bucket prefix sums above the size gate (sources x 256
      // parallelism), the plain per-source window below it; the budget
      // cut prunes everything past the cumulative threshold.
      perSourceCumSum(s, docs(s, dir))
        .where(col("cum") <= TokenBudgetPerSource)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("tk")).as("tokens_kept"))
    }),

    "q105_temperature_mix" -> ((s, dir) => {
      // TEMPERATURE-WEIGHTED MIXTURE (the mT5/Llama multilingual
      // recipe): each source's token budget is proportional to
      // n_s^alpha with alpha = 0.5 — small sources get upweighted
      // RELATIVE share, big ones get subsampled — then docs fill each
      // budget in deterministic content-hash order (q63's cut). The
      // whole weight computation is integer fixed-point
      // (floor(sqrt(n)*2^20), cross-multiplied budgets) so the oracle
      // replays it bit-for-bit: no double SUM whose order could
      // differ between engines.
      //
      // Scale: per-source token counts are one partial-agg pass over
      // perSourceCumSum's cached base (sources = a handful of
      // groups); budgets are a broadcast-tiny table; the budget cut
      // is q63's cumulative cut — distributed range-bucket prefix
      // sums above the size gate, pruning everything past the budget.
      val cum = perSourceCumSum(s, docs(s, dir))
      val weights = cum.groupBy(col("source"))
        .agg(sum(col("tk")).as("n_s"))
        .withColumn("w",
          floor(sqrt(col("n_s").cast("double")) * MixWeightScale)
            .cast("long"))
      val budgets = weights
        .crossJoin(broadcast(weights.agg(sum(col("w")).as("tw"))))
        .select(col("source"),
          expr(s"CAST(($MixTargetTokens * w) DIV tw AS BIGINT)")
            .as("budget_tokens"))
      cum.join(broadcast(budgets), Seq("source"))
        .where(col("cum") <= col("budget_tokens"))
        .groupBy(col("source"))
        .agg(first(col("budget_tokens")).as("budget_tokens"),
             count(lit(1)).as("n_kept"),
             sum(col("tk")).as("tokens_kept"))
        .select(col("source"), col("budget_tokens"), col("n_kept"),
                col("tokens_kept"))
    }),

    "q66_sequence_packing" -> ((s, dir) => {
      // sequence packing: concatenate each source's docs in
      // content-hash order and chunk into SeqLen-token training
      // sequences (the GPT-style pack-then-split). Reports per source
      // the full sequences produced, the wasted tail, and how many
      // docs straddle a sequence boundary (the stat that decides
      // whether you need attention masking across doc joins).
      // Cumulative position is perSourceCumSum — distributed
      // range-bucket prefix sums above the size gate, the same scale
      // shape as q63; no global ordering anywhere.
      perSourceCumSum(s, docs(s, dir))
        .withColumn("st", col("cum") - col("tk"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("tk")).as("total_tokens"),
          sum(when(col("tk") > 0 &&
                   expr(s"st div $SeqLen") =!= expr(s"(cum - 1) div $SeqLen"),
              1).otherwise(0)).as("boundary_docs"))
        .withColumn("n_sequences", expr(s"total_tokens div $SeqLen"))
        .withColumn("tail_tokens", col("total_tokens") % SeqLen)
        .select(col("source"), col("n_docs"), col("total_tokens"),
                col("n_sequences"), col("tail_tokens"), col("boundary_docs"))
    }),

    "q66b_packing_manifest" -> ((s, dir) => {
      // the packing MANIFEST q66 summarizes: every doc is assigned to
      // the training sequence containing its first token (source,
      // seq_idx = start div 512) — the grouping a sequence writer
      // consumes to emit chunks. Same perSourceCumSum spine as q66;
      // the manifest is one row per (source, sequence).
      perSourceCumSum(s, docs(s, dir))
        .withColumn("seq_idx", expr(s"(cum - tk) div $SeqLen"))
        .groupBy(col("source"), col("seq_idx"))
        .agg(count(lit(1)).as("n_docs"),
             sum(col("tk")).as("doc_tokens"),
             min(col("doc_id")).as("first_doc"))
    }),

    "q67_boilerplate_segments" -> ((s, dir) =>
      boilerplateSegments(docs(s, dir), SegTokens,
        Dedup.spanSaltBuckets(s))),
    // the salted shape as a standing operating point the driver
    // hash-verifies every round against the SAME oracle; buckets
    // auto-scale with the machine (spark.graft.span.saltBuckets
    // overrides), the literal-8 A/B point lives in SkewSpec only
    "q67b_boilerplate_salted" -> ((s, dir) =>
      boilerplateSegments(docs(s, dir), SegTokens,
        Dedup.spanSaltBucketsAuto(s))),

    "q69_importance_scores" -> ((s, dir) => importanceScores(s, dir)),
  )

  /** q67's operator, factored so the skew spec can drive it on a
    * planted Zipfian corpus: line/paragraph-level dedup (CCNet-style
    * boilerplate removal), re-expressed over word-soup docs as fixed
    * `segTokens`-token segments at stride `segTokens`: a segment
    * appearing in >= BoilerplateDf (= 2) distinct docs is
    * boilerplate. Per doc: segment count, boilerplate instances,
    * tokens surviving removal.
    *
    * Scale/perf: segments key on the native SpanKeysExpr rolling hash
    * (stride-1 keys, filtered to i % segTokens == 0 — one codegen
    * pass, one md5 per token, 8-byte shuffle keys). The >= 2-doc test
    * has the same two physical shapes as [[Dedup.spanCoverage]],
    * chosen by `saltBuckets`: 0 = min/max window on the key (one
    * shuffle, no join-back; hot-key bound), > 0 = two-phase salted
    * aggregate into the boilerplate-key set + LEFT join back with a
    * flag (per-row boilerplate membership, AQE-splittable join).
    * Row-for-row identical output. */
  def boilerplateSegments(docsDf: DataFrame, segTokens: Int = SegTokens,
                          saltBuckets: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // no `size(toks) >= segTokens` guard: spanKeys returns an EMPTY
    // array for short docs so the posexplode drops them anyway, and
    // the explicit filter pushed (as size(split(text)) >= k) below
    // the exchange into the serial fixture scan while splitting the
    // branches' canonical plans (see Dedup.dupSpanRows).
    // Spread BEFORE tokenizing (the tokenizedBase pattern, round-13):
    // this was the one span-family entry without it, so the per-doc
    // tokenize+spanKeys hashing ran at file-layout parallelism (1 task
    // at fixture, par ~3.8 at 10x) instead of cluster width; both
    // consumers (repeat-key aggregate + join-back) also now share one
    // ReusedExchange instead of re-scanning.
    val segs = docsDf
      .repartition(
        docsDf.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"), size(col("toks")).as("tk"),
        posexplode(graft.functions.expressions.ArrayOps
          .spanKeys(col("toks"), segTokens)))
      .toDF("doc_id", "tk", "i", "seg")
      .where(col("i") % segTokens === 0)
    val flagged =
      if (saltBuckets <= 0) {
        val w = Window.partitionBy(col("seg"))
        segs
          .withColumn("mn", min(col("doc_id")).over(w))
          .withColumn("mx", max(col("doc_id")).over(w))
          .withColumn("bp", col("mn") =!= col("mx"))
      } else {
        val bpKeys = Dedup.saltedRepeatKeys(segs, "seg", saltBuckets)
          .withColumn("bp0", lit(true))
        segs.join(bpKeys, Seq("seg"), "left")
          .withColumn("bp", coalesce(col("bp0"), lit(false)))
      }
    flagged
      .groupBy(col("doc_id"), col("tk"))
      .agg(count(lit(1)).as("n_segments"),
           sum(when(col("bp"), 1).otherwise(0)).as("n_boilerplate"))
      .select(col("doc_id"), col("n_segments"), col("n_boilerplate"),
              (col("tk") - col("n_boilerplate") * segTokens)
                .cast("long").as("tokens_after_removal"))
  }

  private def importanceScores(s: SparkSession, dir: String): DataFrame = {
      // DSIR-style importance scoring: rank raw docs by how much their
      // unigrams look like the target domain (lang='en' stands in for
      // the curated target). The usual log-likelihood ratio is
      // replaced by the integer cross-multiplication
      //   weight(w) = ct(w) * total_raw - cr(w) * total_target
      // (same sign and ordering per token as log(p_t/p_r) without
      // smoothing-constant choices — and integer arithmetic is
      // bit-identical across engines, where ln() is not). Doc score =
      // sum of instance weights; top 20.
      // Scale: corpus totals are one row -> broadcast; the unigram
      // vocab is CORPUS-PROPORTIONAL (10⁸-10⁹ terms at 100 TB), so
      // its join is deliberately un-hinted — `toks` is keyed by `w`,
      // AQE broadcasts when the vocab is small and shuffles on `w`
      // (one exchange) when it isn't. Per-doc sum is one shuffle on
      // doc_id; top-k collapses to TakeOrderedAndProject.
      val toks = docs(s, dir)
        .select(col("doc_id"), col("lang"),
                explode(Text.tokens(col("text"))).as("w"))
      val raw = toks.groupBy(col("w")).agg(count(lit(1)).as("cr"))
      val tgt = toks.where(col("lang") === "en")
        .groupBy(col("w")).agg(count(lit(1)).as("ct"))
      val totals = toks.agg(
        count(lit(1)).as("tr"),
        sum(when(col("lang") === "en", 1).otherwise(0)).as("tt"))
      val vocab = raw.join(tgt, Seq("w"), "left")
        .na.fill(0, Seq("ct"))
        .crossJoin(broadcast(totals))
        .select(col("w"),
                (col("ct") * col("tr") - col("cr") * col("tt")).as("wt"))
      // toks is the exploded token INSTANCE stream — never a
      // broadcast build side (GraftBridge.neverBroadcast); the vocab
      // stays AQE-broadcastable when it truly fits
      org.apache.spark.sql.GraftBridge.neverBroadcast(toks)
        .join(vocab.select(col("w"), col("wt")), Seq("w"))
        .groupBy(col("doc_id"))
        .agg(sum(col("wt")).as("score"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(20)
  }

  /** q85: CCNet-style language-model fluency filter — rank documents
    * by how SURPRISING their text is under a bigram LM trained on the
    * corpus itself (ccnet buckets CommonCrawl by KenLM perplexity and
    * keeps the fluent head/middle; cf. reference's quality gates,
    * which are rule-based only).
    *
    * The usual per-token cross-entropy -log P(w|v) with add-one
    * smoothing, P(w|v) = (c(v,w)+1)/(c(v)+V), is replaced by its
    * transcendental-free integer analog: the inverse conditional
    * probability in milli-units,
    *   r(v,w) = ((c(v) + V) * 1000) div (c(v,w) + 1)
    * — monotone per bigram in the same direction as surprisal, and
    * integer arithmetic is bit-identical across engines where ln()
    * is not (the q69 DSIR trick). A doc's rarity is the sum of its
    * instance rarities; avg = sum div n. Headroom: r is CAPPED at
    * 10^12 — uncapped, a hapax bigram of a top unigram at 10^13
    * corpus tokens scores ~10^16, and a long disfluent doc (10^5+
    * known bigrams) sums past 2^63, where Spark's non-ANSI sum wraps
    * negative (ranking the WORST doc last) while DuckDB's HUGEINT
    * does not — a silent cross-engine divergence. The cap only binds
    * when cu+vv > 10^9*(cb+1), i.e. the bigram is already maximally
    * rare for ranking purposes; capped, even a 10^6-bigram doc sums
    * to 10^18 < 2^63.
    *
    * Scale: the bigram vocab is CORPUS-PROPORTIONAL, so both the
    * cb-cu build join and the instance-scoring join are deliberately
    * un-hinted — AQE broadcasts while the LM fits and shuffles on the
    * bigram key when it doesn't (the q82/q69 lesson). V and totals
    * are one row -> broadcast. Per-doc sum is one shuffle on doc_id;
    * top-20 collapses to TakeOrderedAndProject. */
  def lmRarity(docsDf: DataFrame): DataFrame =
    // (A scan-parallelism repartition pin was A/B'd here and REVERTED
    // — same finding as q82: allocation-bound bigram explode under
    // 32-way spread worsened the idle wall 0.74 → 1.09 s via GC; no
    // stage reaches the 0.5 s heavy bar without it.)
    // the INSTANCE stream must never be a broadcast build side: its
    // static size estimate is the compressed doc scan's (Generate
    // keeps the child's bytes), and at 10x Catalyst happily planned a
    // driver-side HashedRelation of EVERY bigram (BuildLeft) — the LM
    // side stays free for AQE to broadcast when it truly fits
    org.apache.spark.sql.GraftBridge.neverBroadcast(docBigrams(docsDf))
      .join(lmVocab(docsDf), Seq("v", "w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("r")).as("rarity_sum"))
      .withColumn("rarity_avg_milli", expr("rarity_sum div n_bigrams"))
      .orderBy(col("rarity_avg_milli").desc, col("doc_id").asc)
      .limit(20)

  /** The stride-1 bigram stream of a doc set: (doc_id, v, w) per
    * adjacent token pair, plus any `keep` passthrough columns (the
    * streaming face keeps its event-time column). Underscore-prefixed
    * internals — same collision rule as [[chunkWithOverlap]]. */
  private[graft] def docBigrams(docsDf: DataFrame,
                                keep: Seq[String] = Nil): DataFrame = {
    val kept = keep.map(col)
    // NO doc-length filter here: a 1-token doc's two slices are both
    // empty, so explode already emits nothing — and an explicit
    // where(size >= 2) gets pushed BELOW the streaming watermark node
    // (the DocStream-measured hazard), so a run of short docs would
    // stall [[graft.streaming.DocStream.lmRarityStream]]'s watermark
    // and with it every append emission
    docsDf
      .select(col("doc_id") +: Text.tokens(col("text")).as("_bts") +: kept: _*)
      .select(col("doc_id") +:
        explode(arrays_zip(
          slice(col("_bts"), lit(1), size(col("_bts")) - 1),
          slice(col("_bts"), lit(2), size(col("_bts")) - 1))).as("_bp") +:
        kept: _*)
      .select(col("doc_id") +: col("_bp.0").as("v") +: col("_bp.1").as("w") +:
        kept: _*)
  }

  /** q85's trained model as a table: (v, w, r) — the integer rarity
    * of every bigram observed in `docsDf` under the add-one-smoothed
    * corpus bigram LM. Materialize this (one write) to score streams
    * against it ([[graft.streaming.DocStream.lmRarityStream]]) without
    * re-training per batch. */
  def lmVocab(docsDf: DataFrame): DataFrame = {
    val toks = docsDf
      .select(col("doc_id"), Text.tokens(col("text")).as("_bts"))
      .where(size(col("_bts")) >= 2)
    val uni = toks.select(explode(col("_bts")).as("v"))
    val cb = docBigrams(docsDf)
      .groupBy(col("v"), col("w")).agg(count(lit(1)).as("cb"))
    val cu = uni.groupBy(col("v")).agg(count(lit(1)).as("cu"))
    val vsize = uni.agg(countDistinct(col("v")).as("vv"))
    cb.join(cu, Seq("v"))
      .crossJoin(broadcast(vsize))
      .select(col("v"), col("w"),
        expr("least(((cu + vv) * 1000) div (cb + 1), 1000000000000L)").as("r"))
  }

  /** q86: retrieval/RAG chunking — split each document into
    * [[ChunkTokens]]-token chunks overlapping the previous chunk by
    * [[ChunkOverlap]] tokens (stride [[ChunkStride]]), emitting a
    * content-addressed manifest row per chunk (md5 of the space-joined
    * tokens — the downstream embed-and-index key). A trailing start
    * that adds no tokens beyond the previous chunk's overlap
    * (s >= n - overlap, s > 0) is suppressed: every emitted chunk
    * contributes new content.
    *
    * Scale: pure per-row codegen — sequence + explode + slice + md5,
    * no shuffle at all; output is ~n/stride rows per doc and the
    * chunk hash makes the manifest re-shard-stable (same property as
    * the q54 content-addressed split). */
  def chunkWithOverlap(docsDf: DataFrame,
                       chunk: Int = ChunkTokens,
                       overlap: Int = ChunkOverlap,
                       keep: Seq[String] = Nil): DataFrame = {
    // `keep` carries extra columns through unchanged (the streaming
    // face keeps its event-time column) — the geometry is THIS code
    // path for both batch and stream, so the two can never drift
    val stride = chunk - overlap
    val kept = keep.map(col)
    // internal names prefixed so they cannot collide with kept
    // passthrough columns (the stream's event-time column is `ts`)
    // no length guard: split() never yields an empty array (empty
    // text tokenizes to [""], one chunk), and null text short-circuits
    // sequence/explode to zero rows — a where() here would only add a
    // vacuous Filter to the otherwise pure per-row codegen plan (and,
    // on the streaming face, sit below the watermark node)
    docsDf
      .select(col("doc_id") +: Text.tokens(col("text")).as("_ctoks") +: kept: _*)
      .select(col("doc_id") +: size(col("_ctoks")).as("_cn") +: col("_ctoks") +:
        explode(sequence(lit(0), size(col("_ctoks")) - 1, lit(stride))).as("_cs") +:
        kept: _*)
      .where(col("_cs") === 0 || col("_cs") < col("_cn") - overlap)
      .select(col("doc_id") +:
        (col("_cs") / stride).cast("int").as("chunk_idx") +:
        col("_cs").as("start_tok") +:
        size(slice(col("_ctoks"), col("_cs") + 1, lit(chunk))).as("n_chunk_tokens") +:
        md5(concat_ws(" ", slice(col("_ctoks"), col("_cs") + 1, lit(chunk))))
          .as("chunk_hash") +: kept: _*)
  }

  // rest of the query map (split around the factored operators above;
  // a def so object-init order cannot NPE the eager `queries` val)
  private def queriesCont: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q85_lm_rarity" -> ((s, dir) => lmRarity(docs(s, dir))),

    "q86_chunk_overlap" -> ((s, dir) => chunkWithOverlap(docs(s, dir))),

    "q76_dataset_card" -> ((s, dir) =>
      // the "dataset card" panel: per-(lang, source) corpus accounting
      // with ROLLUP subtotals — docs, tokens, quality-keep counts,
      // mean length — the one-query summary a dataset release ships.
      // ROLLUP shares one scan + one shuffle across all three grouping
      // levels (no per-level re-reads); all metrics are sums/counts
      // (partial-agg friendly) — no count-distinct Expand (the q51
      // lesson). At 100 TB this is the same plan, with the rollup
      // shuffle bounded by |lang| x |source| groups.
      docs(s, dir)
        .withColumn("tk", size(Text.tokens(col("text"))))
        .withColumn("keepq", when(qualityKeep, 1).otherwise(0))
        .rollup(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
             sum(col("tk")).as("n_tokens"),
             sum(col("keepq")).as("n_quality_keep"),
             round(avg(col("n_chars")), 4).as("avg_chars"))),

    "q56_curation_pipeline" -> ((s, dir) => {
      // the composed build: quality gate -> exact dedup (keep lowest
      // doc_id per content digest) -> content-hash split -> summary
      val kept = docs(s, dir).where(qualityKeep)
      val deduped = kept
        .withColumn("fp", md5(col("text")))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("fp")).orderBy(col("doc_id"))))
        .where(col("rk") === 1)
      deduped
        .withColumn("split", splitName(splitBucket))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
             round(avg(col("n_chars")), 4).as("avg_chars"))
    }),

    "q90_curriculum_order" -> ((s, dir) =>
      globalOrder(s, dir, banded = true, seed = "")),
    "q90b_epoch_shuffle" -> ((s, dir) =>
      globalOrder(s, dir, banded = false, seed = "epoch-1")),

    "q91_bloom_decontam" -> ((s, dir) => bloomDecontam(s, dir)),

    "q93_weighted_sample" -> ((s, dir) => {
      // importance-weighted Bernoulli sampling: each doc's keep
      // probability is a CONTINUOUS per-doc weight (token count,
      // capped — the "keep more of the long documents" rebalance),
      // not a per-stratum constant like q62. Content-addressed
      // (md5 bucket < weight), so the sample is stable under
      // re-sharding and two pipelines agree row-for-row; per-row
      // codegen, zero shuffle until the per-source summary.
      val tk = size(Text.tokens(col("text")))
      val weightPct = expr("least(size(split(text, ' ')), 200) div 2") // [0,100]
      docs(s, dir)
        .withColumn("tk", tk)
        .withColumn("kept", splitBucket < weightPct)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
             sum(when(col("kept"), 1).otherwise(0)).as("n_kept"),
             sum(when(col("kept"), col("tk")).otherwise(0)).as("kept_tokens"))
    })
  )

  /** q90/q90b: GLOBAL training order without a global sort — the
    * data-ordering step every training run needs (curriculum order,
    * or a fresh deterministic permutation per epoch), produced at
    * corpus scale with NO single-partition window and no zipWithIndex.
    *
    * The enumeration trick: bucket rows by (band, first hex byte of
    * the order hash) — the bucket is a PREFIX of the global sort key,
    * so bucket boundaries are order boundaries. Then
    *   1. per-bucket counts (one partial agg, ≤ 2,560 rows out),
    *   2. exclusive prefix-sum over the ORDERED bucket list — the only
    *      unpartitioned window in the library, and it runs on the
    *      bucket-count table, never the corpus,
    *   3. broadcast the offsets back, rank WITHIN each bucket
    *      (partitioned window), global_pos = bucket offset + local rank.
    * One corpus shuffle total (the bucket-partitioned rank); a global
    * `ORDER BY` + row_number would funnel 100 TB through one task.
    * Content-addressed (md5 of seed+text): stable under re-sharding,
    * and a new `seed` is a new, equally-deterministic epoch permutation.
    *
    * `banded=true` is curriculum order: length band ascending (short,
    * easy docs first), hash-shuffled within a band. `banded=false` is
    * the pure epoch shuffle. */
  def globalOrder(s: SparkSession, dir: String, banded: Boolean,
                  seed: String): DataFrame =
    globalOrderBy(docs(s, dir),
      (if (banded) least(expr("size(split(text, ' ')) div 100"), lit(9))
       else lit(0)).cast("long"),
      seed)

  /** The q90 machinery over ANY integer band column — q98 reuses it
    * with the trained classifier score as the curriculum key. */
  private[operators] def globalOrderBy(docsDf: DataFrame, bandCol: Column,
                                       seed: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the band is a SORT KEY: cast("long") on a fractional type would
    // silently truncate and MERGE previously distinct bands (the old
    // Window.orderBy version ordered any orderable type exactly) —
    // reject non-integral band expressions instead of mis-sorting
    val bandType = docsDf.select(bandCol.as("band")).schema.head.dataType
    bandType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"globalOrderBy: band expression must be integral, got " +
          s"${other.simpleString} — bucket boundaries are order " +
          "boundaries, so a lossy cast would merge distinct bands; " +
          "discretize the expression explicitly first")
    }
    val base = docsDf
      .withColumn("h", md5(concat(lit(seed), col("text")).cast("binary")))
      .withColumn("band", bandCol.cast("long"))
      .withColumn("bkt", substring(col("h"), 1, 2))
    val counts = base.groupBy(col("band"), col("bkt"))
      .agg(count(lit(1)).as("cnt"))
    // The offsets are METADATA-sized by contract (curriculum bands ×
    // 256 hash buckets — a few thousand rows), so the prefix sums are
    // computed on the driver: a cumulative-sum window over them would
    // need a single partition and logs WindowExec's "No Partition
    // Defined" performance warning on every run, sending readers
    // hunting a scale bug that isn't there (this replaces a GLOBAL
    // sort of the corpus — that's the scale win). Ordering matches the
    // former Window.orderBy(band, bkt): band numeric, bkt ASCII hex.
    import base.sparkSession.implicits._
    // null band/bkt rows never joined back in the window version
    // either (equi-join keys) — drop them instead of NPE-ing in
    // getLong/sortBy on a corpus with null text. The collect is
    // guarded: band×bucket cardinality past the metadata-size
    // contract fails loudly instead of OOMing the driver.
    val maxOffsetRows = 262144
    val rawRows = counts.limit(maxOffsetRows + 1).collect()
    if (rawRows.length > maxOffsetRows) throw new IllegalStateException(
      s"globalOrderBy: band x bucket cardinality exceeds $maxOffsetRows " +
        "— the offset table is driver-side by contract (curriculum " +
        "bands x 256 hash buckets); coarsen the band expression")
    val cRows = rawRows
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    var acc = 0L
    val offsets = cRows.map { case (band, bkt, cnt) =>
      val off = acc; acc += cnt; (band, bkt, off)
    }.toSeq.toDF("band", "bkt", "off")
    val wb = Window.partitionBy(col("band"), col("bkt"))
      .orderBy(col("h"), col("doc_id"))
    base.join(broadcast(offsets), Seq("band", "bkt"))
      .withColumn("global_pos", col("off") + row_number().over(wb))
      .select(col("doc_id"), col("band"), col("global_pos"))
  }

  def globalOrderOracleSql(banded: Boolean, seed: String): String = {
    val band =
      if (banded) "least(len(string_split(text, ' ')) // 100, 9)" else "0"
    s"""WITH t AS (
       |  SELECT doc_id, CAST($band AS BIGINT) AS band,
       |    md5('$seed' || text) AS h
       |  FROM documents)
       |SELECT doc_id, band,
       |  row_number() OVER (ORDER BY band, h, doc_id) AS global_pos
       |FROM t""".stripMargin
  }

  /** q91: q55's benchmark decontamination with a BLOOM-FILTER
    * prefilter — the shape for when the eval-set n-gram table is too
    * big to broadcast raw (a full eval harness is 10⁷-10⁸ shingles;
    * the raw strings are GBs, the Bloom filter of their hashes is
    * tens of MBs at the same false-positive budget). Spark's own
    * runtime-filter machinery (BloomFilterAggregate /
    * BloomFilterMightContain, the expressions InjectRuntimeFilter
    * plants) is used EXPLICITLY: build the filter over the benchmark
    * shingles in one tiny agg (bit-OR merge — order-independent,
    * deterministic), embed it as a literal predicate on the corpus
    * side, and only survivors enter the exact verify join. False
    * positives die in the join, so the result is EXACTLY q55 — the
    * oracle is shared verbatim — while the corpus-side shuffle
    * carries ~fpp of the non-matching shingles instead of all of
    * them. The verify join is deliberately un-hinted: AQE broadcasts
    * the eval side while it fits and shuffles when it doesn't. */
  def bloomDecontam(s: SparkSession, dir: String): DataFrame =
    decontam(s, dir, benchMaxId = 10L, mode = "bloom")

  /** The decontamination operator at any eval-set size, in the three
    * physical shapes whose crossover [[graft.tools.ScaleLab]] measures
    * (`bloom` probe):
    *  - `broadcast` — q55's shape: the raw eval shingle set broadcast,
    *    right for benchmark-sized eval sets;
    *  - `shuffle` — un-hinted exact join: ALL train shingles shuffle
    *    on the shingle key, the fallback once the eval set outgrows
    *    broadcast;
    *  - `bloom` — the Bloom prefilter above the same un-hinted join:
    *    the filter is eval-sized-bits, the shuffle carries only
    *    candidates (true matches + fpp of the rest).
    * Output is identical across modes — false positives die in the
    * exact join — so all three carry q55's oracle semantics. */
  def decontam(s: SparkSession, dir: String, benchMaxId: Long,
               mode: String): DataFrame = {
    val (train, bench) = decontamLegs(s, dir, benchMaxId)
    val candidates = mode match {
      case "broadcast" => train // bench side broadcast-hinted below
      case "shuffle" => train
      case "bloom" => bloomFiltered(train, bench)
      case other =>
        throw new IllegalArgumentException(s"unknown decontam mode '$other'")
    }
    val benchSide = if (mode == "broadcast") broadcast(bench) else bench
    candidates.join(benchSide, "shingle")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("shingle")).as("shared_ngrams"))
      .where(col("shared_ngrams") >= 3)
  }

  /** `rows` restricted to shingles that MIGHT be in `keys`: the Bloom
    * prefilter (exposed for ScaleLab's shuffled-row accounting). */
  private[graft] def bloomFiltered(rows: DataFrame, keys: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal => CatalystLit}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.GraftBridge
    // size the filter from the EVAL-SET cardinality (one eval-sized
    // count — cheap relative to the corpus scan it saves), so the
    // false-positive rate tracks the eval set instead of decaying
    // past a fixed constant (the ivfKFor discipline)
    val est = math.max(1000L, keys.count())
    val bfAgg = GraftBridge.column(
      new BloomFilterAggregate(
        GraftBridge.expression(xxhash64(col("shingle"))), est)
        .toAggregateExpression())
    // one Bloom filter, ~1.2 MB per 10⁶ eval shingles — the
    // bounded-collect contract (codebook-style): driver state is
    // filter-sized, never corpus-sized
    val bf = keys.agg(bfAgg.as("bf")).head.getAs[Array[Byte]](0)
    rows.where(GraftBridge.column(BloomFilterMightContain(
      CatalystLit.create(bf, org.apache.spark.sql.types.BinaryType),
      GraftBridge.expression(xxhash64(col("shingle"))))))
  }

  /** The (train, bench) shingle legs of [[decontam]] at any eval size
    * (exposed for ScaleLab's accounting). */
  private[graft] def decontamLegs(s: SparkSession, dir: String,
                                  benchMaxId: Long): (DataFrame, DataFrame) = {
    val sh = graft.functions.expressions.ArrayOps
    val shingled = docs(s, dir)
      .select(col("doc_id"), sh.wordShingles(Text.tokens(col("text")), 3).as("sh"))
    (shingled.where(col("doc_id") >= benchMaxId)
       .select(col("doc_id"), explode(col("sh")).as("shingle")),
     shingled.where(col("doc_id") < benchMaxId)
       .select(explode(col("sh")).as("shingle")).distinct())
  }

  /** q55's DuckDB replay — shared verbatim by q91 (the Bloom
    * prefilter's contract is identical output). */
  private val decontamOracleSql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(t) >= 3
      |         THEN list_distinct(list_transform(generate_series(1, len(t) - 2),
      |                i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))
      |         ELSE []::VARCHAR[] END AS sh
      |  FROM tok),
      |bench AS (
      |  SELECT DISTINCT unnest(sh) AS shingle FROM sh WHERE doc_id < 10),
      |train AS (
      |  SELECT doc_id, unnest(sh) AS shingle FROM sh WHERE doc_id >= 10)
      |SELECT tr.doc_id, count(DISTINCT tr.shingle) AS shared_ngrams
      |FROM train tr JOIN bench b ON tr.shingle = b.shingle
      |GROUP BY tr.doc_id
      |HAVING count(DISTINCT tr.shingle) >= 3""".stripMargin

  /** q67's DuckDB replay; shared verbatim by q67b (the salted shape's
    * contract is identical output, so it carries the identical
    * oracle). Powers-of-two weights: see SpanKeysExpr (subset sums
    * distinct). */
  private def q67OracleSql: String = {
    val segKey = (1 to SegTokens)
      .map(j => s"th[i * $SegTokens + $j] * ${1L << (j - 1)}").mkString(" + ")
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |h AS (
       |  SELECT doc_id, len(toks) AS tk,
       |    list_transform(toks,
       |      tok -> ('0x' || substring(md5(tok), 1, 14))::BIGINT) AS th
       |  FROM t),
       |segr AS (
       |  SELECT doc_id, tk,
       |    unnest(list_transform(generate_series(0, tk // $SegTokens - 1),
       |      i -> $segKey)) AS seg
       |  FROM h WHERE tk >= $SegTokens),
       |boiler AS (
       |  SELECT seg FROM segr GROUP BY seg
       |  HAVING count(DISTINCT doc_id) >= $BoilerplateDf)
       |SELECT s.doc_id, count(*) AS n_segments,
       |  CAST(sum(CASE WHEN b.seg IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_boilerplate,
       |  CAST(any_value(s.tk)
       |    - sum(CASE WHEN b.seg IS NOT NULL THEN 1 ELSE 0 END) * $SegTokens
       |    AS BIGINT) AS tokens_after_removal
       |FROM segr s LEFT JOIN boiler b ON s.seg = b.seg
       |GROUP BY s.doc_id""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q54_hash_split" ->
      """WITH t AS (
        |  SELECT n_chars,
        |    len(string_split(text, ' ')) AS n_tokens,
        |    ('0x' || substring(md5(text), 1, 8))::BIGINT % 100 AS bucket
        |  FROM documents)
        |SELECT CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars
        |FROM t GROUP BY 1""".stripMargin,

    "q55_decontam" -> decontamOracleSql,
    // the Bloom prefilter is semantically transparent (false positives
    // die in the exact verify join), so q91 carries q55's oracle verbatim
    "q91_bloom_decontam" -> decontamOracleSql,

    "q90_curriculum_order" -> globalOrderOracleSql(banded = true, seed = ""),
    "q90b_epoch_shuffle" ->
      globalOrderOracleSql(banded = false, seed = "epoch-1"),

    "q93_weighted_sample" ->
      """WITH t AS (
        |  SELECT source,
        |    len(string_split(text, ' ')) AS tk,
        |    ('0x' || substring(md5(text), 1, 8))::BIGINT % 100 AS bucket,
        |    least(len(string_split(text, ' ')), 200) // 2 AS w
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN bucket < w THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  CAST(sum(CASE WHEN bucket < w THEN tk ELSE 0 END) AS BIGINT)
        |    AS kept_tokens
        |FROM t GROUP BY source""".stripMargin,

    "q89_bpe_merges" -> bpeMergesOracleSql(),
    "q89b_bpe_vocab" -> bpeVocabOracleSql(),
    "q89c_bpe_encode" -> bpeEncodeOracleSql(),
    "q89d_bpe_byte_merges" -> bpeByteMergesOracleSql(),
    "q89e_bpe_byte_encode" -> bpeByteEncodeOracleSql(),

    "q57_vocab_topk" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
        |  FROM documents)
        |SELECT token, count(*) AS doc_freq
        |FROM t GROUP BY token
        |ORDER BY doc_freq DESC, token ASC LIMIT 20""".stripMargin,

    "q57b_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |tot AS (SELECT count(*) AS n FROM toks)
        |SELECT tok, count(*) AS freq
        |FROM toks GROUP BY tok
        |HAVING count(*) * 256 > (SELECT n FROM tot)""".stripMargin,

    "q62_stratified_sample" -> {
      val rateCase = "CASE " + StratumRates.map { case (l, r) =>
        s"WHEN lang = '$l' THEN $r" }.mkString(" ") +
        s" ELSE $DefaultRatePct END"
      s"""WITH t AS (
         |  SELECT lang,
         |    len(string_split(text, ' ')) AS tk,
         |    ('0x' || substring(md5(text), 1, 8))::BIGINT % 100 AS bucket
         |  FROM documents)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN bucket < $rateCase THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_sampled,
         |  CAST(sum(CASE WHEN bucket < $rateCase THEN tk ELSE 0 END) AS BIGINT)
         |    AS sampled_tokens
         |FROM t GROUP BY lang""".stripMargin
    },

    "q63_token_budget_mix" ->
      s"""WITH t AS (
         |  SELECT source, doc_id, md5(text) AS h,
         |    len(string_split(text, ' ')) AS tk
         |  FROM documents),
         |c AS (
         |  SELECT source, tk,
         |    sum(tk) OVER (PARTITION BY source ORDER BY h, doc_id
         |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS cum
         |  FROM t)
         |SELECT source, count(*) AS n_kept,
         |  CAST(sum(tk) AS BIGINT) AS tokens_kept
         |FROM c WHERE cum <= $TokenBudgetPerSource GROUP BY source""".stripMargin,

    "q105_temperature_mix" ->
      s"""WITH t AS (
         |  SELECT source, doc_id, md5(text) AS h,
         |    len(string_split(text, ' ')) AS tk
         |  FROM documents),
         |ns AS (
         |  SELECT source, CAST(sum(tk) AS BIGINT) AS n_s FROM t
         |  GROUP BY source),
         |wt AS (
         |  SELECT source,
         |    CAST(floor(sqrt(CAST(n_s AS DOUBLE)) * $MixWeightScale)
         |         AS BIGINT) AS w
         |  FROM ns),
         |b AS (
         |  SELECT source,
         |    CAST(($MixTargetTokens * w) // (SELECT sum(w) FROM wt)
         |         AS BIGINT) AS budget_tokens
         |  FROM wt),
         |c AS (
         |  SELECT t.source, tk, b.budget_tokens,
         |    sum(tk) OVER (PARTITION BY t.source ORDER BY h, doc_id
         |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS cum
         |  FROM t JOIN b ON b.source = t.source)
         |SELECT source, budget_tokens, count(*) AS n_kept,
         |  CAST(sum(tk) AS BIGINT) AS tokens_kept
         |FROM c WHERE cum <= budget_tokens
         |GROUP BY source, budget_tokens""".stripMargin,

    "q66_sequence_packing" ->
      s"""WITH t AS (
         |  SELECT source, doc_id, md5(text) AS h,
         |    len(string_split(text, ' ')) AS tk
         |  FROM documents),
         |c AS (
         |  SELECT source, tk,
         |    sum(tk) OVER (PARTITION BY source ORDER BY h, doc_id
         |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS cum
         |  FROM t)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(tk) AS BIGINT) AS total_tokens,
         |  CAST(sum(tk) AS BIGINT) // $SeqLen AS n_sequences,
         |  CAST(sum(tk) AS BIGINT) % $SeqLen AS tail_tokens,
         |  CAST(sum(CASE WHEN tk > 0 AND (cum - tk) // $SeqLen <> (cum - 1) // $SeqLen
         |           THEN 1 ELSE 0 END) AS BIGINT) AS boundary_docs
         |FROM c GROUP BY source""".stripMargin,

    "q66b_packing_manifest" ->
      s"""WITH t AS (
         |  SELECT source, doc_id, md5(text) AS h,
         |    len(string_split(text, ' ')) AS tk
         |  FROM documents),
         |c AS (
         |  SELECT source, doc_id, tk,
         |    sum(tk) OVER (PARTITION BY source ORDER BY h, doc_id
         |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS cum
         |  FROM t)
         |SELECT source, CAST((cum - tk) // $SeqLen AS BIGINT) AS seq_idx,
         |  count(*) AS n_docs,
         |  CAST(sum(tk) AS BIGINT) AS doc_tokens,
         |  min(doc_id) AS first_doc
         |FROM c GROUP BY source, seq_idx""".stripMargin,

    "q67_boilerplate_segments" -> q67OracleSql,
    // same statement: the salted plan must hash to the window plan
    "q67b_boilerplate_salted" -> q67OracleSql,

    "q69_importance_scores" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |raw AS (SELECT w, count(*) AS cr FROM tok GROUP BY w),
        |tgt AS (SELECT w, count(*) AS ct FROM tok WHERE lang = 'en' GROUP BY w),
        |tot AS (
        |  SELECT count(*) AS tr,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tt
        |  FROM tok),
        |vocab AS (
        |  SELECT r.w, coalesce(t.ct, 0) * tot.tr - r.cr * tot.tt AS wt
        |  FROM raw r LEFT JOIN tgt t ON r.w = t.w, tot)
        |SELECT k.doc_id, CAST(sum(v.wt) AS BIGINT) AS score
        |FROM tok k JOIN vocab v ON k.w = v.w
        |GROUP BY k.doc_id
        |ORDER BY score DESC, doc_id ASC LIMIT 20""".stripMargin,

    "q76_dataset_card" ->
      """WITH t AS (
        |  SELECT lang, source, n_chars,
        |    len(string_split(text, ' ')) AS tk,
        |    CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 2000
        |          AND CAST(len(list_filter(string_split(text, ' '),
        |                x -> list_contains(['the','a','of','and','to','in'], x)))
        |              AS DOUBLE) / len(string_split(text, ' '))
        |              BETWEEN 0.01 AND 0.6
        |         THEN 1 ELSE 0 END AS keepq
        |  FROM documents)
        |SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(tk) AS BIGINT) AS n_tokens,
        |  CAST(sum(keepq) AS BIGINT) AS n_quality_keep,
        |  round(avg(n_chars), 4) AS avg_chars
        |FROM t GROUP BY ROLLUP (lang, source)""".stripMargin,

    "q56_curation_pipeline" ->
      """WITH q AS (
        |  SELECT doc_id, text, n_chars,
        |    len(string_split(text, ' ')) AS n_tokens,
        |    len(list_filter(string_split(text, ' '),
        |      x -> list_contains(['the','a','of','and','to','in'], x))) AS stop_ct
        |  FROM documents),
        |kept AS (
        |  SELECT doc_id, text, n_chars FROM q
        |  WHERE n_tokens BETWEEN 20 AND 2000
        |    AND CAST(stop_ct AS DOUBLE) / n_tokens BETWEEN 0.01 AND 0.6),
        |deduped AS (
        |  SELECT doc_id, text, n_chars,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rk
        |  FROM kept),
        |split AS (
        |  SELECT n_chars,
        |    ('0x' || substring(md5(text), 1, 8))::BIGINT % 100 AS bucket
        |  FROM deduped WHERE rk = 1)
        |SELECT CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n_docs,
        |  round(avg(n_chars), 4) AS avg_chars
        |FROM split GROUP BY 1""".stripMargin,

    "q85_lm_rarity" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bi AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(ts) - 1),
        |      i -> struct_pack(v := ts[i], w := ts[i + 1]))) AS p
        |  FROM t),
        |bi2 AS (SELECT doc_id, p.v AS v, p.w AS w FROM bi),
        |uni AS (SELECT unnest(ts) AS v FROM t),
        |cb AS (SELECT v, w, count(*) AS cb FROM bi2 GROUP BY v, w),
        |cu AS (SELECT v, count(*) AS cu FROM uni GROUP BY v),
        |vv AS (SELECT count(DISTINCT v) AS vv FROM uni),
        |vocab AS (
        |  SELECT v, w,
        |    least(((cu + vv) * 1000) // (cb + 1), 1000000000000) AS r
        |  FROM cb JOIN cu USING (v) CROSS JOIN vv),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |    CAST(sum(r) AS BIGINT) AS rarity_sum
        |  FROM bi2 JOIN vocab USING (v, w) GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, rarity_sum,
        |  rarity_sum // n_bigrams AS rarity_avg_milli
        |FROM agg
        |ORDER BY rarity_avg_milli DESC, doc_id
        |LIMIT 20""".stripMargin,

    "q86_chunk_overlap" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
         |  WHERE len(string_split(text, ' ')) >= 1),
         |starts AS (
         |  SELECT doc_id, ts, len(ts) AS n,
         |    unnest(generate_series(0, len(ts) - 1, $ChunkStride)) AS s
         |  FROM t)
         |SELECT doc_id,
         |  CAST(s // $ChunkStride AS INTEGER) AS chunk_idx,
         |  CAST(s AS INTEGER) AS start_tok,
         |  CAST(len(ts[s + 1 : s + $ChunkTokens]) AS INTEGER)
         |    AS n_chunk_tokens,
         |  md5(array_to_string(ts[s + 1 : s + $ChunkTokens], ' '))
         |    AS chunk_hash
         |FROM starts
         |WHERE s = 0 OR s < n - $ChunkOverlap""".stripMargin
  )
}
