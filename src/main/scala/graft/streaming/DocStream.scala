package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.functions.expressions.ArrayOps

/** Streaming document curation — the training-data pipeline's batch
  * operators ([[graft.operators.Curation]], [[graft.operators.Dedup]])
  * re-expressed over a document STREAM, for corpora that grow
  * continuously rather than arriving as one drop.
  *
  * Scale design:
  *  - the quality gate is stateless per-row codegen (identical Column
  *    tree to the batch q28/q56 rule) — no state store traffic for
  *    rejected docs;
  *  - cross-batch exact dedup uses dropDuplicatesWithinWatermark on
  *    the content digest: the state store holds one 16-byte key per
  *    doc INSIDE the watermark horizon, so state is bounded by ingest
  *    rate x watermark, never by corpus size (the batch backstop for
  *    older dups is the q31/q56 offline pass);
  *  - near-dup flagging joins the stream against the STATIC corpus on
  *    MinHash-LSH band keys (the q33 family, same constants) — a
  *    stream-static equi-join is stateless on Spark's side (the
  *    static side is re-readable per micro-batch and at 100 TB would
  *    be the bucketed band-key table AnnAtScaleSpec's layout writes,
  *    so each micro-batch probes matching buckets only); exact
  *    Jaccard verifies candidates before anything is flagged.
  *
  * RECOVERY CONTRACT (kill/restart): every face here is a
  * deterministic function of its input stream plus static tables, so
  * end-to-end exactly-once is Structured Streaming's standard
  * three-part deal — a REPLAYABLE source (files/Kafka), a
  * `checkpointLocation` owned by the (query, sink) pair for its whole
  * life, and a transactional sink. With those set, a killed query
  * restarted from its checkpoint re-plans only unfinished batches and
  * the file sink's `_spark_metadata` commit log makes the replay
  * invisible to readers (who must read THROUGH Spark so uncommitted
  * part-files are filtered). Restarting WITHOUT the checkpoint is a
  * NEW query: the source re-reads everything and every face re-emits
  * its full history — the file sink offers no cross-query dedup.
  * StreamingRecoverySpec pins both sides for chunkStream and
  * vecIngestStream; stateful faces (dedup, sessionization, windowed
  * aggs) additionally restore their state store from the same
  * checkpoint, which is why the checkpoint directory must never be
  * shared across queries or deleted mid-life.
  *
  * Watermark/filter interaction (measured, not theoretical): Catalyst
  * pushes non-event-time predicates BELOW the EventTimeWatermark
  * node, so rows a filter rejects never reach the event-time
  * collector. A stream whose rows ALL fail a filter therefore stops
  * advancing the watermark: append-mode aggregations stop emitting
  * ([[spanCoverageStream]] avoids its length filter entirely for this
  * reason) and within-watermark dedup state stops evicting (the
  * quality gate in [[curateStream]] and the shingle guard in the
  * near-dup path accept this: their emission is immediate, only state
  * EVICTION is paced by accepted traffic).
  */
object DocStream {

  // q33's MinHash family constants (ShingleK/NumHashes/bands) — kept
  // identical so a flag raised online agrees with the offline pass.
  private val ShingleK = 2
  private val NumHashes = 32

  /** Streaming quality gate + cross-batch exact dedup. Input schema:
    * (doc_id, text, source, ts: timestamp). Emits surviving docs with
    * their content digest, in append mode. */
  def curateStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .where(graft.operators.Curation.qualityKeep)
      .withColumn("fp", md5(col("text")))
      .dropDuplicatesWithinWatermark("fp")

  private def banded(df: DataFrame, idCol: String,
                     numBands: Int): DataFrame = {
    require(NumHashes % numBands == 0, s"bands=$numBands must divide $NumHashes")
    val r = NumHashes / numBands
    df.select(col(idCol), col("ts"),
        ArrayOps.wordShingles(Text.tokens(col("text")), ShingleK).as("sh"))
      .where(size(col("sh")) >= 1)
      .withColumn("mh", ArrayOps.minhashSig(col("sh"), NumHashes))
      // sorted 56-bit hash form of the shingle set: the batch verify
      // kernel's representation (Dedup.shingleBase), so stream and
      // batch probes share one intersect semantics
      .select(col(idCol), col("ts"),
              ArrayOps.sortedHashes(col("sh")).as("shx"),
              size(col("sh")).as("n"),
              explode(Text.lshBandKeys(col("mh"), numBands, r)).as("bh"))
  }

  /** The corpus side of the near-dup probe as a MATERIALIZABLE table
    * (corpus_id, bh, csh, cn): write it `bucketBy(bh)` once at ingest
    * and every micro-batch probes buckets instead of re-banding the
    * corpus (the BandedCorpusSpec layout; at 100 TB this is the only
    * shape that amortizes). */
  def corpusBands(corpus: DataFrame, numBands: Int = 8): DataFrame =
    banded(corpus.withColumn("ts", lit(null).cast("timestamp")),
        "corpus_id", numBands)
      .select(col("corpus_id"), col("bh"),
              col("shx").as("csh"), col("n").as("cn"))

  /** Online near-dup flagging against a pre-banded corpus table (the
    * [[corpusBands]] schema, in-query or read back from a bucketed
    * table). Emits (doc_id, corpus_id, jaccard, ts) per flagged pair,
    * deduplicated within the watermark. */
  def nearDupAgainstBands(stream: DataFrame, bands: DataFrame,
                          numBands: Int = 8,
                          threshold: Double = 0.5,
                          watermark: String = "1 hour"): DataFrame = {
    val s = banded(stream.withWatermark("ts", watermark), "doc_id", numBands)
    val inter = ArrayOps.sortedIntersectCount(col("shx"), col("csh"))
    s.join(bands, Seq("bh"))
      .withColumn("jaccard",
        round(inter.cast("double") / (col("n") + col("cn") - inter), 4))
      .where(col("jaccard") >= threshold)
      .select(col("doc_id"), col("corpus_id"), col("jaccard"), col("ts"))
      .dropDuplicatesWithinWatermark("doc_id", "corpus_id")
  }

  /** Online near-dup flagging: each arriving doc is checked against
    * the static `corpus` (doc_id, text) via LSH band-key equi-join +
    * exact-Jaccard verify. Bands the corpus in-query — prefer writing
    * [[corpusBands]] bucketed and calling [[nearDupAgainstBands]]
    * when the corpus is large. */
  def nearDupAgainstCorpus(stream: DataFrame, corpus: DataFrame,
                           numBands: Int = 8,
                           threshold: Double = 0.5,
                           watermark: String = "1 hour"): DataFrame =
    nearDupAgainstBands(stream, corpusBands(corpus, numBands),
      numBands, threshold, watermark)

  /** q70's span-coverage width — kept identical to the batch operator
    * so an online coverage number agrees with the offline pass. */
  private val SpanW = 5

  /** Online retrieval chunking — the streaming face of q86, for
    * embed-and-index pipelines that chunk documents AT ingest instead
    * of in a nightly batch. Pure stateless per-row work (sequence +
    * explode + slice + md5), so it shares
    * [[graft.operators.Curation.chunkWithOverlap]] — the literal
    * batch code path, geometry and hash included — and runs in append
    * mode with no state at all; the watermark only bounds downstream
    * consumers. Emits (doc_id, chunk_idx, start_tok, n_chunk_tokens,
    * chunk_hash, ts). */
  def chunkStream(stream: DataFrame, watermark: String = "1 hour"): DataFrame =
    graft.operators.Curation.chunkWithOverlap(
      stream.withWatermark("ts", watermark), keep = Seq("ts"))

  /** Online LM fluency scoring — the streaming face of q85. Arriving
    * docs are scored against a MATERIALIZED corpus bigram LM (the
    * [[graft.operators.Curation.lmVocab]] (v, w, r) schema): per doc,
    * the count and integer-rarity sum of its bigrams that the LM
    * knows, emitted (doc_id, ts, n_bigrams, rarity_sum,
    * rarity_avg_milli) in append mode once the watermark passes —
    * the ccnet ingest gate (drop/route the tail) without a nightly
    * re-score.
    *
    * Novel bigrams (absent from the LM) carry no count estimate, so
    * the inner join skips them: the score is rarity over KNOWN
    * bigrams, and a doc with no known bigram emits nothing (absence =
    * unscorable, same contract as [[spanCoverageStream]]'s clean
    * docs). Scale: stream-static join keyed on (v, w) — with the LM
    * table bucketed on its key each micro-batch reads matching
    * buckets; one stateful agg, state = one group per doc inside the
    * watermark. */
  /** Streaming face of the trained perceptron (q96): score arriving
    * docs with the SAME per-row margin Column the batch APPLY uses
    * ([[graft.operators.Classifier.scoreExpr]] — the weights ride as
    * a literal), so online and offline quality scoring cannot drift.
    * Stateless per-row fold: no watermark, no state, works on a batch
    * DataFrame too — the stream==batch contract the spec pins.
    * `score` is the integer margin (magnitude = confidence);
    * `quality_pred` the ±1 decision. */
  def qualityScoreStream(stream: DataFrame, w: Seq[Long]): DataFrame = {
    val sc = graft.operators.Classifier.scoreExpr(w)
    stream.select(col("doc_id"), col("ts"), sc.as("score"),
      when(sc > 0, 1L).otherwise(-1L).as("quality_pred"))
  }

  /** Streaming face of q57b: a running Misra-Gries summary over the
    * token stream (Complete mode — the aggregation state IS the
    * bounded summary, capacity entries regardless of how long the
    * stream runs or how large the vocab grows). Each micro-batch
    * folds its tokens into the state-store buffer, so after any batch
    * the emitted (n, cands) is exactly what the batch aggregate would
    * produce on all data seen so far — the stream==batch contract
    * MisraGriesSpec pins; the exact-recount second pass stays a batch
    * job over the corpus (candidates are a superset at every point,
    * so a monitor can recount lazily). */
  def heavyHittersStream(stream: DataFrame, capacity: Int = 255): DataFrame =
    stream
      .select(explode(graft.functions.Text.tokens(col("text"))).as("tok"))
      .agg(graft.functions.expressions.MisraGriesAgg
        .mgSummary(col("tok"), capacity).as("s"))
      .select(col("s").getField("n").as("n"),
              col("s").getField("cands").as("cands"))

  def lmRarityStream(stream: DataFrame, lm: DataFrame,
                     watermark: String = "1 hour"): DataFrame =
    graft.operators.Curation
      .docBigrams(stream.withWatermark("ts", watermark), keep = Seq("ts"))
      .join(lm, Seq("v", "w"))
      .groupBy(col("doc_id"), col("ts"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("r")).as("rarity_sum"))
      .withColumn("rarity_avg_milli", expr("rarity_sum div n_bigrams"))

  /** Online IVF cell assignment — the streaming face of the q88/q41
    * index: each arriving vector is assigned its nearest trained-
    * codebook centroid at INGEST time (stateless per-row native
    * argmin, the codebook embedded as a literal exactly as in the
    * batch path). Writing the output cell-partitioned keeps
    * probe-side cell pruning valid for vectors that arrived AFTER
    * training — the online half of an IVF index build. Emits
    * (vec_id, ts, cell, d_q); d_q is the quantized squared distance
    * in 2^-20 units, the same integer family as q88's wss_q, so
    * monitors can SUM it without float-order concerns. Works on a
    * batch DataFrame too (stateless transforms), which is the
    * stream==batch contract the spec pins. */
  def vecIngestStream(stream: DataFrame,
                      cents: Seq[Seq[Double]]): DataFrame =
    stream
      .select(col("vec_id"), col("ts"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("ve"))
      .withColumn("a", element_at(ArrayOps.ivfCells(col("ve"), cents, 1), 1))
      .select(col("vec_id"), col("ts"),
              col("a").getField("cell").as("cell"),
              floor(col("a").getField("d") * 1048576.0).cast("long").as("d_q"))

  /** Windowed per-cell ingest load + quantized distortion — the index
    * drift monitor over [[vecIngestStream]]: a window whose
    * `d_sum / n` rises above the trained WSS/n baseline (q88) is
    * drift, a cell whose `n` runs hot is a partition-balance alarm —
    * both BEFORE the skew lands in the stored index. One stateful
    * agg, state = cells x open windows inside the watermark. */
  def cellLoadStream(stream: DataFrame, cents: Seq[Seq[Double]],
                     windowLen: String = "10 minutes",
                     watermark: String = "1 hour"): DataFrame =
    vecIngestStream(stream, cents)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("cell"))
      .agg(count(lit(1)).as("n"), sum(col("d_q")).as("d_sum"))
      .select(col("window.start").as("window_start"), col("cell"),
              col("n"), col("d_sum"))

  /** The corpus's duplicated-span keys as a MATERIALIZABLE one-column
    * table (span: bigint): the q70/q83 "rep" set — spans appearing in
    * >= 2 distinct corpus docs. Write it `bucketBy(span)` at corpus
    * build time; each micro-batch probes it instead of recomputing
    * corpus-side windows. Same native SpanKeysExpr family as batch. */
  def corpusDupSpans(corpus: DataFrame): DataFrame =
    corpus
      .withColumn("toks", Text.tokens(col("text")))
      .where(size(col("toks")) >= SpanW)
      .select(col("doc_id"),
        explode(ArrayOps.spanKeys(col("toks"), SpanW)).as("span"))
      .groupBy(col("span"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .where(col("mn") =!= col("mx"))
      .select(col("span"))

  /** Online exact-substring coverage: score each ARRIVING doc's
    * duplication against the static corpus's duplicated-span set (the
    * [[corpusDupSpans]] schema) — the streaming face of q70, for
    * gating boilerplate-heavy documents at ingest time instead of a
    * nightly sweep. Emits (doc_id, ts, n_tokens, covered_tokens) in
    * append mode for each doc with NONZERO coverage, once the
    * watermark passes its event time (clean docs produce no row —
    * downstream gating treats absence as coverage 0).
    *
    * Scale: the stream side computes span keys per arriving doc (one
    * codegen pass); the join against the span table is stream-static
    * (stateless for Spark — with the table bucketed on span, each
    * micro-batch reads matching buckets only). Overlapping spans are
    * merged WITHOUT a second stateful operator (streaming agg cannot
    * COUNT(DISTINCT) over exploded positions, and chaining a
    * streaming dedup before the agg doubles the state): per doc, the
    * matched span STARTS collect (bounded by the doc's own length)
    * and an interval-union fold over the sorted starts computes the
    * covered-token count — byte-identical to distinct-position
    * counting, one stateful operator, state = one group per doc
    * inside the watermark. */
  def spanCoverageStream(stream: DataFrame, dupSpans: DataFrame,
                         watermark: String = "1 hour"): DataFrame = {
    val s = stream
      .withWatermark("ts", watermark)
      .withColumn("toks", Text.tokens(col("text")))
      .withColumn("n", size(col("toks")))
    // NO length filter here: spanKeys returns an empty array below w
    // tokens (posexplode then emits nothing), and an explicit
    // where(n >= w) gets pushed BELOW the watermark node — a stream
    // of short docs would then never reach the event-time collector
    // and the watermark (hence every append emission) would stall
    val spans = s
      .select(col("doc_id"), col("ts"), col("n"),
        posexplode(ArrayOps.spanKeys(col("toks"), SpanW)))
      .toDF("doc_id", "ts", "n", "i", "span")
    spans.join(dupSpans, Seq("span"))
      .groupBy(col("doc_id"), col("ts"), col("n"))
      .agg(sort_array(collect_list(col("i"))).as("ss"))
      .select(col("doc_id"), col("ts"), col("n").cast("long").as("n_tokens"),
        expr(s"""aggregate(ss,
                  named_struct('prev', -1L, 'acc', 0L),
                  (st, x) -> named_struct(
                    'prev', CAST(x AS BIGINT),
                    'acc', st.acc + IF(st.prev < 0, ${SpanW}L,
                                       least(${SpanW}L, x - st.prev))),
                  st -> st.acc)""").as("covered_tokens"))
  }

  /** Streaming cluster maintenance — the online face of q61c/q61d:
    * each micro-batch of arriving documents updates the persisted
    * cluster state at `stateDir` through
    * [[graft.operators.Dedup.maintainClusterState]] (affected
    * components only; exactness argument there), so the label table
    * is continuously equal to a full re-cluster of everything
    * ingested. foreachBatch is at-least-once under retries; the
    * versioned state commit makes a replay observable (a duplicate
    * version with duplicate doc ids) rather than corrupting —
    * exactly-once label contents need the upstream's batch ids
    * de-duplicated first (UpsertStream discussion applies). */
  def clusterMaintenanceSink(stream: DataFrame, stateDir: String,
                             numBands: Int = 8)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          graft.operators.Dedup.maintainClusterState(
            batch.sparkSession, stateDir,
            batch.select(col("doc_id"), col("text")), numBands)
        ()
    }
}
