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
      .select(col(idCol), col("ts"), col("sh"), size(col("sh")).as("n"),
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
              col("sh").as("csh"), col("n").as("cn"))

  /** Online near-dup flagging against a pre-banded corpus table (the
    * [[corpusBands]] schema, in-query or read back from a bucketed
    * table). Emits (doc_id, corpus_id, jaccard, ts) per flagged pair,
    * deduplicated within the watermark. */
  def nearDupAgainstBands(stream: DataFrame, bands: DataFrame,
                          numBands: Int = 8,
                          threshold: Double = 0.5,
                          watermark: String = "1 hour"): DataFrame = {
    val s = banded(stream.withWatermark("ts", watermark), "doc_id", numBands)
    val inter = ArrayOps.intersectCount(col("sh"), col("csh"))
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
}
