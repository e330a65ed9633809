package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, plus a feature-extraction pass.
  *
  * The container has no image/audio codecs, so the *decode* step is a
  * deterministic fake (hash-derived features) behind a clearly marked
  * stub — but the Spark-side shape is real: binary column + metadata
  * struct, per-row featurization that stays inside codegen, and a
  * partitioning story (featurize is embarrassingly parallel; the only
  * shuffle is the downstream aggregation).
  *
  * On a real cluster the fake featurizer is replaced by a batched
  * decoder over `mapPartitions` (JVM codec) or `mapInPandas`/Arrow
  * (Python codec) with identical schema in/out.
  */
object Multimodal {

  /** REAL-DECODER BOUNDARY (stub per brief): a production build wires
    * a codec here, e.g. JPEG bytes → HxWx3 pixels. Deliberately
    * unimplemented in this container. */
  def decodeImage(bytes: Array[Byte]): Array[Array[Float]] = ???

  private val FeatureDim = 8

  /** Typed asset row: opaque payload + metadata — the schema shape a
    * real multimodal table would use. */
  case class Asset(doc_id: Long, source: String, payload: Array[Byte])
  case class AssetFeatures(doc_id: Long, source: String, byte_len: Int,
                           features: Array[Float])

  /** The batched decode path: mapPartitions so a real codec can
    * amortize per-batch setup (model load, decoder init) exactly like
    * `mapInPandas` would on the Python side. The featurizer here is the
    * deterministic fake (hash-derived); swapping in [[decodeImage]] +
    * a real embedder changes nothing about the plumbing, schema, or
    * partitioning — each partition is processed independently, so the
    * operator scales with executor count and shuffles nothing. */
  def featurizePartitioned(assets: org.apache.spark.sql.Dataset[Asset])
      : org.apache.spark.sql.Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      // per-partition setup happens HERE once (decoder/model init)
      batch.map { a =>
        val feats = Array.tabulate(FeatureDim) { i =>
          // stand-in for decode+embed of a.payload
          (math.abs(org.apache.spark.unsafe.hash.Murmur3_x86_32
            .hashUnsafeBytes(a.payload,
              org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
              a.payload.length, i)) % 1000) / 1000.0f
        }
        AssetFeatures(a.doc_id, a.source, a.payload.length, feats)
      }
    }
  }

  /** Deterministic fake featurizer (stands in for decode+embed):
    * f_i = (md5-derived 32-bit int of `text#i` mod 1000) / 1000.0 —
    * md5-based so the DuckDB oracle reproduces it exactly, and emitted
    * as one scalar DOUBLE column per feature (the round-1 harness
    * could not sort/hash an array column). */
  private def feature(i: Int): org.apache.spark.sql.Column =
    ((conv(substring(md5(concat(col("text"), lit(s"#$i"))), 1, 8), 16, 10)
      .cast("long") % 1000).cast("double") / 1000.0).as(s"f$i")

  private def duckFeature(i: Int): String =
    s"(('0x' || substring(md5(text || '#$i'), 1, 8))::BIGINT % 1000) / 1000.0 AS f$i"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_multimodal_features" -> ((s, dir) =>
      // documents.text stands in for an opaque media payload
      Tables.load(s, dir, "documents")
        .select(Seq(
          col("doc_id"), col("source"),
          length(encode(col("text"), "UTF-8")).as("byte_len"),
          md5(encode(col("text"), "UTF-8")).as("digest")) ++
          (0 until FeatureDim).map(feature): _*)),

    "q40_multimodal_agg" -> ((s, dir) =>
      // per-source stats over extracted features: shows the feature
      // column flowing through a relational aggregate
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"),
                length(encode(col("text"), "UTF-8")).as("byte_len"),
                feature(0))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_assets"),
             sum(col("byte_len")).as("total_bytes"),
             round(avg(col("f0")), 4).as("avg_f0")))
  )

  val oracleSql: Map[String, String] = Map(
    "q39_multimodal_features" ->
      s"""SELECT doc_id, source,
         |  strlen(text)::INT AS byte_len,
         |  md5(text) AS digest,
         |  ${(0 until FeatureDim).map(duckFeature).mkString(",\n  ")}
         |FROM documents""".stripMargin,

    "q40_multimodal_agg" ->
      s"""SELECT source, count(*) AS n_assets,
         |  CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
         |  round(avg((('0x' || substring(md5(text || '#0'), 1, 8))::BIGINT % 1000) / 1000.0), 4) AS avg_f0
         |FROM documents GROUP BY source""".stripMargin
  )
}
