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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_multimodal_features" -> ((s, dir) =>
      // documents.text stands in for an opaque media payload
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
                encode(col("text"), "UTF-8").as("payload"),
                col("source"))
        .withColumn("meta", struct(
          length(col("payload")).as("byte_len"),
          md5(col("payload")).as("digest"),
          lit("text/plain").as("mime")))
        // deterministic fake featurizer (stands in for decode+embed):
        // FeatureDim hash-derived floats in [0, 1)
        .withColumn("features", expr(
          s"""transform(sequence(0, ${FeatureDim - 1}),
             |  i -> CAST(CAST(pmod(xxhash64(payload, i), 1000) AS DOUBLE) / 1000.0 AS FLOAT))""".stripMargin))
        .select(col("doc_id"), col("source"),
                col("meta.byte_len").as("byte_len"),
                col("meta.digest").as("digest"),
                col("features"))),

    "q40_multimodal_agg" -> ((s, dir) =>
      // per-source stats over extracted features: shows the feature
      // column flowing through a relational aggregate
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"),
                encode(col("text"), "UTF-8").as("payload"))
        .withColumn("f0", expr(
          "CAST(pmod(xxhash64(payload, 0), 1000) AS DOUBLE) / 1000.0"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_assets"),
             sum(length(col("payload"))).as("total_bytes"),
             round(avg(col("f0")), 4).as("avg_f0")))
  )

  /** Fake-featurizer queries have no DuckDB equivalent (xxhash64 is
    * Spark-specific) → rows-only checks. */
  val oracleSql: Map[String, String] = Map.empty
}
