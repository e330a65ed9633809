package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, plus a feature-extraction pass.
  *
  * Real in-JVM codecs cover PPM/WAV (hand-parsed) and JPEG/PNG/BMP/
  * GIF (`javax.imageio`, shipped with the JDK). The q39/q40 oracle
  * queries still use a deterministic md5 featurizer over `text`
  * payloads — that keeps the DuckDB replay exact — while the typed
  * Dataset path ([[featurizePartitioned]]) runs the real decoders;
  * the Spark-side shape is identical either way: binary column +
  * metadata struct, per-row featurization that stays inside codegen,
  * and a partitioning story (featurize is embarrassingly parallel;
  * the only shuffle is the downstream aggregation).
  *
  * On a real cluster, additional codecs plug into the same batched
  * `mapPartitions` decoder (JVM) or `mapInPandas`/Arrow (Python) with
  * identical schema in/out.
  */
object Multimodal {

  /** REAL-DECODER BOUNDARY. Formats with in-container codecs decode
    * for real, to an HxW grayscale (ITU-R 601 luma) matrix in [0,1]:
    * binary PPM (P6) is parsed right here in pure JVM code, and
    * JPEG / PNG / BMP / GIF go through `javax.imageio` — a public JDK
    * API, no external jar. Formats beyond those (WebP, AVIF, ...)
    * fail with an addressed error; a production build plugs another
    * codec into this same function without touching any of the Spark
    * plumbing around it. */
  def decodeImage(bytes: Array[Byte]): Array[Array[Float]] = {
    require(bytes.length >= 2, "empty image payload")
    if (bytes(0) == 'P' && bytes(1) == '6') decodePpm(bytes)
    else {
      val decoded = decodeImageIo(bytes)
      decoded.getOrElse(throw new IllegalArgumentException(
        s"unsupported image format (magic ${bytes(0).toChar}${bytes(1).toChar}); " +
        "this build decodes PPM (P6) natively and JPEG/PNG/BMP/GIF via " +
        "javax.imageio; other formats need a codec library"))
    }
  }

  /** JDK `ImageIO` decode (JPEG/PNG/BMP/GIF readers ship with every
    * JRE). Returns None when no registered reader recognizes the
    * payload — the caller owns the addressed error. Luma conversion
    * matches [[decodePpm]] bit-for-bit on 8-bit RGB. */
  private[operators] def decodeImageIo(bytes: Array[Byte])
      : Option[Array[Array[Float]]] = {
    // a corrupt body behind a valid magic makes ImageIO THROW
    // (IIOException) rather than return null; both mean "no decodable
    // image", and both must surface as the caller's addressed error —
    // never kill a 100 TB featurize job over one broken payload
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    Option(img).map { im =>
      Array.tabulate(im.getHeight, im.getWidth) { (y, x) =>
        val rgb = im.getRGB(x, y)
        val r = (rgb >> 16) & 0xFF
        val g = (rgb >> 8) & 0xFF
        val b = rgb & 0xFF
        (0.299f * r + 0.587f * g + 0.114f * b) / 255.0f
      }
    }
  }

  /** Binary PPM (P6): "P6 <w> <h> <maxval>" header (whitespace/comment
    * separated) followed by w*h RGB triplets. Returns grayscale
    * (ITU-R 601 luma) rows in [0,1]. */
  private[operators] def decodePpm(bytes: Array[Byte]): Array[Array[Float]] =
    decodePpmAt(bytes, 0)._1

  /** Nearest-neighbor resize — the downsample step every image
    * featurizer runs before embedding. Pure math, no codec. */
  def resize(img: Array[Array[Float]], outH: Int, outW: Int): Array[Array[Float]] = {
    val h = img.length; val w = img.head.length
    Array.tabulate(outH, outW) { (y, x) =>
      img(math.min(h - 1, y * h / outH))(math.min(w - 1, x * w / outW))
    }
  }

  /** RIFF/WAVE PCM16 decode: mono-ized samples in [-1,1]. Pure JVM —
    * the audio analog of [[decodePpm]]. Rejects compressed encodings
    * (format tag != 1) with an addressed error. */
  def decodeWav(bytes: Array[Byte]): Array[Float] = {
    def u16(i: Int) = (bytes(i) & 0xFF) | ((bytes(i + 1) & 0xFF) << 8)
    def u32(i: Int) = (bytes(i) & 0xFFL) | ((bytes(i + 1) & 0xFFL) << 8) |
      ((bytes(i + 2) & 0xFFL) << 16) | ((bytes(i + 3) & 0xFFL) << 24)
    require(bytes.length > 44 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a RIFF/WAVE payload")
    // walk chunks to fmt and data (canonical files have them in order)
    var pos = 12
    var channels = 0; var bits = 0; var dataAt = -1; var dataLen = 0
    while (pos + 8 <= bytes.length && (channels == 0 || dataAt < 0)) {
      val cid = new String(bytes, pos, 4, "US-ASCII")
      val clen = u32(pos + 4).toInt
      if (cid == "fmt ") {
        val tag = u16(pos + 8)
        require(tag == 1, s"unsupported WAV encoding (format tag $tag); " +
          "this build decodes PCM; compressed audio needs a codec library")
        channels = u16(pos + 10)
        bits = u16(pos + 22)
      } else if (cid == "data") { dataAt = pos + 8; dataLen = clen }
      pos += 8 + clen + (clen & 1)
    }
    require(channels > 0 && dataAt >= 0, "missing fmt/data chunk")
    require(bits == 16, s"unsupported bit depth $bits (PCM16 only)")
    val frames = dataLen / (2 * channels)
    Array.tabulate(frames) { f =>
      var acc = 0.0f
      var c = 0
      while (c < channels) {
        val i = dataAt + (f * channels + c) * 2
        acc += u16(i).toShort / 32768.0f
        c += 1
      }
      acc / channels
    }
  }

  /** Windowed audio features: per window, RMS energy and zero-crossing
    * rate — the classic cheap acoustic descriptor pair. */
  def audioFeatures(samples: Array[Float], windows: Int): Array[Float] = {
    require(samples.nonEmpty, "empty audio")
    val per = math.max(1, samples.length / windows)
    Array.tabulate(windows * 2) { k =>
      val w = k / 2
      val from = w * per
      val until = math.min(samples.length, from + per)
      if (from >= samples.length) 0f
      else if (k % 2 == 0) { // RMS
        var s = 0.0
        var i = from
        while (i < until) { s += samples(i) * samples(i); i += 1 }
        math.sqrt(s / (until - from)).toFloat
      } else { // zero-crossing rate
        var z = 0
        var i = from + 1
        while (i < until) {
          if ((samples(i) >= 0) != (samples(i - 1) >= 0)) z += 1
          i += 1
        }
        z.toFloat / math.max(1, until - from)
      }
    }
  }

  /** Frame sampling over a concatenated-PPM "video" payload (P6 frames
    * back to back): decode every `stride`-th frame only — the IO/CPU
    * shape of real video frame sampling, where the decoder seeks
    * keyframes instead of decoding the full stream. */
  def frameSample(bytes: Array[Byte], stride: Int): Seq[Array[Array[Float]]] = {
    require(stride >= 1, "stride must be >= 1")
    val out = Seq.newBuilder[Array[Array[Float]]]
    var pos = 0
    var frameIdx = 0
    while (pos + 2 <= bytes.length && bytes(pos) == 'P' && bytes(pos + 1) == '6') {
      val (frame, next) = decodePpmAt(bytes, pos)
      if (frameIdx % stride == 0) out += frame
      frameIdx += 1
      pos = next
    }
    out.result()
  }

  /** decodePpm generalized to a start offset; returns (frame, endPos). */
  private def decodePpmAt(bytes: Array[Byte], start: Int): (Array[Array[Float]], Int) = {
    var pos = start + 2
    def token(): String = {
      var scanning = true
      while (scanning && pos < bytes.length) {
        val c = bytes(pos).toChar
        if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else if (c.isWhitespace) pos += 1
        else scanning = false
      }
      val sb = new StringBuilder
      while (pos < bytes.length && !bytes(pos).toChar.isWhitespace) {
        sb += bytes(pos).toChar; pos += 1
      }
      sb.toString
    }
    val w = token().toInt; val h = token().toInt; val maxV = token().toInt
    pos += 1
    require(w > 0 && h > 0 && maxV > 0 && maxV <= 255, s"bad PPM header ${w}x$h/$maxV")
    require(bytes.length - pos >= w * h * 3, "truncated PPM payload")
    val base = pos
    val img = Array.tabulate(h, w) { (y, x) =>
      val i = base + (y * w + x) * 3
      val r = bytes(i) & 0xFF; val g = bytes(i + 1) & 0xFF; val b = bytes(i + 2) & 0xFF
      ((0.299f * r + 0.587f * g + 0.114f * b) / maxV)
    }
    (img, base + w * h * 3)
  }

  private val FeatureDim = 8

  /** Typed asset row: opaque payload + metadata — the schema shape a
    * real multimodal table would use. */
  case class Asset(doc_id: Long, source: String, payload: Array[Byte])
  case class AssetFeatures(doc_id: Long, source: String, byte_len: Int,
                           features: Array[Float])

  /** The batched decode path: mapPartitions so a real codec can
    * amortize per-batch setup (model load, decoder init) exactly like
    * `mapInPandas` would on the Python side. Decodable payloads (PPM
    * natively; JPEG/PNG/BMP/GIF via the JDK's ImageIO) go through the
    * REAL pipeline — decode → resize 2x4 → 8 pixel features; payloads
    * in formats without an in-container codec fall back to
    * deterministic hash features, so the operator is total.
    * Each partition is processed independently: the operator scales
    * with executor count and shuffles nothing. */
  def featurizePartitioned(assets: org.apache.spark.sql.Dataset[Asset])
      : org.apache.spark.sql.Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      // per-partition setup happens HERE once (decoder/model init)
      batch.map { a =>
        val feats =
          try resize(decodeImage(a.payload), 2, FeatureDim / 2).flatten
          catch {
            case _: IllegalArgumentException =>
              Array.tabulate(FeatureDim) { i =>
                (math.abs(org.apache.spark.unsafe.hash.Murmur3_x86_32
                  .hashUnsafeBytes(a.payload,
                    org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
                    a.payload.length, i)) % 1000) / 1000.0f
              }
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
                // INTEGER feature numerator, not the double: avg of
                // doubles depends on summation order and round(.,4)
                // lands on a half-boundary at sf1 (one hash mismatch
                // vs DuckDB at 600k docs); an exact integer sum makes
                // avg = sum/(1000·n) with both engines dividing the
                // SAME operands — bit-identical at every scale
                (conv(substring(md5(concat(col("text"), lit("#0"))), 1, 8),
                  16, 10).cast("long") % 1000).as("f0i"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_assets"),
             sum(col("byte_len")).as("total_bytes"),
             round(sum(col("f0i")).cast("double") /
               (count(lit(1)) * 1000.0), 4).as("avg_f0")))
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
         |  round(CAST(sum(('0x' || substring(md5(text || '#0'), 1, 8))::BIGINT % 1000) AS DOUBLE)
         |        / (count(*) * 1000.0), 4) AS avg_f0
         |FROM documents GROUP BY source""".stripMargin
  )
}
