package graft.sources

import org.apache.spark.sql.DataFrame

/** Parquet write path with the reference's operational knobs
  * (SURVEY §2.1: snappy default, file rotation; parquet/interface.go
  * defaults, filesystem/parquet_manager.go:202-262 rotation):
  * per-write codec + max-records-per-file rotation. Spark handles the
  * 128 MB size-based splitting via maxRecordsPerFile + partition
  * sizing; every executor writes its partitions independently. */
object ParquetWriter {

  val SupportedCodecs: Set[String] =
    Set("none", "uncompressed", "snappy", "gzip", "brotli", "lz4", "zstd")

  def write(df: DataFrame, path: String,
            codec: String = "snappy",
            maxRecordsPerFile: Long = 1000000L,
            mode: String = "overwrite"): Unit = {
    val c = codec.toLowerCase
    require(SupportedCodecs.contains(c), s"unsupported codec: $codec")
    df.write
      .mode(mode)
      .option("compression", if (c == "none") "uncompressed" else c)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }
}
