package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver's deterministic parquet tables (TESTDATA.md).
  *
  * The reference (gear6io/ranger) exposes each Iceberg table to its
  * embedded engine as a view (`server/query/duckdb/engine.go:444-547`).
  * Here each parquet file becomes a DataFrame; Catalyst's DataSource V2
  * scan gives predicate pushdown + column pruning for free, which is
  * what keeps IO proportional to the query (not the dataset) at 100 TB.
  *
  * Scale note: at cluster scale these would be directories of many
  * parquet files (or an Iceberg/Delta table); `spark.read.parquet(dir)`
  * handles that transparently, including partition discovery. Nothing
  * in this module assumes a single file.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables that should always be broadcast in joins. */
  val broadcastable: Set[String] = Set("region", "nation", "supplier")

  // schema memo per parquet path: inference reads footers with a small
  // Spark job on EVERY spark.read.parquet call — across a
  // many-query-per-second serving mix that is pure fixed cost. The
  // driver's tables are immutable, so the first inference is
  // authoritative; passing the schema explicitly skips the job.
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    if (name == "events") {
      // events.ts has shipped in two physical shapes across driver
      // datasets: parquet TIMESTAMP(NANOS) — unreadable natively, so
      // the raw int64 nanos are read (nanosAsLong) and divided in
      // exact integer space (nanos exceed 2^53; a double round-trip
      // would corrupt them) — and plain TIMESTAMP(MICROS), which
      // Spark reads directly. Branch on the inferred type so both
      // generations of testdata load identically.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = schemaCache.computeIfAbsent(path,
        _ => spark.read.parquet(path).schema)
      val raw = spark.read.schema(schema).parquet(path)
      schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case _ =>
          // native timestamp (read as NTZ under Spark 4 inference);
          // cast to session-tz TIMESTAMP so downstream semantics and
          // the DuckDB oracle's naive timestamps agree (session tz is
          // pinned to UTC — the cast is value-identity).
          raw.withColumn("ts",
            org.apache.spark.sql.functions.col("ts")
              .cast(org.apache.spark.sql.types.TimestampType))
      }
    } else {
      val schema = schemaCache.computeIfAbsent(path,
        _ => spark.read.parquet(path).schema)
      spark.read.schema(schema).parquet(path)
    }
  }

  /** Register every table as a temp view named after the table, so the
    * same SQL text runs on Spark and on the DuckDB oracle. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
