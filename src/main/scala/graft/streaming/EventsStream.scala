package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming surface.
  *
  * The reference has no stream-processing semantics — its "streaming" is
  * chunked batch ingestion (SURVEY §2.9; milestones/query-engine-
  * streaming-integration.md:10-45) plus a CDC bus for metadata. Both
  * collapse naturally onto Structured Streaming:
  *
  *  - chunked ingestion ≈ a file/socket source micro-batched into an
  *    append sink (each micro-batch = one ranger insert chunk, with the
  *    same atomic-commit upgrade Iceberg gives the batch path);
  *  - the CDC consumer ≈ readStream over the table of record.
  *
  * Beyond parity, a 100 TB training-data pipeline needs windowed
  * stream aggregation with late-data handling, so that is the surface
  * implemented here: event-time tumbling windows + watermark, and a
  * streaming dedup (dropDuplicates on event_id within the watermark) —
  * both stateful operators Spark manages per-key across executors.
  */
object EventsStream {

  /** Tumbling-window counts/sums per event_type with a watermark.
    * Works on any DataFrame with (ts: timestamp, event_type, value) —
    * batch or streaming (the plan is identical; Spark plans the
    * stateful version when the source is a stream). */
  def windowedAgg(events: DataFrame,
                  window: String = "1 hour",
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("event_type"), org.apache.spark.sql.functions.window(col("ts"), window))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 2).as("total_value"))
      .select(col("event_type"),
              col("window.start").as("window_start"),
              col("n_events"), col("total_value"))

  /** Exactly-once-per-event_id streaming dedup within the watermark —
    * the streaming analog of exact dedup (state store holds seen IDs
    * until the watermark passes; bounded memory at scale). */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicates("event_id")

  /** Chunked-ingestion analog: stream parquet files appearing under
    * `srcDir` into `destTable` in micro-batches (the ranger ClientData
    * path re-expressed; each micro-batch commits atomically). */
  def ingest(spark: SparkSession, srcDir: String, destTable: String,
             checkpoint: String): StreamingQuery = {
    val schema = spark.read.parquet(srcDir).schema
    spark.readStream
      .schema(schema)
      .parquet(srcDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .toTable(destTable)
  }
}
