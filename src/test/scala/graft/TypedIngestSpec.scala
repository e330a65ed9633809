package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The 100 TB answer to JSON-heavy event tables (round-1 verdict on
  * q52/q25b: "extracting props into a typed column at ingest is the
  * 100 TB answer"): parse the semi-structured column ONCE at ingest,
  * persist typed columns, and every downstream query drops the
  * per-row JSON parse. This spec materializes that table shape and
  * proves (a) result equivalence with the parse-per-query form and
  * (b) the typed plan carries no JSON expressions. */
class TypedIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  test("typed-at-ingest props: same results, no per-query JSON parse") {
    val tmp = java.nio.file.Files.createTempDirectory("typedcols").toString
    val events = graft.sources.Tables.load(spark, dir, "events")
    // ingest-time extraction: one JSON parse per row, ever
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .drop("props")
      .write.mode("overwrite").parquet(tmp)

    val typed = spark.read.parquet(tmp)
    val fromTyped = typed.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val fromJson = events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fromTyped == fromJson)

    // the typed plan parses no JSON and prunes to the two columns
    val plan = typed.groupBy(col("event_type")).agg(sum(col("k")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("get_json_object"), s"JSON parse survived:\n$plan")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema"))
      .flatMap(l => "ReadSchema: (.*)$".r.findFirstMatchIn(l).map(_.group(1)))
      .getOrElse("")
    assert(!readSchema.contains("props"), s"props column still read: $readSchema")
  }
}
