package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.engine.QueryEngine

/** Streaming upsert sink — incremental corpus/table maintenance: a
  * stream of row versions keeps an engine table current via one MERGE
  * per micro-batch (the CDC-apply shape; cf. the reference's
  * append-only chunked ingest, engine.go:635-684 — this is the
  * superset that also REVISES rows).
  *
  * Semantics per micro-batch:
  *  1. collapse in-batch duplicate keys to the LATEST version —
  *     max(struct(orderCol, rest)) per key: one partial-agg shuffle,
  *     deterministic total order (struct comparison breaks orderCol
  *     ties on the remaining columns), and required by MERGE's ANSI
  *     multi-match rule;
  *  2. [[QueryEngine.upsert]]: UPDATE every non-key column on key
  *     match, INSERT on miss.
  *
  * Recovery: foreachBatch is AT-LEAST-ONCE under retries; the merge
  * is IDEMPOTENT by construction (re-applying a batch reproduces the
  * same table state), so checkpoint + replayable source gives
  * effectively-once table contents — the transactional-sink leg of
  * the DocStream recovery contract, supplied by merge idempotence
  * instead of a commit log. The one caveat: a retried batch
  * interleaved with a LATER batch's merge can briefly regress a row
  * to the older version until the later batch replays; per-key
  * monotonicity can be restored by adding `orderCol` to the match
  * condition (upsert-if-newer), at the cost of silently dropping
  * out-of-order revisions.
  */
object UpsertStream {

  /** Collapse to the latest version per key (deterministic). */
  private[graft] def latestPerKey(batch: DataFrame, keyCols: Seq[String],
                                  orderCol: String): DataFrame = {
    val rest = batch.columns.filterNot(keyCols.contains).toSeq
    require(rest.contains(orderCol),
      s"orderCol '$orderCol' must be a non-key column of the batch")
    val packed = rest.sortBy(c => if (c == orderCol) 0 else 1)
    batch.groupBy(keyCols.map(col): _*)
      .agg(max(struct(packed.map(col): _*)).as("__v"))
      .select(keyCols.map(col) ++ rest.map(c => col(s"__v.`$c`").as(c)): _*)
  }

  /** A ready-to-start writer: `.option("checkpointLocation", ...)
    * .start()` it. Column order of the stream must match the table's
    * declared columns by NAME (MERGE resolves by name, not position). */
  def upsertWriter(stream: DataFrame, engine: QueryEngine, table: String,
                   keyCols: Seq[String], orderCol: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      if (!batch.isEmpty)
        engine.upsert(table, latestPerKey(batch, keyCols, orderCol), keyCols)
      ()
    }
}
