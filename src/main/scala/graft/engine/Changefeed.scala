package graft.engine

import java.util.concurrent.ConcurrentHashMap
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Durable CDC changefeed — the registry side of the reference's
  * "Astha" subsystem (server/astha/README.md architecture diagram;
  * cdc_consumer.go polls a SQLite `__cdc_log` table populated by
  * triggers; event_store.go buffers events for distribution).
  *
  * Spark-first re-expression: there is no SQLite registry to put
  * triggers on — catalog mutations flow through [[QueryEngine]], so
  * the engine itself appends one small JSON file per event under
  * `<warehouse>/.graft-cdc/`. That file-per-event layout is chosen
  * deliberately:
  *   - appends are atomic at file granularity (write temp + rename),
  *     so a concurrent reader never sees a torn event;
  *   - Structured Streaming's file source tails NEW FILES natively —
  *     `Changefeed.readStream` is a zero-custom-code streaming view
  *     of the registry, the analog of subscribing to Astha;
  *   - metadata-rate traffic (DDL/DML statements, not rows) keeps the
  *     directory small, and processed events are deleted by the
  *     scheduler's cleanup exactly like the reference's "immediate
  *     cleanup for processed events".
  *
  * Event shape mirrors astha/types.go Event[T]: id, table (registry
  * table name: "tables", "databases", "table_files"), operation
  * (INSERT/UPDATE/DELETE), data payload, timestamp.
  */
object Changefeed {

  final case class CdcEvent(id: Long, table: String, operation: String,
                            data: Map[String, String], timestampMs: Long)

  /** Registry tables the reference's CDC covers (astha/README.md
    * component example switches on "tables" / "table_files"). */
  val TableTables = "tables"
  val TableDatabases = "databases"
  val TableFiles = "table_files"

  def enabled(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.cdc.enabled").forall(_.toBoolean)

  def dir(spark: SparkSession): Path =
    new Path(new Path(spark.conf.get("spark.sql.warehouse.dir")), ".graft-cdc")

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  // one id sequence per warehouse; initialized from the log's max id
  // so a restarted server continues the sequence (the reference gets
  // this from SQLite AUTOINCREMENT)
  private val sequences = new ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()

  private def nextId(spark: SparkSession, fs: FileSystem, d: Path): Long =
    sequences.computeIfAbsent(d.toString, _ => {
      val max =
        if (!fs.exists(d)) 0L
        else fs.listStatus(d).iterator.map(_.getPath.getName)
          .collect { case EventFileRe(id) => id.toLong }
          .foldLeft(0L)(math.max)
      new java.util.concurrent.atomic.AtomicLong(max)
    }).incrementAndGet()

  private val EventFileRe = """evt-(\d+)\.json""".r

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")

  /** Append one event to the log. Called by [[QueryEngine]] after each
    * successful catalog/data mutation; also invalidates the
    * system-tables metadata cache for the touched identifier (the
    * reference's schema cache learns of changes the same way —
    * storage/schema/astha_subscriber.go consumes these events). */
  def emit(spark: SparkSession, table: String, operation: String,
           data: Map[String, String]): Unit = {
    if (!enabled(spark)) return
    val d = dir(spark)
    val fs = fsOf(spark, d)
    if (!fs.exists(d)) fs.mkdirs(d)
    val id = nextId(spark, fs, d)
    val json = {
      val fields = data.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
        .mkString("{", ",", "}")
      s"""{"id":$id,"table":"${esc(table)}","operation":"${esc(operation)}","data":$fields,"timestamp_ms":${System.currentTimeMillis()}}"""
    }
    // temp + rename: the streaming file source and the poller must
    // never observe a half-written event
    val tmp = new Path(d, s".evt-$id.json.tmp")
    val out = fs.create(tmp, true)
    out.write(json.getBytes("UTF-8"))
    out.close()
    fs.rename(tmp, new Path(d, f"evt-$id%016d.json"))
  }

  // --------------------------------------------------------------- read

  private val idRe = """"id":(\d+)""".r
  private val tableRe = """"table":"((?:[^"\\]|\\.)*)"""".r
  private val opRe = """"operation":"((?:[^"\\]|\\.)*)"""".r
  private val tsRe = """"timestamp_ms":(\d+)""".r
  private val dataRe = """(?s)"data":\{(.*?)\},"timestamp_ms"""".r
  private val kvRe = """"((?:[^"\\]|\\.)*)":"((?:[^"\\]|\\.)*)"""".r

  private def unesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); case 'r' => sb.append('\r')
          case 't' => sb.append('\t'); case c => sb.append(c)
        }
        i += 2
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  private def parse(txt: String): Option[CdcEvent] =
    for {
      id <- idRe.findFirstMatchIn(txt).map(_.group(1).toLong)
      tb <- tableRe.findFirstMatchIn(txt).map(m => unesc(m.group(1)))
      op <- opRe.findFirstMatchIn(txt).map(m => unesc(m.group(1)))
      ts <- tsRe.findFirstMatchIn(txt).map(_.group(1).toLong)
    } yield CdcEvent(id, tb, op,
      dataRe.findFirstMatchIn(txt).map(m =>
        kvRe.findAllMatchIn(m.group(1))
          .map(kv => unesc(kv.group(1)) -> unesc(kv.group(2))).toMap)
        .getOrElse(Map.empty),
      ts)

  /** Events with id > sinceId, oldest first, at most `limit` — the
    * poller's read (cdc_consumer.go GetEvents, batch-bounded).
    * Driver-side: the log is metadata-rate, never data-scale. */
  def events(spark: SparkSession, sinceId: Long = 0L,
             limit: Int = 256): Seq[CdcEvent] = {
    val d = dir(spark)
    val fs = fsOf(spark, d)
    if (!fs.exists(d)) return Seq.empty
    fs.listStatus(d).iterator
      .flatMap(st => st.getPath.getName match {
        case EventFileRe(id) if id.toLong > sinceId => Some((id.toLong, st.getPath))
        case _ => None
      })
      .toSeq.sortBy(_._1).take(limit)
      .flatMap { case (_, p) =>
        val txt = new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(fs.open(p)), "UTF-8")
        parse(txt)
      }
  }

  /** Highest id currently in the log (0 when empty). */
  def maxId(spark: SparkSession): Long = {
    val d = dir(spark)
    val fs = fsOf(spark, d)
    if (!fs.exists(d)) return 0L
    fs.listStatus(d).iterator.map(_.getPath.getName)
      .collect { case EventFileRe(id) => id.toLong }
      .foldLeft(0L)(math.max)
  }

  /** Delete events with id <= upToId — the scheduler's "immediate
    * cleanup for processed events" (astha/README.md). */
  def cleanup(spark: SparkSession, upToId: Long): Int = {
    val d = dir(spark)
    val fs = fsOf(spark, d)
    if (!fs.exists(d)) return 0
    val doomed = fs.listStatus(d).iterator.flatMap(st =>
      st.getPath.getName match {
        case EventFileRe(id) if id.toLong <= upToId => Some(st.getPath)
        case _ => None
      }).toSeq
    doomed.foreach(p => fs.delete(p, false))
    doomed.length
  }

  val schema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("table", StringType),
    StructField("operation", StringType),
    StructField("data", MapType(StringType, StringType)),
    StructField("timestamp_ms", LongType)))

  /** The changefeed as a Structured Streaming source: every new
    * registry event arrives as a row. This is the Spark-native way to
    * "subscribe" at data scale — watermark/window/join it like any
    * stream; the [[graft.streaming.AsthaScheduler]] callback path
    * exists for driver-side components (cache invalidation). */
  def readStream(spark: SparkSession): DataFrame = {
    val d = dir(spark)
    val fs = fsOf(spark, d)
    if (!fs.exists(d)) fs.mkdirs(d)
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 256) // reference batch size
      .json(d.toString)
  }

  /** Batch view of the current log for `system.cdc_log`. */
  def view(spark: SparkSession): DataFrame = {
    val rows = events(spark, 0L, Int.MaxValue).map(e =>
      Row(e.id, e.table, e.operation,
        e.data.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(","),
        new java.sql.Timestamp(e.timestampMs)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("event_id", LongType),
        StructField("table_name", StringType),
        StructField("operation", StringType),
        StructField("data", StringType),
        StructField("created_at", TimestampType))))
  }
}
