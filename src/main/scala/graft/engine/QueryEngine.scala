package graft.engine

import scala.util.matching.Regex
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.types.IcebergTypes

/** The engine facade: statement router + result shaping, mirroring the
  * reference's query engine (/root/reference/server/query/engine.go:
  * 119-144 routing, :253-330 + :913-1022 SHOW layouts, :56-64 keyword
  * blocklist, duckdb/engine.go:395-400 result cap).
  *
  * Spark SQL replaces the DuckDB delegate wholesale: SELECT/INSERT/
  * EXPLAIN go to `spark.sql` (Catalyst optimizes; we never hand-plan),
  * DDL goes through the ranger dialect translator, SHOW statements are
  * served from the Spark catalog but re-shaped to the reference's
  * column layouts. UPDATE/DELETE are copy-on-write rewrites (the
  * reference delegates row-level ops to DuckDB; Iceberg v2 would give
  * them natively — parquet tables get the same semantics by rewrite).
  */
final class QueryEngine(val spark: SparkSession) {

  val executions = new ExecutionManager(spark)

  /** Result cap: duckdb/engine.go:395-400 (truncate + warn). */
  val maxResultRows: Int = 100000

  final case class QueryResult(
      queryId: String,
      columns: Seq[String],
      data: Seq[Seq[Any]],
      rowCount: Long,
      message: String)

  /** Keyword blocklist: server/query/duckdb/engine.go:612-660. */
  private val blockedKeywords = Set(
    "COPY", "ATTACH", "DETACH", "LOAD", "INSTALL", "PRAGMA", "SET",
    "RESET", "CALL", "EXPORT", "IMPORT", "FORCE", "CHECKPOINT", "VACUUM")

  /** Parsed-but-never-routed statements (engine.go:142-143 behavior). */
  private val unsupportedHeads = Set(
    "GRANT", "REVOKE", "BEGIN", "COMMIT", "ROLLBACK", "DECLARE", "OPEN",
    "FETCH", "CLOSE")

  def execute(sql: String): QueryResult = {
    val info = executions.register(sql)
    executions.run(info)(route(rewriteSysFuncs(
      sql.trim.stripSuffix(";").trim), info.id))
  }

  /** Ranger system functions (parser.go:101-104, cases :5741-5747) →
    * Spark built-ins. SYS_TIME matches the reference's HH:mm:ss text. */
  private def rewriteSysFuncs(sql: String): String = sql
    .replaceAll("(?i)\\bSYS_DATE\\b(\\(\\))?", "current_date()")
    .replaceAll("(?i)\\bSYS_TIMESTAMP\\b(\\(\\))?", "current_timestamp()")
    .replaceAll("(?i)\\bSYS_TIME\\b(\\(\\))?",
      "date_format(current_timestamp(), 'HH:mm:ss')")
    .replaceAll("(?i)\\bGENERATE_UUID\\b(\\(\\))?", "uuid()")

  private def head(sql: String): String =
    sql.split("\\s+", 2).headOption.getOrElse("").toUpperCase

  private def route(sql: String, id: String): QueryResult = head(sql) match {
    case h if blockedKeywords.contains(h) =>
      throw new IllegalArgumentException(s"statement type '$h' is not allowed")
    case h if unsupportedHeads.contains(h) =>
      throw new IllegalArgumentException("unsupported statement type")
    case "SELECT" | "WITH" | "VALUES" | "TABLE" => runSelect(sql, id)
    case "EXPLAIN" => runExplain(sql, id)
    case "SHOW" => runShow(sql, id)
    case "DESCRIBE" | "DESC" =>
      // bare DESCRIBE <table> gets the reference's SHOW COLUMNS layout;
      // anything else (DESCRIBE QUERY/EXTENDED) passes through
      val m = """(?is)^DESC(?:RIBE)?\s+(?:TABLE\s+)?([\w.`]+)$""".r
        .findFirstMatchIn(sql)
      m match {
        case Some(t) => showColumns(t.group(1).replace("`", ""), id)
        case None => runSelect(sql, id)
      }
    case "USE" =>
      spark.sql(sql)
      ok(id, s"Database changed")
    case "CREATE" =>
      val upper = sql.toUpperCase
      if (upper.matches("(?s)^CREATE\\s+(DATABASE|NAMESPACE|SCHEMA).*")) {
        spark.sql(sql.replaceAll("(?i)^CREATE\\s+DATABASE", "CREATE NAMESPACE"))
        ok(id, "Database created")
      } else if (upper.matches("(?s)^CREATE\\s+TABLE.*")) {
        val ct = RangerDdl.parse(sql)
        spark.sql(ct.toSparkSql(spark.catalog.currentDatabase))
        ok(id, s"Table ${ct.table} created")
      } else throw new IllegalArgumentException("unsupported statement type")
    case "DROP" =>
      spark.sql(sql)
      ok(id, "Dropped")
    case "ALTER" =>
      // ALTER TABLE … (parser.go:1998-2227): SET TBLPROPERTIES and
      // ADD COLUMNS pass through to Spark; DROP COLUMN is rejected by
      // the v1 parquet catalog, mirroring a schema-evolution boundary
      spark.sql(sql)
      ok(id, "Altered")
    case "INSERT" => runInsert(sql, id)
    case "UPDATE" => runUpdate(sql, id)
    case "DELETE" => runDelete(sql, id)
    case _ =>
      throw new IllegalArgumentException("unsupported statement type")
  }

  private def ok(id: String, msg: String): QueryResult =
    QueryResult(id, Seq.empty, Seq.empty, 0, msg)

  private def toResult(id: String, df: DataFrame, msg: String = ""): QueryResult = {
    // cap at maxResultRows+1 so truncation is detectable without a count
    val rows = df.limit(maxResultRows + 1).collect()
    val (data, message) =
      if (rows.length > maxResultRows)
        (rows.take(maxResultRows),
         s"result truncated to $maxResultRows rows" +
           (if (msg.nonEmpty) s"; $msg" else ""))
      else (rows, msg)
    QueryResult(id, df.columns.toSeq, data.map(_.toSeq).toSeq,
      data.length, message)
  }

  private def runSelect(sql: String, id: String): QueryResult =
    toResult(id, spark.sql(sql))

  private def runExplain(sql: String, id: String): QueryResult =
    toResult(id, spark.sql(sql))

  // ------------------------------------------------------------- INSERT

  private def runInsert(sql: String, id: String): QueryResult = {
    val before = insertTargetCount(sql)
    spark.sql(sql)
    val after = insertTargetCount(sql)
    val n = after.flatMap(a => before.map(b => a - b)).getOrElse(-1L)
    QueryResult(id, Seq.empty, Seq.empty, math.max(n, 0),
      if (n >= 0) s"INSERT $n" else "INSERT")
  }

  private val insertTargetRe: Regex =
    """(?is)^INSERT\s+(?:INTO|OVERWRITE)\s+(?:TABLE\s+)?([\w.`]+)""".r

  private def insertTargetCount(sql: String): Option[Long] =
    insertTargetRe.findFirstMatchIn(sql)
      .map(m => spark.table(m.group(1).replace("`", "")).count())

  /** Programmatic batch-ingestion API (the native-protocol ClientData
    * path, engine.go:635-684): validate against the table schema with
    * ranger-addressed errors, then append. */
  def insertData(table: String, columns: Seq[String],
                 rows: Seq[Seq[Any]]): QueryResult = {
    val info = executions.register(s"INSERT-BATCH $table (${rows.length} rows)")
    executions.run(info) {
      val target = spark.table(table)
      InsertValidator.validate(declaredSchema(table), columns, rows)
      val colIdx = columns.zipWithIndex.toMap
      val ordered = rows.map { r =>
        Row.fromSeq(target.schema.fieldNames.toSeq.map(f =>
          colIdx.get(f).orElse(colIdx.get(f.toLowerCase)).map(r(_)).orNull))
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(ordered.toList), target.schema)
      df.write.insertInto(table)
      QueryResult(info.id, Seq.empty, Seq.empty, rows.length,
        s"INSERT ${rows.length}")
    }
  }

  // ------------------------------------------------- UPDATE / DELETE (CoW)

  private val deleteRe: Regex =
    """(?is)^DELETE\s+FROM\s+([\w.`]+)(?:\s+WHERE\s+(.*))?$""".r
  private val updateRe: Regex =
    """(?is)^UPDATE\s+([\w.`]+)\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?$""".r

  private def runDelete(sql: String, id: String): QueryResult = sql match {
    case deleteRe(table, cond) =>
      val t = table.replace("`", "")
      val src = spark.table(t)
      val keep = Option(cond).map(c => src.where(not(expr(c)))).getOrElse(src.limit(0))
      val n = src.count() - rewrite(t, keep)
      QueryResult(id, Seq.empty, Seq.empty, n, s"DELETE $n")
    case _ => throw new IllegalArgumentException("cannot parse DELETE statement")
  }

  private def runUpdate(sql: String, id: String): QueryResult = sql match {
    case updateRe(table, setList, cond) =>
      val t = table.replace("`", "")
      val src = spark.table(t)
      val assigns = IcebergTypes.splitTopLevel(setList).map { a =>
        a.split("=", 2) match {
          case Array(c, v) => c.trim.replace("`", "") -> v.trim
          case _ => throw new IllegalArgumentException(s"bad SET clause: '$a'")
        }
      }
      val condExpr = Option(cond).map(expr).getOrElse(lit(true))
      val updated = assigns.foldLeft(src) { case (df, (c, v)) =>
        df.withColumn(c, when(condExpr, expr(v).cast(src.schema(c).dataType))
          .otherwise(col(c)))
      }
      val n = src.where(condExpr).count()
      rewrite(t, updated)
      QueryResult(id, Seq.empty, Seq.empty, n, s"UPDATE $n")
    case _ => throw new IllegalArgumentException("cannot parse UPDATE statement")
  }

  /** Copy-on-write: materialize the surviving rows (localCheckpoint cuts
    * the lineage back to the table being overwritten), then overwrite.
    * At warehouse scale this is what Iceberg/Delta do per-file; here it
    * is per-table, which matches the reference's whole-table semantics. */
  private def rewrite(table: String, df: DataFrame): Long = {
    val materialized = df.localCheckpoint(true)
    val n = materialized.count()
    materialized.write.mode("overwrite").insertInto(table)
    n
  }

  // ------------------------------------------------------------- SHOW

  private val showColumnsRe: Regex =
    """(?is)^SHOW\s+COLUMNS\s+FROM\s+([\w.`]+)$""".r
  private val showCreateRe: Regex =
    """(?is)^SHOW\s+CREATE\s+TABLE\s+([\w.`]+)$""".r
  private val showTablesRe: Regex =
    """(?is)^SHOW\s+TABLES(?:\s+FROM\s+([\w`]+))?$""".r

  private def runShow(sql: String, id: String): QueryResult = sql match {
    case showColumnsRe(table) => showColumns(table.replace("`", ""), id)
    case showCreateRe(table)  => showCreateTable(table.replace("`", ""), id)
    case showTablesRe(db) =>
      // reference layout: single column "Table" + count message
      // (engine_test.go / engine.go:913-951)
      val database = Option(db).map(_.replace("`", ""))
        .getOrElse(spark.catalog.currentDatabase)
      val names = spark.sql(s"SHOW TABLES IN `$database`")
        .select(col("tableName")).collect().map(_.getString(0)).sorted
      QueryResult(id, Seq("Table"), names.map(Seq[Any](_)).toSeq, names.length,
        s"Found ${names.length} table(s) in database $database")
    case s if s.toUpperCase.startsWith("SHOW DATABASES") ||
              s.toUpperCase.startsWith("SHOW NAMESPACES") =>
      // reference layout: single column "database" (engine.go:253-330)
      val names = spark.sql("SHOW NAMESPACES").collect()
        .map(_.getString(0)).sorted
      QueryResult(id, Seq("database"), names.map(Seq[Any](_)).toSeq,
        names.length, s"Found ${names.length} database(s)")
    case _ =>
      throw new IllegalArgumentException("unsupported statement type")
  }

  private def tableProps(table: String): Map[String, String] = {
    spark.sql(s"SHOW TBLPROPERTIES $table").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
  }

  /** Runtime schema with the declared nullability restored (Spark's
    * parquet catalog erases NOT NULL on read; the dialect records it in
    * graft.notnull). */
  private def declaredSchema(table: String): org.apache.spark.sql.types.StructType = {
    val schema = spark.table(table).schema
    val notNull = tableProps(table).get("graft.notnull")
      .map(_.split(",").toSet).getOrElse(Set.empty)
    org.apache.spark.sql.types.StructType(schema.fields.map(f =>
      if (notNull.contains(f.name)) f.copy(nullable = false) else f))
  }

  /** Reference 7-column layout: Field/Type/Null/Key/Unique/Default/Extra
    * (engine.go:952-1002; engine_test.go SHOW COLUMNS). Types render as
    * Iceberg names; original column order restored from properties
    * (Spark moves partition columns to the end). */
  private def showColumns(table: String, id: String): QueryResult = {
    val schema = declaredSchema(table)
    val props = tableProps(table)
    val order = props.get("graft.columns")
      .map(_.split(",").toSeq).getOrElse(schema.fieldNames.toSeq)
    val pks = props.get("graft.primarykey").map(_.split(",").toSet)
      .getOrElse(Set.empty)
    val uniques = props.get("graft.unique").map(_.split(",").toSet)
      .getOrElse(Set.empty)
    val rows = order.flatMap { name =>
      schema.fields.find(_.name == name).map { f =>
        val icebergType = props.getOrElse(s"graft.type.${f.name}",
          IcebergTypes.format(f.dataType))
        Seq[Any](
          f.name,
          icebergType,
          if (f.nullable) "YES" else "NO",
          if (pks.contains(f.name)) "PRI" else "",
          if (uniques.contains(f.name)) "YES" else "",
          f.getCurrentDefaultValue().getOrElse(""),
          "")
      }
    }
    QueryResult(id,
      Seq("Field", "Type", "Null", "Key", "Unique", "Default", "Extra"),
      rows, rows.length, s"Found ${rows.length} column(s)")
  }

  /** Reference layout: columns Table / Create Table with regenerated
    * ranger-dialect DDL (engine.go:1004-1022). */
  private def showCreateTable(table: String, id: String): QueryResult = {
    val schema = declaredSchema(table)
    val props = tableProps(table)
    val order = props.get("graft.columns")
      .map(_.split(",").toSeq).getOrElse(schema.fieldNames.toSeq)
    val pks = props.get("graft.primarykey").map(_.split(",").toSet)
      .getOrElse(Set.empty)
    val uniques = props.get("graft.unique").map(_.split(",").toSet)
      .getOrElse(Set.empty)
    val cols = order.flatMap { name =>
      schema.fields.find(_.name == name).map { f =>
        val t = props.getOrElse(s"graft.type.${f.name}",
          IcebergTypes.format(f.dataType))
        val nn = if (!f.nullable) " NOT NULL" else ""
        val uq = if (uniques.contains(f.name)) " UNIQUE" else ""
        val pk = if (pks.contains(f.name)) " PRIMARY KEY" else ""
        s"    ${f.name} $t$nn$uq$pk"
      }
    }
    val storage = props.getOrElse("graft.storage", "filesystem")
    val bare = table.split("\\.").last
    val settings = props.collect {
      case (k, v) if k.startsWith("graft.settings.") =>
        s"${k.stripPrefix("graft.settings.")}=$v"
    }.toSeq.sorted
    val ddl = new StringBuilder(s"CREATE TABLE $bare (\n")
    ddl ++= cols.mkString(",\n")
    ddl ++= s"\n) STORAGE ${storage.toUpperCase}"
    props.get("graft.orderby").foreach(o => ddl ++= s" ORDER BY (${o})")
    if (settings.nonEmpty) ddl ++= s" SETTINGS ${settings.mkString(", ")}"
    QueryResult(id, Seq("Table", "Create Table"),
      Seq(Seq[Any](bare, ddl.toString)), 1, "")
  }
}
