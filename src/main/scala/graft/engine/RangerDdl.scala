package graft.engine

import graft.types.IcebergTypes
import org.apache.spark.sql.types.StructType

/** Hand parser for the reference's CREATE TABLE dialect:
  *
  *   CREATE TABLE [IF NOT EXISTS] [db.]t (
  *     name <iceberg-type> [NOT NULL] [UNIQUE] [DEFAULT <lit>] [PRIMARY KEY],
  *     ...
  *   ) [STORAGE {filesystem|memory|s3}]
  *     [PARTITION BY (col, ...)]
  *     [ORDER BY (col, ...)]
  *     [SETTINGS k=v, ...]
  *
  * Grammar spec: /root/reference/server/query/parser/parser.go:3411-3624
  * (statement), :6018-6228 (STORAGE/PARTITION BY/ORDER BY/SETTINGS
  * clauses), column constraints :3741-3941. Only Iceberg types are
  * accepted (ast.go:163-169) — see [[graft.types.IcebergTypes]].
  *
  * The translation target is Spark DDL (`USING parquet` — this build
  * has no Iceberg runtime jar; the table format is a catalog property
  * away). Constraints Spark does not enforce (UNIQUE, PRIMARY KEY) and
  * ranger-specific clauses (STORAGE, SETTINGS, ORDER BY) are recorded
  * as `graft.*` table properties, mirroring how the reference stores
  * them in its registry rather than enforcing them in the engine.
  */
object RangerDdl {

  final case class ParseError(message: String)
    extends IllegalArgumentException(message)

  final case class ColumnDef(
      name: String,
      icebergType: String,
      notNull: Boolean,
      unique: Boolean,
      default: Option[String],
      primaryKey: Boolean)

  final case class CreateTable(
      database: Option[String],
      table: String,
      ifNotExists: Boolean,
      columns: Seq[ColumnDef],
      storage: String,
      partitionBy: Seq[String],
      orderBy: Seq[String],
      settings: Map[String, String]) {

    def qualified(defaultDb: Option[String]): String =
      database.orElse(defaultDb) match {
        case Some(db) => s"`$db`.`$table`"
        case None => s"`$table`" // session's current database applies
      }

    def sparkSchema: StructType = StructType(columns.map(c =>
      org.apache.spark.sql.types.StructField(
        c.name, IcebergTypes.parse(c.icebergType), nullable = !c.notNull)))

    /** Spark DDL equivalent. */
    def toSparkSql(defaultDb: String): String = toSparkSql(Some(defaultDb))

    def toSparkSql(defaultDb: Option[String]): String =
      toSparkSql(defaultDb, s3Base = None)

    /** `s3Base` (e.g. `s3a://bucket/warehouse`) supplies the external
      * location for STORAGE s3 tables — the Spark mapping of the
      * reference's S3 engine (server/storage/s3/fs.go): same DDL, the
      * table's files live under the object store via the s3a Hadoop
      * connector instead of a bespoke S3 filesystem layer. */
    def toSparkSql(defaultDb: Option[String], s3Base: Option[String]): String = {
      val colsSql = columns.map { c =>
        val t = IcebergTypes.parse(c.icebergType).sql
        val nn = if (c.notNull) " NOT NULL" else ""
        val dv = c.default.map(d => s" DEFAULT $d").getOrElse("")
        s"`${c.name}` $t$nn$dv"
      }.mkString(", ")
      val ine = if (ifNotExists) "IF NOT EXISTS " else ""
      val part =
        if (partitionBy.isEmpty) ""
        else partitionBy.mkString(" PARTITIONED BY (", ", ", ")")
      val props = Seq(
        Some("graft.storage" -> storage),
        Some("graft.columns" -> columns.map(_.name).mkString(",")),
        {
          // Spark's parquet catalog erases nullability on read; record
          // NOT NULL here so the engine can keep enforcing it
          val nn = columns.filter(_.notNull).map(_.name)
          if (nn.nonEmpty) Some("graft.notnull" -> nn.mkString(",")) else None
        },
        if (orderBy.nonEmpty) Some("graft.orderby" -> orderBy.mkString(",")) else None,
        {
          val uniques = columns.filter(_.unique).map(_.name)
          if (uniques.nonEmpty) Some("graft.unique" -> uniques.mkString(",")) else None
        },
        {
          val pks = columns.filter(_.primaryKey).map(_.name)
          if (pks.nonEmpty) Some("graft.primarykey" -> pks.mkString(",")) else None
        }
      ).flatten ++
        columns.map(c => s"graft.type.${c.name}" -> c.icebergType) ++
        settings.toSeq.sortBy(_._1).map { case (k, v) => s"graft.settings.$k" -> v } ++
        // SETTINGS compression=<codec> becomes a real writer property
        // (codec list: reference parquet/compression.go:21-107)
        settings.get("compression").map { codec =>
          val c = codec.toLowerCase
          "parquet.compression" -> (if (c == "none") "uncompressed" else c)
        }
      val propsSql = props
        .map { case (k, v) => s"'$k'='${v.replace("'", "''")}'" }
        .mkString(" TBLPROPERTIES (", ", ", ")")
      val location = (storage, s3Base) match {
        case ("s3", Some(base)) =>
          val db = database.orElse(defaultDb).getOrElse("default")
          s" LOCATION '${base.stripSuffix("/")}/$db/$table'"
        case ("s3", None) =>
          throw ParseError(
            "STORAGE s3 requires spark.graft.s3.bucket (s3a:// base URI) " +
            "and the hadoop-aws connector on the classpath")
        case _ => ""
      }
      s"CREATE TABLE $ine${qualified(defaultDb)} ($colsSql) USING parquet$part$location$propsSql"
    }
  }

  private val headerRe =
    """(?is)^\s*CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([A-Za-z_][\w]*)(?:\.([A-Za-z_][\w]*))?\s*\(""".r

  private val constraintRe =
    """(?i)\b(NOT\s+NULL|UNIQUE|DEFAULT|PRIMARY\s+KEY)\b""".r

  def parse(sql: String): CreateTable = {
    val stmt = sql.trim.stripSuffix(";").trim
    val m = headerRe.findFirstMatchIn(stmt).getOrElse(
      throw ParseError(s"not a CREATE TABLE statement: ${stmt.take(60)}"))
    val ifNotExists = m.group(1) != null
    val (db, table) =
      if (m.group(3) != null) (Some(m.group(2)), m.group(3))
      else (None, m.group(2))

    // find the matching close paren of the column list
    val openIdx = m.end - 1
    var depth = 0
    var closeIdx = -1
    var i = openIdx
    while (i < stmt.length && closeIdx < 0) {
      stmt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) closeIdx = i
        case _ =>
      }
      i += 1
    }
    if (closeIdx < 0) throw ParseError("unbalanced parentheses in column list")
    val colsBody = stmt.substring(openIdx + 1, closeIdx)
    val tail = stmt.substring(closeIdx + 1)

    val columns = IcebergTypes.splitTopLevel(colsBody).map(parseColumn)
    if (columns.isEmpty)
      throw ParseError("CREATE TABLE requires at least one column")
    val names = columns.map(_.name.toLowerCase)
    if (names.distinct.length != names.length)
      throw ParseError(s"duplicate column name in: ${names.mkString(", ")}")

    val (storage, partitionBy, orderBy, settings) = parseTail(tail)
    settings.get("compression").foreach { codec =>
      // codec list: reference parquet/compression.go:21-107
      if (!Set("none", "uncompressed", "snappy", "gzip", "brotli",
               "lz4", "zstd").contains(codec.toLowerCase))
        throw ParseError(s"unsupported compression codec: $codec")
    }
    CreateTable(db, table, ifNotExists, columns, storage, partitionBy,
      orderBy, settings)
  }

  private def parseColumn(def0: String): ColumnDef = {
    val d = def0.trim
    val sp = d.indexWhere(_.isWhitespace)
    if (sp < 0) throw ParseError(s"column definition needs a type: '$d'")
    val name = d.substring(0, sp)
    if (!name.matches("[A-Za-z_][\\w]*"))
      throw ParseError(s"invalid column name: '$name'")
    val rest = d.substring(sp + 1).trim
    // the type runs until the first constraint keyword (constraint
    // keywords cannot appear inside <...> or (...) of a type)
    val cm = constraintRe.findFirstMatchIn(rest)
    val (typeStr, consStr) = cm match {
      case Some(c) => (rest.substring(0, c.start).trim, rest.substring(c.start))
      case None    => (rest, "")
    }
    if (typeStr.isEmpty) throw ParseError(s"column '$name' needs a type")
    IcebergTypes.parse(typeStr) // validates; throws TypeError w/ detail

    var notNull = false; var unique = false; var pk = false
    var default: Option[String] = None
    var remaining = consStr.trim
    while (remaining.nonEmpty) {
      val lower = remaining.toLowerCase
      if (lower.startsWith("not null")) {
        notNull = true; remaining = remaining.substring(8).trim
      } else if (lower.startsWith("unique")) {
        unique = true; remaining = remaining.substring(6).trim
      } else if (lower.startsWith("primary key")) {
        pk = true; notNull = true; remaining = remaining.substring(11).trim
      } else if (lower.startsWith("default")) {
        val after = remaining.substring(7).trim
        val end = constraintRe.findFirstMatchIn(after).map(_.start)
          .getOrElse(after.length)
        val lit = after.substring(0, end).trim
        if (lit.isEmpty) throw ParseError(s"DEFAULT needs a value (column '$name')")
        default = Some(lit)
        remaining = after.substring(end).trim
      } else {
        throw ParseError(s"unexpected token in column '$name': '$remaining'")
      }
    }
    ColumnDef(name, typeStr, notNull, unique, default, pk)
  }

  private val storageRe = """(?is)^\s*STORAGE\s+([A-Za-z_]\w*)""".r
  private val partitionRe = """(?is)^\s*PARTITION\s+BY\s*\(([^)]*)\)""".r
  private val orderRe = """(?is)^\s*ORDER\s+BY\s*\(([^)]*)\)""".r
  private val settingsRe = """(?is)^\s*SETTINGS\s+(.*)$""".r

  private def parseTail(tail0: String)
      : (String, Seq[String], Seq[String], Map[String, String]) = {
    var tail = tail0.trim
    var storage = "filesystem" // reference default: storage.go:133-164
    var partitionBy = Seq.empty[String]
    var orderBy = Seq.empty[String]
    var settings = Map.empty[String, String]
    while (tail.nonEmpty) {
      storageRe.findFirstMatchIn(tail) match {
        case Some(m) =>
          storage = m.group(1).toLowerCase
          if (!Set("filesystem", "memory", "s3").contains(storage))
            throw ParseError(s"unknown STORAGE engine: $storage")
          tail = tail.substring(m.end).trim
        case None => partitionRe.findFirstMatchIn(tail) match {
          case Some(m) =>
            partitionBy = m.group(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
            tail = tail.substring(m.end).trim
          case None => orderRe.findFirstMatchIn(tail) match {
            case Some(m) =>
              orderBy = m.group(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
              tail = tail.substring(m.end).trim
            case None => settingsRe.findFirstMatchIn(tail) match {
              case Some(m) =>
                settings = m.group(1).split(",").map(_.trim).filter(_.nonEmpty)
                  .map { kv =>
                    kv.split("=", 2) match {
                      case Array(k, v) => k.trim -> v.trim
                      case _ => throw ParseError(s"invalid SETTINGS entry: '$kv'")
                    }
                  }.toMap
                tail = ""
              case None =>
                throw ParseError(s"unexpected clause after column list: '${tail.take(40)}'")
            }
          }
        }
      }
    }
    (storage, partitionBy, orderBy, settings)
  }
}
