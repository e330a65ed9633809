package graft.types

import org.apache.spark.sql.types._

/** The reference's Iceberg-only DDL type system, mapped to Spark.
  *
  * Canonical type list: /root/reference/server/types/iceberg_types.go:13-31.
  * Legacy SQL names (int, varchar, …) are rejected at CREATE TABLE, as in
  * /root/reference/server/query/parser/ast.go:163-169 ("Only Iceberg
  * types are supported"). Nested list/map/struct parsing mirrors
  * iceberg_types.go:377-525 (recursive, top-level-comma aware).
  *
  * Deviations (documented in SURVEY §7.3):
  *  - `time` has no Spark type → LongType (microseconds-of-day);
  *  - `uuid` stored as string (the reference does the same:
  *    parquet/schema.go:169-170).
  */
object IcebergTypes {

  final case class TypeError(message: String) extends
    IllegalArgumentException(message)

  private val decimalRe = """^decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)$""".r

  /** Parse an Iceberg type string to a Spark DataType. Case-insensitive
    * on the type keyword, whitespace-tolerant, arbitrary nesting. */
  def parse(s: String): DataType = {
    val t = s.trim
    t.toLowerCase match {
      case "boolean"     => BooleanType
      case "int32"       => IntegerType
      case "int64"       => LongType
      case "float32"     => FloatType
      case "float64"     => DoubleType
      case "string"      => StringType
      case "binary"      => BinaryType
      case "date"        => DateType
      case "time"        => LongType // micros-of-day; Spark has no TIME
      case "timestamp"   => TimestampNTZType
      case "timestamptz" => TimestampType
      case "uuid"        => StringType
      case lower if lower.startsWith("decimal") =>
        lower match {
          case decimalRe(p, sc) =>
            val (pi, si) = (p.toInt, sc.toInt)
            if (pi <= 0 || pi > 38 || si < 0 || si > pi)
              throw TypeError(s"invalid decimal precision/scale: $t")
            DecimalType(pi, si)
          case _ => throw TypeError(s"invalid decimal type: $t")
        }
      case lower if lower.startsWith("list<") && t.endsWith(">") =>
        ArrayType(parse(inner(t)))
      case lower if lower.startsWith("map<") && t.endsWith(">") =>
        splitTopLevel(inner(t)) match {
          case Seq(k, v) => MapType(parse(k), parse(v))
          case _ => throw TypeError(s"invalid map type: $t")
        }
      case lower if lower.startsWith("struct<") && t.endsWith(">") =>
        val fields = splitTopLevel(inner(t)).map { f =>
          f.split(":", 2) match {
            case Array(n, ft) => StructField(n.trim, parse(ft), nullable = true)
            case _ => throw TypeError(s"invalid struct field: '$f' in $t")
          }
        }
        val names = fields.map(_.name.toLowerCase)
        if (names.distinct.length != names.length)
          throw TypeError(s"duplicate struct field name in: $t")
        if (fields.isEmpty) throw TypeError(s"empty struct type: $t")
        StructType(fields)
      case _ =>
        throw TypeError(
          s"unsupported type '$t': only Iceberg types are supported " +
          "(boolean, int32, int64, float32, float64, decimal(p,s), string, " +
          "binary, date, time, timestamp, timestamptz, uuid, list<T>, " +
          "map<K,V>, struct<name:type,...>)")
    }
  }

  private val fixedRe = """^fixed\(\s*(\d+)\s*\)$""".r

  /** Registry-side (metadata READ path) type parsing: the reference's
    * DDL parser accepts only canonical Iceberg names, but its
    * registry → Iceberg schema conversion is lenient and maps common
    * SQL aliases (`parseRegistryDataType`,
    * /root/reference/server/storage/parquet/schema.go:264-327):
    * integer→int32, bigint→int64, real→float32, double→float64,
    * varchar/text→string, blob→binary, fixed(n)→fixed — so metadata
    * written by an older/foreign registry still round-trips. Mirrored
    * here: [[parse]] stays strict for CREATE TABLE (`varchar` is a
    * rejected DDL type, per iceberg_types_test.go), this entry point
    * serves read-back of stored type strings. `fixed(n)` maps to
    * Spark BinaryType (Spark has no fixed-width binary; the reference
    * maps it to Iceberg FixedType — width is metadata we cannot
    * carry, the value domain is the same). Aliases resolve inside
    * nested list/map/struct too. */
  def parseRegistry(s: String): DataType = {
    val t = s.trim
    t.toLowerCase match {
      case "integer" => IntegerType
      case "bigint"  => LongType
      case "real"    => FloatType
      case "double"  => DoubleType
      case "varchar" | "text" => StringType
      case "blob"    => BinaryType
      case lower if lower.startsWith("fixed") =>
        lower match {
          case fixedRe(n) =>
            if (n.toInt <= 0) throw TypeError(s"invalid fixed length: $t")
            BinaryType
          case _ => throw TypeError(s"invalid fixed type: $t")
        }
      case lower if lower.startsWith("list<") && t.endsWith(">") =>
        ArrayType(parseRegistry(inner(t)))
      case lower if lower.startsWith("map<") && t.endsWith(">") =>
        splitTopLevel(inner(t)) match {
          case Seq(k, v) => MapType(parseRegistry(k), parseRegistry(v))
          case _ => throw TypeError(s"invalid map type: $t")
        }
      case lower if lower.startsWith("struct<") && t.endsWith(">") =>
        StructType(splitTopLevel(inner(t)).map { f =>
          f.split(":", 2) match {
            case Array(n, ft) =>
              StructField(n.trim, parseRegistry(ft), nullable = true)
            case _ => throw TypeError(s"invalid struct field: '$f' in $t")
          }
        })
      case _ => parse(t)
    }
  }

  private val canonicalNames = Set(
    "boolean", "int32", "int64", "float32", "float64", "string",
    "binary", "date", "time", "timestamp", "timestamptz", "uuid")

  /** Canonicalize a STORED type string on read-back: aliases written
    * by an older/foreign registry rewrite to their canonical Iceberg
    * names (`varchar` → `string`), recursively inside nested types.
    * A pure STRING rewrite, deliberately not routed through Spark
    * types: `time`/`uuid`/`fixed(n)` are canonical Iceberg names with
    * no distinct Spark type, so a DataType round-trip would corrupt
    * them (time → int64). Unknown strings pass through untouched —
    * display paths must not throw on someone else's metadata. */
  def canonical(stored: String): String = {
    val t = stored.trim
    val lower = t.toLowerCase
    lower match {
      case "integer"          => "int32"
      case "bigint"           => "int64"
      case "real"             => "float32"
      case "double"           => "float64"
      case "varchar" | "text" => "string"
      case "blob"             => "binary"
      case fixedRe(n)         => s"fixed($n)"
      case decimalRe(p, sc)   => s"decimal($p,$sc)"
      case l if canonicalNames.contains(l) => l
      case l if l.startsWith("list<") && l.endsWith(">") =>
        s"list<${canonical(inner(t))}>"
      case l if l.startsWith("map<") && l.endsWith(">") =>
        splitTopLevel(inner(t)) match {
          case Seq(k, v) => s"map<${canonical(k)}, ${canonical(v)}>"
          case _ => stored
        }
      case l if l.startsWith("struct<") && l.endsWith(">") =>
        splitTopLevel(inner(t)).map { f =>
          f.split(":", 2) match {
            case Array(n, ft) => s"${n.trim}: ${canonical(ft)}"
            case _ => f.trim
          }
        }.mkString("struct<", ", ", ">")
      case _ => stored
    }
  }

  /** Render a Spark DataType back as an Iceberg type string (for SHOW
    * COLUMNS / SHOW CREATE TABLE reference-layout output). */
  def format(dt: DataType): String = dt match {
    case BooleanType      => "boolean"
    case IntegerType      => "int32"
    case LongType         => "int64"
    case FloatType        => "float32"
    case DoubleType       => "float64"
    case StringType       => "string"
    case BinaryType       => "binary"
    case DateType         => "date"
    case TimestampNTZType => "timestamp"
    case TimestampType    => "timestamptz"
    case d: DecimalType   => s"decimal(${d.precision},${d.scale})"
    case ArrayType(e, _)  => s"list<${format(e)}>"
    case MapType(k, v, _) => s"map<${format(k)}, ${format(v)}>"
    case StructType(fs)   =>
      fs.map(f => s"${f.name}: ${format(f.dataType)}").mkString("struct<", ", ", ">")
    case other            => other.simpleString
  }

  private def inner(t: String): String =
    t.substring(t.indexOf('<') + 1, t.length - 1)

  /** Split on commas at nesting depth 0 (angle brackets + parens). */
  private[graft] def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case c @ ('<' | '(') => depth += 1; cur += c
      case c @ ('>' | ')') => depth -= 1; cur += c
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
