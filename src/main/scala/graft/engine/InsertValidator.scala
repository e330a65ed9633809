package graft.engine

import org.apache.spark.sql.types._

/** Pre-write batch validation with the reference's row/column-addressed
  * error semantics: the whole batch is rejected fail-fast with the
  * first offending row/column, expected vs actual detail.
  * Spec: /root/reference/server/storage/parquet/schema.go:327-630
  * (validateDataAgainstSchema + error structs :33-106) and
  * storage.go:447-465 (whole-batch rejection). */
object InsertValidator {

  final case class ValidationError(
      row: Int, column: String, expected: String, actual: String, value: Any)
    extends IllegalArgumentException(
      s"validation failed for row $row, column '$column': " +
      s"expected $expected, got $actual (value: $value)")

  final case class BatchShapeError(message: String)
    extends IllegalArgumentException(message)

  /** Validate `rows` (positional, matching `columns`) against `schema`.
    * Throws on first violation; returns the row count when valid. */
  def validate(schema: StructType, columns: Seq[String],
               rows: Seq[Seq[Any]]): Int = {
    val fieldByName = schema.fields.map(f => f.name.toLowerCase -> f).toMap
    val fields = columns.map { c =>
      fieldByName.getOrElse(c.toLowerCase,
        throw BatchShapeError(
          s"unknown column '$c' (table has: ${schema.fieldNames.mkString(", ")})"))
    }
    // columns omitted from the batch must be nullable
    val provided = columns.map(_.toLowerCase).toSet
    schema.fields.foreach { f =>
      if (!provided.contains(f.name.toLowerCase) && !f.nullable)
        throw BatchShapeError(s"missing required column '${f.name}'")
    }
    rows.zipWithIndex.foreach { case (row, ri) =>
      if (row.length != columns.length)
        throw BatchShapeError(
          s"row $ri has ${row.length} values, expected ${columns.length}")
      row.lazyZip(fields).foreach { (v, f) =>
        if (v == null) {
          if (!f.nullable)
            throw ValidationError(ri, f.name, s"non-null ${typeName(f.dataType)}",
              "null", "null")
        } else if (!compatible(f.dataType, v)) {
          throw ValidationError(ri, f.name, typeName(f.dataType),
            v.getClass.getSimpleName, v)
        }
      }
    }
    rows.length
  }

  private def typeName(dt: DataType): String =
    graft.types.IcebergTypes.format(dt)

  /** JVM-value ↔ Spark-type compatibility, matching the reference's
    * coarse rules (exact, numeric widening, string). */
  private def compatible(dt: DataType, v: Any): Boolean = (dt, v) match {
    case (BooleanType, _: Boolean) => true
    case (IntegerType, _: Int) => true
    case (IntegerType, _: Short) | (IntegerType, _: Byte) => true
    case (LongType, _: Long) | (LongType, _: Int) => true
    case (FloatType, _: Float) => true
    case (DoubleType, _: Double) | (DoubleType, _: Float) => true
    case (_: DecimalType, _: java.math.BigDecimal) => true
    case (_: DecimalType, _: BigDecimal) => true
    case (StringType, _: String) => true
    case (BinaryType, _: Array[Byte]) => true
    case (DateType, _: java.sql.Date) | (DateType, _: java.time.LocalDate) => true
    case (TimestampType, _: java.sql.Timestamp) |
         (TimestampType, _: java.time.Instant) => true
    case (TimestampNTZType, _: java.time.LocalDateTime) => true
    case (ArrayType(et, _), s: Seq[_]) => s.forall(e => e == null || compatible(et, e))
    case (MapType(kt, vt, _), m: Map[_, _]) =>
      m.forall { case (k, mv) =>
        compatible(kt, k) && (mv == null || compatible(vt, mv)) }
    case (StructType(fs), r: org.apache.spark.sql.Row) if r.length == fs.length =>
      r.toSeq.lazyZip(fs.toSeq).forall((e, f) => e == null || compatible(f.dataType, e))
    case (StructType(fs), r: Seq[_]) if r.length == fs.length =>
      r.lazyZip(fs.toSeq).forall((e, f) => e == null || compatible(f.dataType, e))
    case _ => false
  }
}
