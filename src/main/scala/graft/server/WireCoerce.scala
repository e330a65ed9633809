package graft.server

import scala.util.control.NonFatal

/** Schema-driven string → JVM-value conversion for an ingestion
  * block (the reference converts by the table's Arrow schema,
  * storage/parquet/schema.go). Unparseable values pass through as
  * strings so InsertValidator reports its row/column-addressed
  * error instead of a bare NumberFormatException. Shared by the
  * native ClientData path and pg-wire COPY FROM STDIN. */
object WireCoerce {
  def apply(spark: org.apache.spark.sql.SparkSession, table: String,
            columns: Seq[String], rows: Seq[Seq[String]]): Seq[Seq[Any]] = {
    import org.apache.spark.sql.types._
    val schema = spark.table(table).schema
    val types: Seq[Option[DataType]] =
      columns.map(c => schema.find(_.name.equalsIgnoreCase(c)).map(_.dataType))
    def conv(v: String, t: Option[DataType]): Any =
      if (v == null || v == "NULL" || v == "<nil>") null
      else t match {
        case Some(dt) =>
          try dt match {
            case IntegerType => v.toInt
            case LongType => v.toLong
            case FloatType => v.toFloat
            case DoubleType => v.toDouble
            case BooleanType => v.toBoolean
            case _: DecimalType => new java.math.BigDecimal(v)
            case DateType => java.sql.Date.valueOf(v)
            case TimestampType => java.sql.Timestamp.valueOf(v)
            case TimestampNTZType =>
              java.time.LocalDateTime.parse(v.replace(' ', 'T'))
            case _ => v
          } catch { case NonFatal(_) => v }
        case None => v // unknown column: validator reports it
      }
    rows.map(_.lazyZip(types).map(conv))
  }
}
