package graft.sources

import java.io.File
import scala.jdk.CollectionConverters._
import org.apache.avro.Schema
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro file source (the reference ships Avro test fixtures —
  * SURVEY §2.1 "File formats present in tests"; the spark-avro module
  * is not in this container, so this reads via the bundled avro-1.12
  * jar: schema from the file header, one task per file, GenericRecord
  * → Row conversion on executors).
  *
  * Scale notes: parallelism = one partition per file (Avro's natural
  * split is the file/block); schema is shipped as its JSON string and
  * re-parsed per executor (avro Schema holds non-serializable state);
  * records convert directly to Rows without a driver round-trip. */
object AvroSource {

  def read(spark: SparkSession, path: String): DataFrame = {
    val files = listAvroFiles(path)
    require(files.nonEmpty, s"no .avro files under $path")
    val avroSchema = headerSchema(files.head)
    val sparkSchema = toSparkType(avroSchema).asInstanceOf[StructType]
    val schemaJson = avroSchema.toString
    val rdd = spark.sparkContext
      .parallelize(files.map(_.getAbsolutePath), files.length)
      .flatMap { f =>
        val schema = new Schema.Parser().parse(schemaJson)
        val reader = new DataFileReader[GenericRecord](
          new File(f), new GenericDatumReader[GenericRecord](schema))
        try {
          val out = scala.collection.mutable.ArrayBuffer.empty[Row]
          while (reader.hasNext) out += toRow(reader.next(), schema)
          out
        } finally reader.close()
      }
    spark.createDataFrame(rdd, sparkSchema)
  }

  private def listAvroFiles(path: String): Seq[File] = {
    val f = new File(path)
    if (f.isFile) Seq(f)
    else Option(f.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".avro")).sortBy(_.getName).toSeq
  }

  private def headerSchema(f: File): Schema = {
    val r = new DataFileReader[GenericRecord](f,
      new GenericDatumReader[GenericRecord]())
    try r.getSchema finally r.close()
  }

  /** Avro → Spark type mapping (nullable via [null, T] unions; logical
    * date/timestamp types honored; enum/fixed → string/binary). */
  private[sources] def toSparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.toSeq.map { f =>
        val (dt, nullable) = fieldType(f.schema())
        StructField(f.name(), dt, nullable)
      })
    case Schema.Type.ARRAY =>
      val (dt, nullable) = fieldType(s.getElementType)
      ArrayType(dt, containsNull = nullable)
    case Schema.Type.MAP =>
      val (dt, nullable) = fieldType(s.getValueType)
      MapType(StringType, dt, valueContainsNull = nullable)
    case Schema.Type.ENUM | Schema.Type.STRING => StringType
    case Schema.Type.FIXED | Schema.Type.BYTES => BinaryType
    case Schema.Type.INT =>
      if (logical(s) == "date") DateType else IntegerType
    case Schema.Type.LONG => logical(s) match {
      case "timestamp-micros" | "timestamp-millis" => TimestampType
      case _ => LongType
    }
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.NULL => NullType
    case Schema.Type.UNION =>
      fieldType(s)._1
  }

  private def logical(s: Schema): String =
    Option(s.getLogicalType).map(_.getName).getOrElse("")

  /** (type, nullable) for a possibly-union schema. */
  private def fieldType(s: Schema): (DataType, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      val nullable = branches.exists(_.getType == Schema.Type.NULL)
      nonNull match {
        case Seq(one) => (toSparkType(one), nullable)
        case _ => (StringType, nullable) // mixed union → stringify
      }
    } else (toSparkType(s), false)

  private def toRow(rec: GenericRecord, schema: Schema): Row =
    Row.fromSeq(schema.getFields.asScala.toSeq.map(f =>
      convert(rec.get(f.name()), unwrap(f.schema()))))

  private def unwrap(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s

  private def convert(v: Any, s: Schema): Any = v match {
    case null => null
    case r: GenericRecord => toRow(r, unwrap(s))
    case u: org.apache.avro.util.Utf8 => u.toString
    case e: org.apache.avro.generic.GenericEnumSymbol[_] => e.toString
    case b: java.nio.ByteBuffer =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case fx: org.apache.avro.generic.GenericFixed => fx.bytes()
    case l: java.util.List[_] =>
      val et = unwrap(s.getElementType)
      l.asScala.toSeq.map(convert(_, et))
    case m: java.util.Map[_, _] =>
      val vt = unwrap(s.getValueType)
      m.asScala.map { case (k, mv) => k.toString -> convert(mv, vt) }.toMap
    case i: java.lang.Integer if logical(s) == "date" =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
    case l: java.lang.Long if logical(s) == "timestamp-micros" =>
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        l / 1000000L, (l % 1000000L) * 1000L))
    case l: java.lang.Long if logical(s) == "timestamp-millis" =>
      new java.sql.Timestamp(l)
    case other => other
  }
}
