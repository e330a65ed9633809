package graft.engine

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Table snapshots + time travel without the Iceberg runtime — the
  * no-jar fallback for the reference's native table format
  * (Iceberg v2 snapshots/metadata: server/storage/storage.go:749-787,
  * server/metadata/iceberg/manager.go:120-234).
  *
  * Semantics: before every DESTRUCTIVE rewrite (UPDATE / DELETE /
  * ALTER COLUMN / DROP COLUMN) the engine archives the table's
  * current files plus its schema under
  * `<warehouse>/.graft-snapshots/<db>.<table>/<id>/`. Old versions
  * stay queryable via `SELECT ... FROM t VERSION AS OF <id>` and
  * enumerable via `SHOW SNAPSHOTS FROM t`.
  *
  * Scale note, stated plainly: this copies the affected table's files
  * per destructive op (the no-metadata-format CoW tax). Iceberg gets
  * the same semantics for free from immutable files + manifests; when
  * the runtime jar is present the dialect's tables swap to
  * `USING iceberg` and this module retires. Appends (INSERT) do not
  * snapshot — they do not destroy state.
  */
object Snapshots {

  /** Disable with spark.graft.snapshots.enabled=false. */
  def enabled(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.snapshots.enabled").forall(_.toBoolean)

  private def base(spark: SparkSession, db: String, table: String): Path =
    new Path(new Path(spark.conf.get("spark.sql.warehouse.dir")),
      s".graft-snapshots/$db.$table")

  private def resolve(spark: SparkSession, t: String): (String, String, Path) = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(t)
    val db = ident.database.getOrElse(spark.catalog.currentDatabase)
    val meta = spark.sessionState.catalog.getTableMetadata(ident)
    (db, ident.table, new Path(meta.location))
  }

  /** Archive the table's current state; returns the snapshot id. */
  def create(spark: SparkSession, t: String, operation: String): Long = {
    val (db, table, loc) = resolve(spark, t)
    val conf = spark.sessionState.newHadoopConf()
    val fs = loc.getFileSystem(conf)
    val root = base(spark, db, table)
    val id = nextId(spark, db, table)
    val target = new Path(root, id.toString)
    fs.mkdirs(target)
    // copy the table directory (immutable snapshot of the data files)
    FileUtil.copy(fs, loc, fs, new Path(target, "data"), false, conf)
    // schema at snapshot time: ALTER COLUMN changes types later, so
    // the archived files must be read with the schema they were
    // written under
    val manifest =
      s"""{"id":$id,"operation":"${operation}",
         |"created_at":${System.currentTimeMillis()},
         |"schema":${compactJson(spark.table(t).schema)}}""".stripMargin
    val out = fs.create(new Path(target, "MANIFEST.json"), true)
    out.write(manifest.getBytes("UTF-8"))
    out.close()
    id
  }

  private def compactJson(schema: StructType): String = schema.json

  private def nextId(spark: SparkSession, db: String, table: String): Long = {
    val root = base(spark, db, table)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) 1L
    else fs.listStatus(root).map(_.getPath.getName)
      .flatMap(n => scala.util.Try(n.toLong).toOption)
      .maxOption.getOrElse(0L) + 1L
  }

  final case class SnapshotInfo(id: Long, operation: String, createdAtMs: Long)

  def list(spark: SparkSession, t: String): Seq[SnapshotInfo] = {
    val (db, table, _) = resolve(spark, t)
    val root = base(spark, db, table)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq.flatMap { st =>
      val mf = new Path(st.getPath, "MANIFEST.json")
      if (!fs.exists(mf)) None
      else {
        val txt = new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(fs.open(mf)), "UTF-8")
        for {
          id <- """"id":(\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toLong)
          op <- """"operation":"([^"]*)"""".r.findFirstMatchIn(txt).map(_.group(1))
          at <- """"created_at":(\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toLong)
        } yield SnapshotInfo(id, op, at)
      }
    }.sortBy(_.id)
  }

  /** DataFrame over an archived version, read with its own schema. */
  def read(spark: SparkSession, t: String, id: Long): DataFrame = {
    val (db, table, _) = resolve(spark, t)
    val root = base(spark, db, table)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val target = new Path(root, id.toString)
    require(fs.exists(target), s"no snapshot $id for $t")
    val mf = new Path(target, "MANIFEST.json")
    val txt = new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(fs.open(mf)), "UTF-8")
    val schemaJson = txt.substring(txt.indexOf("\"schema\":") + 9).stripSuffix("}")
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    spark.read.schema(schema)
      .option("basePath", new Path(target, "data").toString)
      .parquet(new Path(target, "data").toString)
  }
}
