package graft.server

import scala.io.StdIn
import org.apache.spark.sql.SparkSession
import graft.engine.QueryEngine

/** Thin interactive client, the analog of the reference's CLI REPL
  * (/root/reference/cmd/client/main.go): reads statements from stdin,
  * executes them through the engine facade, prints aligned tables and
  * the reference-style status messages. Non-interactive use:
  * `echo "SELECT 1;" | sbt "runMain graft.server.Repl"`. */
object Repl {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val engine = new QueryEngine(spark)
    println("graft engine - type SQL terminated by ';', \\q to quit")
    val buf = new StringBuilder
    var line: String = null
    while ({ line = StdIn.readLine(if (buf.isEmpty) "graft> " else "    -> "); line != null }) {
      val trimmed = line.trim
      if (trimmed == "\\q" || trimmed.equalsIgnoreCase("exit")) {
        spark.stop(); return
      }
      buf.append(line).append('\n')
      if (trimmed.endsWith(";")) {
        val sql = buf.toString.trim.stripSuffix(";")
        buf.clear()
        if (sql.nonEmpty) runOne(engine, sql)
      }
    }
    spark.stop()
  }

  private def runOne(engine: QueryEngine, sql: String): Unit =
    try {
      val t0 = System.nanoTime()
      val r = engine.execute(sql)
      val sec = (System.nanoTime() - t0) / 1e9
      if (r.columns.nonEmpty) print(renderTable(r.columns, r.data))
      if (r.message.nonEmpty) println(r.message)
      println(f"${r.rowCount} row(s) in $sec%.3f s [${r.queryId}]")
    } catch {
      case e: Throwable => println(s"ERROR: ${e.getMessage}")
    }

  /** Fixed-width table, mysql-client style. */
  private[graft] def renderTable(columns: Seq[String], data: Seq[Seq[Any]]): String = {
    val cells = data.map(_.map(v => if (v == null) "NULL" else v.toString))
    val widths = columns.indices.map { i =>
      (columns(i).length +: cells.map(_(i).length)).max
    }
    def rule = widths.map("-" * _).mkString("+-", "-+-", "-+\n")
    def row(vals: Seq[String]) = vals.zip(widths)
      .map { case (v, w) => v.padTo(w, ' ') }.mkString("| ", " | ", " |\n")
    val sb = new StringBuilder(rule)
    sb ++= row(columns)
    sb ++= rule
    cells.foreach(c => sb ++= row(c))
    sb ++= rule
    sb.toString
  }
}
