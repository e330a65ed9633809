package graft.server

import scala.io.StdIn
import org.apache.spark.sql.SparkSession
import graft.engine.QueryEngine

/** Thin interactive client, the analog of the reference's CLI REPL
  * (/root/reference/cmd/client/main.go): reads statements from stdin,
  * executes them, prints aligned tables and the reference-style
  * status messages. Two modes, like the reference's client:
  *  - embedded (default): a local SparkSession + engine facade;
  *  - remote: `runMain graft.server.Repl --connect host:port` talks
  *    the native binary protocol to a running GraftServer via the
  *    SDK client — no Spark in the client process.
  * Non-interactive use: `echo "SELECT 1;" | sbt "runMain ..."`. */
object Repl {

  def main(args: Array[String]): Unit = {
    args match {
      case Array("--connect", hostPort) =>
        val Array(host, port) = hostPort.split(":", 2)
        remoteLoop(host, port.toInt)
      case _ => embeddedLoop()
    }
  }

  private def remoteLoop(host: String, port: Int): Unit = {
    val client = graft.sdk.GraftClient.open(
      graft.sdk.GraftClient.Options(host = host, port = port))
    println(s"connected to graft-server at $host:$port - SQL terminated by ';', \\q to quit")
    eachStatement { sql =>
      try {
        val t0 = System.nanoTime()
        val r = client.query(sql)
        val sec = (System.nanoTime() - t0) / 1e9
        if (r.columns.nonEmpty)
          print(renderTable(r.columns, r.rows.map(_.values)))
        println(f"${r.rows.length} row(s) in $sec%.3f s")
      } catch {
        case e: Throwable => println(s"ERROR: ${e.getMessage}")
      }
    }
    client.close()
  }

  private def embeddedLoop(): Unit = {
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
    eachStatement(sql => runOne(engine, sql))
    spark.stop()
  }

  /** Shared statement reader: accumulates lines until ';'. */
  private def eachStatement(run: String => Unit): Unit = {
    val buf = new StringBuilder
    var line: String = null
    var quit = false
    while (!quit &&
           { line = StdIn.readLine(if (buf.isEmpty) "graft> " else "    -> ")
             line != null }) {
      val trimmed = line.trim
      if (trimmed == "\\q" || trimmed.equalsIgnoreCase("exit")) quit = true
      else {
        buf.append(line).append('\n')
        if (trimmed.endsWith(";")) {
          val sql = buf.toString.trim.stripSuffix(";")
          buf.clear()
          if (sql.nonEmpty) run(sql)
        }
      }
    }
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
