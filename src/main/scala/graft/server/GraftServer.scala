package graft.server

import org.apache.spark.sql.SparkSession

import graft.engine.QueryEngine
import graft.server.native.NativeServer
import graft.server.pgwire.PgWireServer

/** All three serving tiers on one engine, the analog of the
  * reference's gateway (server/gateway/gateway.go:39-141): HTTP JSON
  * on 2847, pg-wire on 2848, native binary on 2849 — the reference's
  * port layout. One SparkSession serves every protocol; each query
  * runs in its own job group so per-client cancellation works across
  * tiers.
  *
  * Usage: `sbt "runMain graft.server.GraftServer [sfDir]"` — when a
  * test-data dir is given, its parquet tables are registered as views
  * so protocol clients can query them immediately.
  */
object GraftServer {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-server")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      // FAIR + a pool per query (ExecutionManager.run): one client's
      // long scan must not starve the other protocols' short queries
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.headOption.foreach(dir => graft.sources.Tables.registerAll(spark, dir))

    val engine = new QueryEngine(spark)
    // spark.graft.auth.enabled=true turns on the reference's auth
    // middleware defaults on all three tiers; HTTP bearer tokens come
    // from spark.graft.auth.tokens (comma-separated)
    val auth: Option[AuthProvider] =
      if (spark.conf.getOption("spark.graft.auth.enabled").contains("true"))
        Some(new SimpleAuthProvider(
          tokens = spark.conf.getOption("spark.graft.auth.tokens")
            .map(_.split(",").toSet).getOrElse(Set.empty)))
      else None
    val http = new HttpApi(engine, 2847, auth).start()
    val pg = new PgWireServer(engine, 2848, auth = auth); pg.start()
    val native = new NativeServer(engine, 2849, auth = auth); native.start()
    println("graft-server listening: http=2847 pgwire=2848 native=2849" +
      (if (auth.isDefined) " (auth enabled)" else ""))
    sys.addShutdownHook { native.stop(); pg.stop(); http.stop(); spark.stop() }
    Thread.currentThread().join() // serve until killed
  }
}
