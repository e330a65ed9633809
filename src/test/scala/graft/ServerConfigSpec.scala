package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.server.{GraftServer, ServerConfig}

/** YAML server config (r10 verdict "Next #6"), mirroring the
  * reference's `ranger-server.yml` + `server/config/config.go:8-30`:
  * reference-matching keys parse, defaults fill gaps, validation is
  * addressed, and the serving tiers BOOT from a file-shaped config. */
class ServerConfigSpec extends AnyFunSuite {

  /** The reference's shipped ranger-server.yml, verbatim keys. */
  private val referenceYml =
    """# Ranger Server Configuration
      |server:
      |  host: "0.0.0.0"
      |  port: 8080
      |
      |log:
      |  level: "debug"
      |  file_path: "logs/ranger-server.log"
      |  max_size: 100
      |  max_age: 30
      |  max_backups: 10
      |  cleanup: true
      |
      |storage:
      |  type: "filesystem"
      |  data_path: "workspace"
      |  temp_path: "temp"
      |  catalog:
      |    type: "json"
      |
      |query:
      |  engine: "duckdb"
      |  max_memory: "2GB"
      |  temp_dir: "temp"
      |
      |catalog:
      |  type: "sqlite"
      |  path: "data/catalog.db"
      |  auto_create: true
      |""".stripMargin

  test("the reference's ranger-server.yml keys parse (unknown keys ignored)") {
    val c = ServerConfig.fromYaml(referenceYml)
    assert(c.host == "0.0.0.0")
    assert(c.httpPort == 8080, "server.port addresses the primary protocol")
    assert(c.pgwirePort == 2848 && c.nativePort == 2849)
    assert(c.logLevel == "debug")
    assert(c.logFilePath.contains("logs/ranger-server.log"))
    assert(c.logMaxSizeMb == 100 && c.logMaxAgeDays == 30 && c.logMaxBackups == 10)
    assert(c.logCleanup)
    assert(c.dataPath.contains("workspace"))
    assert(c.catalogType == "json")
  }

  test("empty document yields the defaults; sparkConfs maps onto engine confs") {
    val c = ServerConfig.fromYaml("")
    assert(c == ServerConfig())
    val m = c.sparkConfs
    assert(m("spark.graft.server.http.port") == "2847")
    assert(m("spark.graft.server.pgwire.port") == "2848")
    assert(m("spark.graft.server.native.port") == "2849")
    assert(m("spark.graft.auth.enabled") == "false")
    assert(!m.contains("spark.sql.warehouse.dir"))
    val withPath = ServerConfig.fromYaml("storage:\n  data_path: /tmp/wh\n")
    assert(withPath.sparkConfs("spark.sql.warehouse.dir") == "/tmp/wh")
  }

  test("per-protocol sections, auth tokens and validation") {
    val c = ServerConfig.fromYaml(
      """server:
        |  http: {enabled: true, port: 0}
        |  pgwire: {enabled: false}
        |  native: {port: 9999}
        |auth:
        |  enabled: true
        |  tokens: [alpha, beta]
        |query:
        |  shuffle_partitions: 7
        |""".stripMargin)
    assert(c.httpPort == 0 && !c.pgwireEnabled && c.nativePort == 9999)
    assert(c.authEnabled && c.authTokens == Seq("alpha", "beta"))
    assert(c.sparkConfs("spark.graft.auth.tokens") == "alpha,beta")
    assert(c.sparkConfs("spark.sql.shuffle.partitions") == "7")

    val e1 = intercept[IllegalArgumentException](
      ServerConfig.fromYaml("server:\n  port: 99999\n"))
    assert(e1.getMessage.contains("99999"))
    val e2 = intercept[IllegalArgumentException](
      ServerConfig.fromYaml("log:\n  level: blaring\n"))
    assert(e2.getMessage.contains("blaring"))
    val e3 = intercept[IllegalArgumentException](
      ServerConfig.load("/nonexistent/ranger-server.yml"))
    assert(e3.getMessage.contains("does not exist"))
    val e4 = intercept[IllegalArgumentException](
      ServerConfig.fromYaml("query:\n  shuffle_partitions: many\n"))
    assert(e4.getMessage.contains("many"))
  }

  test("server.host binds the tiers (loopback config is loopback-only)") {
    val spark = TestSpark.spark
    val engine = new graft.engine.QueryEngine(spark)
    val api = new graft.server.HttpApi(engine, 0, None, "127.0.0.1").start()
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      val r = client.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(
          s"http://127.0.0.1:${api.boundPort}/health")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 200)
      // and the config file's server.host reaches the conf the tiers read
      val c = ServerConfig.fromYaml("server:\n  host: 127.0.0.1\n")
      assert(c.sparkConfs("spark.graft.server.host") == "127.0.0.1")
    } finally api.stop()
  }

  test("tiers boot from a file-shaped config (ephemeral ports, native off)") {
    val spark = TestSpark.spark
    val yml =
      """server:
        |  http: {port: 0}
        |  pgwire: {port: 0}
        |  native: {enabled: false}
        |log:
        |  level: warn
        |""".stripMargin
    val f = java.nio.file.Files.createTempFile("graft-server", ".yml")
    java.nio.file.Files.write(f, yml.getBytes("UTF-8"))
    val cfg = ServerConfig.load(f.toString)
    // runtime-settable confs only (warehouse dir is session-static)
    val applied = cfg.sparkConfs.filterNot(_._1 == "spark.sql.warehouse.dir")
    applied.foreach { case (k, v) => spark.conf.set(k, v) }
    val running = try GraftServer.startTiers(spark) finally ()
    try {
      assert(running.http.isDefined && running.pg.isDefined)
      assert(running.native.isEmpty, "native tier must honor enabled: false")
      val port = running.http.get.boundPort
      assert(port > 0)
      val client = java.net.http.HttpClient.newHttpClient()
      val r = client.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$port/health")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 200)
      assert(running.pg.get.boundPort > 0)
      // the in-server Astha consumer is live and visible on the
      // delivery-audit face (round-16: cross-process schema-cache
      // coherence rides the shared changefeed)
      assert(running.astha.isDefined)
      val sched = running.astha.get // THIS server's scheduler, not the
      // JVM-wide view (parallel suites register same-named components)
      assert(sched.subscriberRows(0L).exists(_.component == "schema-cache"))
      // a PEER's mutation (an event this process did not emit through
      // its own engine hook) is consumed by the polling subscriber
      val evId = graft.engine.Changefeed.emit(spark,
        graft.engine.Changefeed.TableTables, "UPDATE",
        Map("table" -> "peer.t"))
      assert(evId > 0)
      val deadline = System.currentTimeMillis() + 5000
      var consumed = false
      while (!consumed && System.currentTimeMillis() < deadline) {
        consumed = sched.subscriberRows(0L)
          .find(_.component == "schema-cache").exists(_.cursor >= evId)
        if (!consumed) Thread.sleep(50)
      }
      assert(consumed, "schema-cache subscriber never consumed the peer event")
    } finally {
      running.stop()
      applied.keys.foreach(spark.conf.unset)
    }
  }
}
