package graft.server

/** YAML server configuration, mirroring the reference's config file
  * (`server/config/config.go:8-30` + `ranger-server.yml`): `server:`
  * (host/port + per-protocol enable flags), `log:` (level, file
  * rotation knobs), `storage:` (data_path → warehouse dir, catalog
  * type), `query:` (engine knobs), `auth:`. Live settings map onto
  * spark confs the engine honors (host binds all three tiers, ports,
  * enable flags, warehouse dir, auth, shuffle partitions, log level);
  * the log ROTATION knobs (file_path/max_size/max_backups/max_age/
  * cleanup) and storage.catalog.type are parsed for reference parity
  * and carried on the config object but not enforced — Spark's
  * log4j2 owns file rotation here.
  *
  * Unknown keys are ignored (the reference's yaml.Unmarshal behavior);
  * missing keys fall back to the same defaults the reference's
  * LoadDefaultConfig hardcodes, adapted to this engine's per-protocol
  * port layout (2847/2848/2849). Validation fails with addressed
  * messages, not raw parse exceptions mid-bootstrap.
  */
final case class ServerConfig(
    host: String = "0.0.0.0",
    httpEnabled: Boolean = true, httpPort: Int = 2847,
    pgwireEnabled: Boolean = true, pgwirePort: Int = 2848,
    nativeEnabled: Boolean = true, nativePort: Int = 2849,
    logLevel: String = "info",
    logFilePath: Option[String] = None,
    logMaxSizeMb: Int = 100,
    logMaxBackups: Int = 3,
    logMaxAgeDays: Int = 7,
    logCleanup: Boolean = true,
    dataPath: Option[String] = None,
    catalogType: String = "json",
    shufflePartitions: Option[Int] = None,
    authEnabled: Boolean = false,
    authTokens: Seq[String] = Seq.empty) {

  /** The spark confs this file stands for — applied at session build
    * so the rest of the server reads ONE source of truth. */
  def sparkConfs: Map[String, String] = Map(
    "spark.graft.server.host" -> host,
    "spark.graft.server.http.enabled" -> httpEnabled.toString,
    "spark.graft.server.http.port" -> httpPort.toString,
    "spark.graft.server.pgwire.enabled" -> pgwireEnabled.toString,
    "spark.graft.server.pgwire.port" -> pgwirePort.toString,
    "spark.graft.server.native.enabled" -> nativeEnabled.toString,
    "spark.graft.server.native.port" -> nativePort.toString,
    "spark.graft.auth.enabled" -> authEnabled.toString) ++
    (if (authTokens.nonEmpty)
      Map("spark.graft.auth.tokens" -> authTokens.mkString(","))
    else Map.empty) ++
    dataPath.map("spark.sql.warehouse.dir" -> _) ++
    shufflePartitions.map("spark.sql.shuffle.partitions" -> _.toString)

  def validated: ServerConfig = {
    def checkPort(name: String, p: Int): Unit =
      require(p >= 0 && p <= 65535,
        s"invalid $name port $p (need 0-65535; 0 binds an ephemeral port)")
    checkPort("server.http", httpPort)
    checkPort("server.pgwire", pgwirePort)
    checkPort("server.native", nativePort)
    require(Set("error", "warn", "info", "debug", "trace")
        .contains(logLevel.toLowerCase),
      s"invalid log.level '$logLevel' (error|warn|info|debug|trace)")
    this
  }
}

object ServerConfig {

  /** Parse a YAML config file; absent file or empty document yields
    * the defaults (the reference's LoadDefaultConfig path). */
  def load(path: String): ServerConfig = {
    val f = new java.io.File(path)
    require(f.exists,
      s"config file $path does not exist")
    fromYaml(new String(
      java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
  }

  def fromYaml(yaml: String): ServerConfig = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper(
      new com.fasterxml.jackson.dataformat.yaml.YAMLFactory())
    val root = Option(mapper.readTree(yaml))
      .getOrElse(mapper.createObjectNode())

    def node(path: String*): Option[com.fasterxml.jackson.databind.JsonNode] =
      path.foldLeft(Option(root): Option[com.fasterxml.jackson.databind.JsonNode]) {
        (n, k) => n.flatMap(x => Option(x.get(k)))
      }
    def str(dflt: String, path: String*): String =
      node(path: _*).map(_.asText()).getOrElse(dflt)
    def optStr(path: String*): Option[String] =
      node(path: _*).map(_.asText()).filter(_.nonEmpty)
    def int(dflt: Int, path: String*): Int =
      node(path: _*).map { n =>
        require(n.canConvertToInt, s"${path.mkString(".")}: '${n.asText()}' is not an integer")
        n.asInt()
      }.getOrElse(dflt)
    def bool(dflt: Boolean, path: String*): Boolean =
      node(path: _*).map(_.asBoolean()).getOrElse(dflt)

    // `server.port` is the reference's single-port key — it addresses
    // the primary (HTTP) protocol; per-protocol sub-sections override.
    val basePort = int(2847, "server", "port")
    ServerConfig(
      host = str("0.0.0.0", "server", "host"),
      httpEnabled = bool(true, "server", "http", "enabled"),
      httpPort = int(basePort, "server", "http", "port"),
      pgwireEnabled = bool(true, "server", "pgwire", "enabled"),
      pgwirePort = int(2848, "server", "pgwire", "port"),
      nativeEnabled = bool(true, "server", "native", "enabled"),
      nativePort = int(2849, "server", "native", "port"),
      logLevel = str("info", "log", "level"),
      logFilePath = optStr("log", "file_path"),
      logMaxSizeMb = int(100, "log", "max_size"),
      logMaxBackups = int(3, "log", "max_backups"),
      logMaxAgeDays = int(7, "log", "max_age"),
      logCleanup = bool(true, "log", "cleanup"),
      dataPath = optStr("storage", "data_path"),
      catalogType = str("json", "storage", "catalog", "type"),
      shufflePartitions = node("query", "shuffle_partitions").map { n =>
        require(n.canConvertToInt && n.asInt() > 0,
          s"query.shuffle_partitions: '${n.asText()}' is not a positive integer")
        n.asInt()
      },
      authEnabled = bool(false, "auth", "enabled"),
      authTokens = node("auth", "tokens").toSeq.flatMap { n =>
        import scala.jdk.CollectionConverters._
        if (n.isArray) n.elements().asScala.map(_.asText()).toSeq
        else n.asText().split(",").toSeq.map(_.trim).filter(_.nonEmpty)
      }
    ).validated
  }
}
