package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.functions.expressions.ArrayOps

/** Persisted secondary indexes as CATALOG OBJECTS — the surface the
  * reference PARSES and rejects (`CREATE INDEX`,
  * `server/query/parser/parser.go:3942-4013`; its engine has no route
  * for `CreateIndexStmt`). This engine goes further: the bucketed
  * index MATERIALS the analytics operators already use as query-side
  * intermediates (LSH band tables, BM25 postings, IVF cell
  * assignments, SQ8 code tables) become durable objects the engine
  * creates, lists, maintains across DML, and probes.
  *
  * Syntax (superset — the reference grammar plus USING):
  * {{{
  *   CREATE INDEX name ON [db.]table (keyCol, payloadCol) USING bands
  *   CREATE INDEX name ON [db.]table (col, ...)            -- zonemap
  *   SHOW INDEXES [ON [db.]table]
  *   DROP INDEX name ON [db.]table
  * }}}
  * Kinds: `bands` (MinHash-LSH near-dup), `postings` (BM25 inverted
  * index + doc-length carrier rows), `ivf` (cell routing over a
  * codebook FROZEN at creation), `sq8` (8-bit scalar quantization
  * against per-dimension [min,max] FROZEN at creation), `zonemap`
  * (per-file min/max — the default when USING is omitted, i.e. for
  * every reference-compatible statement).
  *
  * == Storage and maintenance model ==
  *
  * Everything lives on the filesystem —
  * `<warehouse>/.graft-indexes/<db>.<table>/<index>/` holds
  * `meta.json` plus `data/f=<md5(srcFile)>/` parquet shards, ONE SHARD
  * PER BASE-TABLE DATA FILE. That granularity is the whole design:
  *  - '''maintenance is a file diff''', not a log protocol. After any
  *    mutation, [[sync]] lists the table's live data files, builds
  *    shards for new files, and deletes shards whose source file is
  *    gone. INSERT appends shards; MERGE/UPDATE/DELETE (copy-on-write
  *    partition rewrites) swap exactly the rewritten partitions'
  *    shards; OPTIMIZE/RESTORE fall out for free. Work is always
  *    O(changed files), never O(table).
  *  - '''restart survival is trivial''' — there is no in-memory
  *    registry; every read goes through `meta.json` + the shard dirs.
  *  - '''at 100 TB''' each shard build reads one parquet file and
  *    writes one bounded shard — embarrassingly parallel across files,
  *    and the probe side reads the shard set as one partitioned
  *    parquet table (partition column `f` = source-file identity).
  *
  * Frozen-parameter contract: `ivf` centroids and `sq8` scales are
  * computed once at CREATE and stored in `meta.json`, so shard
  * contents depend only on (file contents, meta) — the property that
  * makes the per-file diff sound. The trade (documented, standard for
  * stored ANN indexes): drifted data quantizes against stale scales
  * until the index is rebuilt (DROP + CREATE).
  */
object IndexManager {

  /** Index kinds and the column arity each expects. */
  private val TwoColKinds = Set("bands", "postings", "ivf", "sq8")
  val Kinds: Set[String] = TwoColKinds + "zonemap" + "bloom"

  /** Shard FORMAT version per kind, stamped into meta params as
    * "fmt" at CREATE. Bump when a kind's shard schema changes (ivf
    * went (cell, key) → covering (cell, key, v) in round 10): an old
    * shard under a new build would fail every probe with a bare
    * missing-column AnalysisException. [[sync]] migrates a
    * version-mismatched index by wiping and rebuilding its shards;
    * [[indexData]] refuses an unmigrated one with an addressed error. */
  private val ShardFormats: Map[String, String] = Map("ivf" -> "2")
  private def shardFormat(kind: String): String =
    ShardFormats.getOrElse(kind, "1")

  // bands parameters — the q33 operating point (Dedup's constants)
  private val ShingleK = 2
  private val NumHashes = 32
  private val NumBands = 8
  private val BucketCap = 20
  // ivf/sq8 defaults
  private val DefaultIvfK = 32

  final case class IndexMeta(name: String, table: String, kind: String,
                             cols: Seq[String],
                             params: Map[String, String]) {
    def keyCol: String = cols.head
    def payloadCol: String = cols(1)
  }

  // ---------------------------------------------------------------- paths

  private def root(spark: SparkSession): Path =
    new Path(new Path(spark.conf.get("spark.sql.warehouse.dir")),
      ".graft-indexes")

  private def fs(spark: SparkSession): FileSystem =
    root(spark).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tableDir(spark: SparkSession, qualified: String): Path =
    new Path(root(spark), qualified.toLowerCase)

  private def indexDir(spark: SparkSession, qualified: String,
                       name: String): Path =
    new Path(tableDir(spark, qualified), name.toLowerCase)

  /** Shard key for a base-table data file — exposed so the SELECT-path
    * zonemap rule can address bounds rows by live-file identity. */
  private[graft] def fileHashFor(path: String): String = fileHash(path)

  private def fileHash(path: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  // ----------------------------------------------------------- meta JSON

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
  private def unesc(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  private def metaJson(m: IndexMeta): String = {
    val cols = m.cols.map(c => "\"" + esc(c) + "\"").mkString("[", ",", "]")
    val params = m.params.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    s"""{"name":"${esc(m.name)}","table":"${esc(m.table)}",""" +
      s""""kind":"${m.kind}","cols":$cols,"params":$params}"""
  }

  /** Real JSON parse (Jackson, already on the Spark classpath) — the
    * hand-rolled regexes broke on a param literally named "kind" or a
    * column containing ']'; structural parsing cannot. Parsed meta is
    * validated against [[Kinds]] so a corrupt/drifted file fails
    * loudly instead of building shards of an unknown kind. */
  private def parseMeta(json: String): IndexMeta = {
    import scala.jdk.CollectionConverters._
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    def str(f: String): String = {
      val v = node.get(f)
      require(v != null && v.isTextual, s"index meta.json missing field '$f'")
      v.asText()
    }
    val colsNode = node.get("cols")
    require(colsNode != null && colsNode.isArray,
      "index meta.json missing array field 'cols'")
    val cols = colsNode.elements().asScala.map(_.asText()).toSeq
    val paramsNode = node.get("params")
    require(paramsNode != null && paramsNode.isObject,
      "index meta.json missing object field 'params'")
    val params = paramsNode.properties().asScala
      .map(e => e.getKey -> e.getValue.asText()).toMap
    val m = IndexMeta(str("name"), str("table"), str("kind"), cols, params)
    require(Kinds.contains(m.kind),
      s"index meta.json has unknown kind '${m.kind}'")
    m
  }

  /** Test hook: serialize + parse without touching the filesystem. */
  private[graft] def roundTripMetaForTest(m: IndexMeta): IndexMeta =
    parseMeta(metaJson(m))

  private def writeMeta(spark: SparkSession, m: IndexMeta): Unit = {
    val out = fs(spark).create(
      new Path(indexDir(spark, m.table, m.name), "meta.json"), true)
    out.write(metaJson(m).getBytes("UTF-8")); out.close()
  }

  private def readMeta(spark: SparkSession, dir: Path): Option[IndexMeta] = {
    val f = new Path(dir, "meta.json")
    val filesys = fs(spark)
    if (!filesys.exists(f)) None
    else {
      val in = filesys.open(f)
      try {
        val bytes = new Array[Byte](filesys.getFileStatus(f).getLen.toInt)
        in.readFully(bytes)
        Some(parseMeta(new String(bytes, "UTF-8")))
      } finally in.close()
    }
  }

  // ------------------------------------------------------------- catalog

  /** All indexes of one table (qualified `db.table`). */
  def indexesOf(spark: SparkSession, qualified: String): Seq[IndexMeta] = {
    val td = tableDir(spark, qualified)
    val filesys = fs(spark)
    if (!filesys.exists(td)) Seq.empty
    else filesys.listStatus(td).toSeq.filter(_.isDirectory)
      .flatMap(st => readMeta(spark, st.getPath))
      .sortBy(_.name)
  }

  /** Every index under the warehouse (SHOW INDEXES with no table). */
  def allIndexes(spark: SparkSession): Seq[IndexMeta] = {
    val r = root(spark)
    val filesys = fs(spark)
    if (!filesys.exists(r)) Seq.empty
    else filesys.listStatus(r).toSeq.filter(_.isDirectory)
      .flatMap(td => filesys.listStatus(td.getPath).toSeq
        .filter(_.isDirectory).flatMap(st => readMeta(spark, st.getPath)))
      .sortBy(m => (m.table, m.name))
  }

  def indexMeta(spark: SparkSession, qualified: String,
                name: String): Option[IndexMeta] =
    readMeta(spark, indexDir(spark, qualified, name))

  /** CREATE INDEX: validate, freeze data-dependent parameters, write
    * meta, then [[sync]] builds one shard per live base file. */
  def create(spark: SparkSession, name: String, qualified: String,
             cols: Seq[String], kindOpt: Option[String],
             ifNotExists: Boolean): String = {
    val kind = kindOpt.map(_.toLowerCase).getOrElse("zonemap")
    require(Kinds.contains(kind),
      s"unknown index kind '$kind' (expected one of ${Kinds.toSeq.sorted.mkString(", ")})")
    if (!spark.catalog.tableExists(qualified))
      throw new IllegalArgumentException(s"table $qualified does not exist")
    val schema = spark.table(qualified).schema
    cols.foreach(c => require(schema.fieldNames.map(_.toLowerCase)
        .contains(c.toLowerCase), s"column $c does not exist in $qualified"))
    // Partition columns live in directory names, not in the parquet
    // files [[sync]] reads per-shard — an index over one would build
    // with null keys/values (bands: null-key candidates; ivf/sq8:
    // every row dropped; zonemap: null min/max that never prunes) and
    // return WRONG probe results with no error. Reject at CREATE:
    // partition pruning already covers these columns for free.
    val partCols = spark.catalog.listColumns(qualified).collect()
      .filter(_.isPartition).map(_.name.toLowerCase).toSet
    cols.foreach(c => require(!partCols.contains(c.toLowerCase),
      s"column $c is a partition column of $qualified — it is not stored " +
        "in the data files, so an index shard would see only nulls; " +
        "partition pruning already serves predicates on it"))
    // addressed lookup even though existence was validated above —
    // a future reordering must fail with the table+column named, not
    // a bare NoSuchElementException
    def fieldOf(c: String) = schema.fieldNames.find(_.equalsIgnoreCase(c))
      .map(schema(_)).getOrElse(throw new IllegalArgumentException(
        s"column $c does not exist in $qualified"))
    if (TwoColKinds.contains(kind)) {
      require(cols.length == 2,
        s"USING $kind expects (keyColumn, payloadColumn); got ${cols.length} column(s)")
      val keyType = fieldOf(cols.head).dataType
      require(Seq("int", "bigint", "smallint", "tinyint")
          .contains(keyType.simpleString),
        s"USING $kind needs an integral key column; ${cols.head} is ${keyType.simpleString}")
    } else require(cols.nonEmpty, "index needs at least one column")
    if (kind == "bloom") cols.foreach { c =>
      // the probe hashes either a LONG (integral columns, exact under
      // widening-cast equality) or raw UTF-8 bytes (strings); any
      // other type has no sound shared representation with its
      // predicate literals (float equality re-rounds, date/timestamp
      // literals arrive in internal units) — reject at CREATE
      val dt = fieldOf(c).dataType.simpleString
      require(Seq("tinyint", "smallint", "int", "bigint", "string")
          .contains(dt),
        s"USING bloom supports integral and string columns; $c is $dt")
    }
    if (indexMeta(spark, qualified, name).isDefined) {
      if (ifNotExists) return s"Index $name already exists"
      throw new IllegalArgumentException(
        s"index $name already exists on $qualified")
    }
    val meta = IndexMeta(name, qualified, kind, cols,
      defaultParams(spark, qualified, kind, cols) +
        ("fmt" -> shardFormat(kind)))
    writeMeta(spark, meta)
    // fail-fast: a CREATE whose initial build breaks should error at
    // the user, not leave a silently-stale index behind
    try sync(spark, qualified, failFast = true)
    catch { case e: Exception => drop(spark, qualified, name, ifExists = true); throw e }
    s"Index $name created"
  }

  def drop(spark: SparkSession, qualified: String, name: String,
           ifExists: Boolean): String = {
    val dir = indexDir(spark, qualified, name)
    val filesys = fs(spark)
    if (!filesys.exists(new Path(dir, "meta.json"))) {
      if (ifExists) return s"Index $name does not exist"
      throw new IllegalArgumentException(
        s"index $name does not exist on $qualified")
    }
    filesys.delete(dir, true)
    s"Index $name dropped"
  }

  /** DROP TABLE hygiene — a recreated table must not inherit stale
    * index shards (same contract as Snapshots.purge). */
  def purgeTable(spark: SparkSession, qualified: String): Unit = {
    val td = tableDir(spark, qualified)
    if (fs(spark).exists(td)) fs(spark).delete(td, true)
  }

  // -------------------------------------------------------- maintenance

  /** File-diff maintenance: one call after ANY mutation of `qualified`
    * brings every index up to date in O(changed files). No-op (one
    * directory existence check) for tables with no indexes — the
    * common DML path stays unburdened. */
  def sync(spark: SparkSession, qualified: String,
           failFast: Boolean = false): Unit = {
    val metas = indexesOf(spark, qualified)
    if (metas.isEmpty) return
    val live: Map[String, String] = spark.table(qualified).inputFiles
      .map(f => fileHash(f) -> f).toMap
    val filesys = fs(spark)
    metas.foreach { meta0 =>
      val dataDir = new Path(indexDir(spark, qualified, meta0.name), "data")
      try {
        // format migration: a version-mismatched index (persisted by an
        // older build whose shard schema differed) is wiped here and
        // rebuilt in full by the file diff below — self-healing, same
        // contract as a missing-shard rebuild.
        val meta =
          if (meta0.params.getOrElse("fmt", "1") == shardFormat(meta0.kind))
            meta0
          else {
            if (filesys.exists(dataDir)) filesys.delete(dataDir, true)
            val m = meta0.copy(params =
              meta0.params + ("fmt" -> shardFormat(meta0.kind)))
            writeMeta(spark, m)
            m
          }
        val have: Set[String] =
          if (!filesys.exists(dataDir)) Set.empty
          else filesys.listStatus(dataDir).toSeq.map(_.getPath.getName)
            .filter(_.startsWith("f=")).map(_.stripPrefix("f=")).toSet
        val missing = (live.keySet -- have).toSeq.sorted
        // Shard builds are independent per file — run them as
        // CONCURRENT Spark jobs (bounded pool) instead of a serial
        // driver loop: a 200-file CREATE INDEX was 200 sequential
        // ~0.2 s jobs (36 s measured at the 50× zonemap probe) when
        // the cluster could run them all at once. Any build failure
        // propagates out of Await and hits the stale-marking catch
        // exactly like the serial loop's did.
        if (missing.nonEmpty) {
          import scala.concurrent.{Await, ExecutionContext, Future}
          val par = math.min(math.max(1,
            spark.conf.getOption("spark.graft.index.sync.parallelism")
              .flatMap(_.toIntOption).getOrElse(8)), missing.size)
          val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
          implicit val ec: ExecutionContext =
            ExecutionContext.fromExecutor(pool)
          try Await.result(
            Future.sequence(missing.map { h => Future {
              buildRows(spark, meta, readBaseFile(spark, qualified, live(h)))
                .write.mode("overwrite")
                .parquet(new Path(dataDir, s"f=$h").toString)
            } }), scala.concurrent.duration.Duration.Inf)
          finally pool.shutdown()
        }
        (have -- live.keySet).toSeq.sorted.foreach { h =>
          filesys.delete(new Path(dataDir, s"f=$h"), true)
        }
        clearStale(spark, qualified, meta.name)
      } catch {
        case e: Exception if !failFast =>
          // An index-maintenance failure (schema drift vs frozen
          // ivf/sq8 meta, a corrupt base file) must NOT fail a DML
          // that already committed, and must not be silent either:
          // mark the index STALE (probes refuse with an addressed
          // error), log, move on. The file diff is idempotent, so the
          // next successful sync rebuilds exactly the missing shards
          // and clears the marker — self-healing.
          markStale(spark, qualified, meta0.name, e.getMessage)
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"index ${meta0.name} on $qualified failed maintenance and " +
              s"is marked stale: ${e.getMessage}")
      }
    }
  }

  // --------------------------------------------------------- stale marker

  private def staleFile(spark: SparkSession, qualified: String,
                        name: String): Path =
    new Path(indexDir(spark, qualified, name), "STALE")

  private def markStale(spark: SparkSession, qualified: String,
                        name: String, why: String): Unit = {
    val out = fs(spark).create(staleFile(spark, qualified, name), true)
    out.write(Option(why).getOrElse("").getBytes("UTF-8")); out.close()
  }

  private def clearStale(spark: SparkSession, qualified: String,
                         name: String): Unit = {
    val f = staleFile(spark, qualified, name)
    val filesys = fs(spark)
    if (filesys.exists(f)) filesys.delete(f, false)
  }

  /** True if the last maintenance pass for this index failed — shard
    * contents may be missing or stale relative to the base table. */
  def isStale(spark: SparkSession, qualified: String,
              name: String): Boolean =
    fs(spark).exists(staleFile(spark, qualified, name))

  private def requireFresh(spark: SparkSession, qualified: String,
                           name: String): Unit =
    if (isStale(spark, qualified, name))
      throw new IllegalStateException(
        s"index $name on $qualified is STALE (last maintenance failed); " +
          "probing would return wrong results — run any DML on the table " +
          "(or IndexManager.sync) to heal, or DROP and re-CREATE the index")

  private def readBaseFile(spark: SparkSession, qualified: String,
                           file: String): DataFrame =
    // `file` is a listing string — decode (FsPaths) or a shard build
    // over an escaped partition dir fails PATH_NOT_FOUND and marks
    // the index stale on every sync
    spark.read.schema(spark.table(qualified).schema)
      .parquet(FsPaths.readable(file))

  // ------------------------------------------------------ shard builders

  /** The index rows for one slice of the base table (one file during
    * maintenance; `limit(0)` of the table for the empty-index
    * schema). Pure in (rows, meta) — the soundness condition of the
    * per-file diff. */
  private[engine] def buildRows(spark: SparkSession, meta: IndexMeta,
                                src: DataFrame): DataFrame = meta.kind match {
    case "bands" =>
      val nh = meta.params("numHashes").toInt
      val nb = meta.params("bands").toInt
      src.select(col(meta.keyCol).cast("long").as("key"),
          ArrayOps.wordShingles(Text.tokens(col(meta.payloadCol).cast("string")),
            meta.params("shingleK").toInt).as("sh"))
        .where(size(col("sh")) >= 1)
        .withColumn("mh", ArrayOps.minhashSig(col("sh"), nh))
        .select(col("key"),
          posexplode(Text.lshBandKeys(col("mh"), nb, nh / nb))
            .as(Seq("band", "bh")))
        .select(col("band"), col("bh"), col("key"))
    case "postings" =>
      val toks = src.select(col(meta.keyCol).cast("long").as("key"),
          Text.tokens(col(meta.payloadCol).cast("string")).as("t"))
        .withColumn("dl", size(col("t")))
      // term rows + ONE dl-carrier row per doc (w='', tf=0), so corpus
      // stats (n_docs, avgdl) are computable from the index alone —
      // including docs that match no query term
      toks.select(col("key"), col("dl"), explode(col("t")).as("w"))
        .groupBy(col("key"), col("dl"), col("w"))
        .agg(count(lit(1)).as("tf"))
        .select(col("w"), col("key"), col("dl"), col("tf"))
        .unionByName(toks.select(lit("").as("w"), col("key"), col("dl"),
          lit(0L).as("tf")))
    case "ivf" =>
      // COVERING index: the vector rides in the shard next to its cell
      // assignment, rows sorted by cell within each shard — so a probe
      // filtered to its nprobe cells reads only those cells' row
      // groups (parquet min/max stats on `cell`) and never touches the
      // base table for candidate vectors. The storage trade (the index
      // duplicates the vector column) is the classic one: at 100 TB a
      // probe that re-scans the corpus for candidate payloads costs
      // the full scan the index exists to avoid.
      val cents = decodeMatrix(meta.params("centroids"))
      src.select(col(meta.keyCol).cast("long").as("key"),
          col(meta.payloadCol).cast("array<double>").as("v"))
        .where(col("v").isNotNull)
        .withColumn("cell", element_at(
          ArrayOps.ivfCells(col("v"), cents, 1), 1).getField("cell"))
        .select(col("cell"), col("key"), col("v"))
        .sortWithinPartitions(col("cell"))
    case "sq8" =>
      val mn = decodeVector(meta.params("mn"))
      val mx = decodeVector(meta.params("mx"))
      val dim = mn.length
      src.select(col(meta.keyCol).cast("long").as("key"),
          col(meta.payloadCol).cast("array<double>").as("v"))
        .where(col("v").isNotNull)
        .withColumn("mnl", typedlit(mn)).withColumn("mxl", typedlit(mx))
        // same quantizer expression as q94 (Similarity.sqAdcTopK):
        // out-of-range values (data drift after the scales froze)
        // CLAMP to [0,255] — the stored-index trade, documented above
        .withColumn("codes", expr(
          s"""transform(sequence(1, $dim), i ->
             |  CASE WHEN element_at(mxl, i) = element_at(mnl, i) THEN 0
             |  ELSE least(255, greatest(0, CAST(floor(
             |    (element_at(v, i) - element_at(mnl, i)) * 255.0D
             |      / (element_at(mxl, i) - element_at(mnl, i))) AS INT))) END)""".stripMargin))
        .select(col("key"), col("codes"))
    case "bloom" =>
      // one row per indexed column: a Bloom membership filter over the
      // file's non-null values — the equality/IN evidence for columns
      // whose min/max cannot prune (high-cardinality, unclustered).
      // Integral columns hash their exact LONG value, strings their
      // raw UTF-8 bytes; the planning-time probe replays the same
      // representation ([[graft.plans.ZonemapPruneRule]]).
      val items = meta.params("expectedItems").toLong
      val fpp = meta.params("fpp").toDouble
      meta.cols.map { c =>
        val dt = src.schema.fields.find(_.name.equalsIgnoreCase(c)).get
          .dataType.simpleString
        val in = if (dt == "string") col(c) else col(c).cast("long")
        src.agg(
          lit(c).as("col"),
          graft.functions.expressions.BloomAgg.bloomAgg(in, items, fpp)
            .as("bloom"),
          count(col(c)).as("n_rows"))
      }.reduce(_ unionByName _)
    case "zonemap" =>
      // one row per indexed column: textual + numeric min/max (the
      // numeric pair is null for non-castable types); a probe prunes
      // files whose [mn, mx] cannot contain the predicate value
      meta.cols.map { c =>
        // try_cast, not cast: under ANSI semantics a plain cast of a
        // non-numeric string THROWS mid-shard-build; the zonemap
        // contract is "numeric pair is null for non-castable types"
        src.agg(
          lit(c).as("col"),
          min(col(c)).cast("string").as("mn"),
          max(col(c)).cast("string").as("mx"),
          min(expr(s"try_cast(`$c` AS DOUBLE)")).as("mn_num"),
          max(expr(s"try_cast(`$c` AS DOUBLE)")).as("mx_num"),
          count(col(c)).as("n_rows"))
      }.reduce(_ unionByName _)
  }

  /** Full index contents as a DataFrame; `f` is the source-file shard
    * column (dropped — provenance is an implementation detail to
    * probes). Empty-shard case returns the correct empty schema. */
  def indexData(spark: SparkSession, qualified: String,
                name: String): DataFrame = {
    val meta = indexMeta(spark, qualified, name).getOrElse(
      throw new IllegalArgumentException(
        s"index $name does not exist on $qualified"))
    requireFresh(spark, qualified, name)
    if (meta.params.getOrElse("fmt", "1") != shardFormat(meta.kind))
      throw new IllegalStateException(
        s"index $name on $qualified was persisted in an older shard " +
          s"format (v${meta.params.getOrElse("fmt", "1")}, current " +
          s"v${shardFormat(meta.kind)}); run any DML on the table (or " +
          "IndexManager.sync) to migrate it in place, or DROP and " +
          s"re-CREATE index $name")
    val dataDir = new Path(indexDir(spark, qualified, name), "data")
    val filesys = fs(spark)
    val shards =
      if (!filesys.exists(dataDir)) Seq.empty
      else filesys.listStatus(dataDir).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("f="))
    if (shards.isEmpty)
      buildRows(spark, meta, spark.table(qualified).limit(0))
    else spark.read.parquet(dataDir.toString).drop("f")
  }

  // ------------------------------------------------------- probe faces

  /** LSH near-dup candidate pairs straight from a `bands` index —
    * the q33 candidate stage reading the PERSISTED band table instead
    * of recomputing signatures (bucket caps and pair convention
    * identical). */
  def bandCandidates(spark: SparkSession, qualified: String,
                     name: String): DataFrame =
    bandRowsToCandidates(indexData(spark, qualified, name))

  /** Band rows (band, bh, key) → capped bucket-local candidate pairs —
    * shared by the persisted-index probe and the scan-path fallback of
    * [[graft.engine.QueryEngine.nearDupCandidates]]; identical pair
    * convention to `Dedup.lshCandidatePairs`. */
  private[engine] def bandRowsToCandidates(bands: DataFrame): DataFrame = {
    val buckets = bands.groupBy(col("band"), col("bh"))
      .agg(graft.functions.expressions.CappedLongsAgg
        .cappedLongs(col("key"), BucketCap + 1).as("ids"))
      .where(size(col("ids")).between(2, BucketCap))
    buckets.select(explode(graft.functions.expressions.ArrayOps
        .orderedPairs(col("ids"))).as("p"))
      .select(col("p.doc1").as("doc1"), col("p.doc2").as("doc2"))
      .distinct()
  }

  /** Scan-path computation of what a `kind` index would contain for
    * the CURRENT table — the fallback the index-aware faces use when
    * no index exists. Same [[buildRows]] builder, so index-present and
    * index-absent answers are identical by construction. */
  private[engine] def scanRows(spark: SparkSession, qualified: String,
                               kind: String, cols: Seq[String]): DataFrame =
    buildRows(spark,
      IndexMeta("__scan", qualified, kind, cols,
        defaultParams(spark, qualified, kind, cols)),
      spark.table(qualified))

  /** The data-dependent parameters a `kind` index freezes at CREATE —
    * also what the scan-path fallback computes on the fly, so both
    * paths quantize/route identically against the CURRENT table. */
  private[engine] def defaultParams(spark: SparkSession, qualified: String,
                                    kind: String,
                                    cols: Seq[String]): Map[String, String] =
    kind match {
      case "ivf" => Map("k" -> DefaultIvfK.toString,
        "centroids" -> encodeMatrix(
          ivfCodebook(spark, qualified, cols.head, cols(1))))
      case "sq8" =>
        val (mn, mx) = sq8Scales(spark, qualified, cols(1))
        Map("mn" -> encodeVector(mn), "mx" -> encodeVector(mx))
      case "bands" => Map("shingleK" -> ShingleK.toString,
        "numHashes" -> NumHashes.toString, "bands" -> NumBands.toString)
      case "bloom" =>
        // freeze per-file sizing at CREATE (the data-dependent-params
        // contract): expected items = current rows-per-file with 1.5×
        // headroom for growth. Drift past it only RAISES the false-
        // positive rate (weaker pruning) — never a false negative, so
        // soundness does not depend on the estimate. fpp is validated
        // here so a bad conf fails the CREATE, not a probe.
        val tbl = spark.table(qualified)
        val files = math.max(1L, tbl.inputFiles.length.toLong)
        val rows = tbl.count()
        val per = math.min(8L * 1024 * 1024,
          math.max(1024L, rows / files + (rows / files) / 2))
        val fpp = spark.conf.getOption("spark.graft.index.bloom.fpp")
          .map(_.toDouble).getOrElse(0.03)
        require(fpp > 0.0 && fpp < 0.5,
          s"spark.graft.index.bloom.fpp must be in (0, 0.5), got $fpp")
        Map("expectedItems" -> per.toString, "fpp" -> fpp.toString)
      case _ => Map.empty
    }

  /** BM25 from a `postings` index: stats from the dl-carrier rows,
    * scoring via the same [[graft.operators.Search.scorePostings]]
    * kernel as the scan path — identical integer points. */
  def bm25(spark: SparkSession, qualified: String, name: String,
           p: graft.operators.Search.Bm25Params): DataFrame =
    bm25Over(indexData(spark, qualified, name), p)

  /** BM25 over postings-index-shaped rows (key, dl, w, tf + the dl-
    * carrier rows at w="") — works identically over [[indexData]] and
    * the [[scanRows]] fallback. */
  private[engine] def bm25Over(data: DataFrame,
                               p: graft.operators.Search.Bm25Params): DataFrame = {
    val stats = data.where(col("w") === "")
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val postings = data.where(col("w").isin(p.terms: _*))
      .select(col("key").as("doc_id"), col("dl"), col("w"), col("tf"))
    graft.operators.Search.scorePostings(postings, stats, p)
  }

  /** Top-k cosine neighbors for `queryKeys` from an `ivf` index: the
    * probe routes through the frozen codebook's cells, candidates are
    * index rows in the probed cells, and only candidate vectors are
    * fetched from the base table — the q41 shape over a persisted
    * assignment table. */
  def ivfNeighbors(spark: SparkSession, qualified: String, name: String,
                   queryKeys: Seq[Long], k: Int,
                   nprobe: Int = 4): DataFrame = {
    val meta = indexMeta(spark, qualified, name).getOrElse(
      throw new IllegalArgumentException(
        s"index $name does not exist on $qualified"))
    ivfNeighborsOver(spark, qualified, meta.keyCol, meta.payloadCol,
      decodeMatrix(meta.params("centroids")),
      indexData(spark, qualified, name), queryKeys, k, nprobe)
  }

  /** IVF probe over covering cell rows (cell, key, v) and an explicit
    * codebook — shared by the persisted-index path ([[indexData]] +
    * frozen centroids) and the scan fallback ([[scanRows]] + a
    * freshly-computed codebook).
    *
    * Probe I/O shape: query vectors come from the base table under a
    * pushed-down `key IN (...)` filter (tiny read); the probed cell
    * ids (≤ |queries|·nprobe) are collected and pushed as a
    * `cell IN (...)` filter on the covering rows — on the persisted
    * path that's a parquet scan whose cell-sorted row groups prune by
    * min/max stats, so candidate vectors are read from exactly the
    * probed cells and the base table is never re-scanned. */
  private[engine] def ivfNeighborsOver(spark: SparkSession, qualified: String,
                                       keyCol: String, payloadCol: String,
                                       cents: Seq[Seq[Double]],
                                       cells: DataFrame, queryKeys: Seq[Long],
                                       k: Int, nprobe: Int): DataFrame = {
    // the hint goes on the JOIN INPUT below, not here: `q` also feeds
    // the probed-cell collect, where a broadcast hint has no join to
    // attach to and Catalyst drops it with a HintErrorLogger warning —
    // a silently-ignored hint is how a plan regression hides
    val q = spark.table(qualified)
      .select(col(keyCol).cast("long").as("key"),
        col(payloadCol).cast("array<double>").as("v"))
      .where(col("v").isNotNull)
      .where(col("key").isin(queryKeys: _*))
      .select(col("key").as("query_id"), col("v").as("qv"),
        explode(transform(
          slice(ArrayOps.ivfCells(col("v"), cents, nprobe), 1, nprobe),
          s => s.getField("cell"))).as("cell"))
    // bounded collect: ≤ |queryKeys| · nprobe cell ids — the handle
    // that turns the candidate fetch into a pushed-down index filter
    val probedCells = q.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val cands = cells.where(col("cell").isin(probedCells: _*))
      .join(broadcast(q), Seq("cell"))
      .where(col("key") =!= col("query_id"))
      // one cell per key and distinct cells per query ⇒ no dup pairs;
      // dropDuplicates is the defensive pin of that invariant
      .dropDuplicates("query_id", "key")
    import org.apache.spark.sql.expressions.Window
    cands
      .withColumn("dot", expr(
        "aggregate(zip_with(qv, v, (a, b) -> a * b), 0D, (acc, x) -> acc + x)"))
      .withColumn("cos", col("dot") /
        (sqrt(expr("aggregate(transform(qv, x -> x * x), 0D, (a, x) -> a + x)")) *
         sqrt(expr("aggregate(transform(v, x -> x * x), 0D, (a, x) -> a + x)"))))
      .withColumn("rk", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("key").asc)))
      .where(col("rk") <= k)
      .select(col("query_id"), col("key").as("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }

  /** Decoded vectors from an `sq8` index (frozen scales) — the ADC
    * scoring input; the spec pins these against quantize-then-decode
    * computed directly from the base table. */
  def sq8Decoded(spark: SparkSession, qualified: String,
                 name: String): DataFrame = {
    val meta = indexMeta(spark, qualified, name).getOrElse(
      throw new IllegalArgumentException(
        s"index $name does not exist on $qualified"))
    val mn = decodeVector(meta.params("mn"))
    val mx = decodeVector(meta.params("mx"))
    indexData(spark, qualified, name)
      .withColumn("mnl", typedlit(mn)).withColumn("mxl", typedlit(mx))
      .withColumn("dv", expr(
        s"""transform(sequence(1, ${mn.length}), i ->
           |  element_at(mnl, i) + CAST(element_at(codes, i) AS DOUBLE)
           |    * (element_at(mxl, i) - element_at(mnl, i)) / 255.0D)""".stripMargin))
      .select(col("key"), col("dv"))
  }

  /** One column's file-skipping evidence for one file: the zonemap
    * envelope — numeric [mn, mx] (double-rounded true extrema; absent
    * for non-castable values) and textual [mn, mx] as RAW UTF-8 bytes
    * (exact for string columns — for numeric columns it is a rendering
    * and must not be used for ordering) — plus, when a `bloom` index
    * covers the column, the file's Bloom membership filter (equality/
    * IN evidence; `mightContain == false` proves absence). Bytes, not
    * java.lang.String: a string value carrying invalid UTF-8 (parquet
    * BINARY is read permissively) would decode to U+FFFD through
    * Row.getString and the corrupted bound could unsoundly prune a
    * file whose rows match. */
  final case class ZoneBounds(
      num: Option[(Double, Double)],
      str: Option[(Array[Byte], Array[Byte])],
      bloom: Option[org.apache.spark.util.sketch.BloomFilter] = None)

  /** Cheap metadata-only check: does `qualified` carry ANY fresh
    * file-skipping index (zonemap or bloom)? Callers that must run
    * Spark jobs just to BUILD a prunable predicate (the MERGE
    * file-scope's source key collection) gate on this first — a
    * table with no evidence can never prune, so the jobs would be
    * pure added latency (every micro-batch of a streaming upsert
    * into an unindexed table). */
  private def isSkipEvidenceIndex(spark: SparkSession, qualified: String,
                                  m: IndexMeta): Boolean =
    (m.kind == "zonemap" || m.kind == "bloom") &&
      !isStale(spark, qualified, m.name)

  private[graft] def hasSkipEvidence(spark: SparkSession,
                                     qualified: String): Boolean =
    indexesOf(spark, qualified)
      .exists(isSkipEvidenceIndex(spark, qualified, _))

  /** Per-file skipping evidence for the SELECT-path pruning rule:
    * fileHash → (lowercased column → [[ZoneBounds]]), unioned over
    * every FRESH `zonemap` and `bloom` index on `qualified` that
    * covers any of `cols`. Files without an evidence row simply don't
    * appear (the rule keeps them — pruning needs positive evidence).
    * Empty map when no usable index exists, so callers can bail
    * without a job. */
  private[graft] def zonemapFileBounds(
      spark: SparkSession, qualified: String,
      cols: Set[String]): Map[String, Map[String, ZoneBounds]] = {
    val metas = indexesOf(spark, qualified).filter(m =>
      isSkipEvidenceIndex(spark, qualified, m) &&
        m.cols.exists(c => cols.contains(c.toLowerCase)))
    if (metas.isEmpty) return Map.empty
    val filesys = fs(spark)
    // Planning-time cost control: reading the bounds is a (small)
    // Spark job, and the rule plans EVERY filtered SELECT on the
    // table — memoize per shard-listing fingerprint. Shard dirs are
    // recreated (new parquet part names inside, fresh modtimes) on
    // every sync, so (name, modtime) of the data dirs' children is a
    // faithful version key; a fingerprint change evicts atomically.
    val fp = metas.map { m =>
      val dataDir = new Path(indexDir(spark, qualified, m.name), "data")
      val listing =
        if (!filesys.exists(dataDir)) "absent"
        else filesys.listStatus(dataDir).toSeq
          .map(s => s"${s.getPath.getName}@${s.getModificationTime}")
          .sorted.mkString(",")
      s"${m.name}[$listing]"
    }.mkString(";")
    val cacheKey = (spark.conf.get("spark.sql.warehouse.dir"),
      qualified.toLowerCase, cols.toSeq.sorted.mkString(","))
    val cached = boundsCache.synchronized(boundsCache.get(cacheKey))
    if (cached != null && cached._1 == fp) return cached._2
    val rows = metas.flatMap { m =>
      // a concurrent sync (another session's DML) deletes/rebuilds
      // shard dirs between this listing and the read — the planning
      // path takes no lock by design, so a torn read must DEGRADE,
      // not fail the query. Returning partial/no evidence is always
      // sound: evidence is per-file and base files are immutable
      // under CoW (a replaced file gets a NEW path, so a surviving
      // shard row can never describe different rows than it did).
      // The memo fingerprint was taken from the pre-change listing,
      // so the next query re-reads the settled state.
      // NonFatal: an InterruptedException (query cancellation) must
      // propagate, not be degraded into "plan without evidence".
      // WARN, not debug: a DETERMINISTIC failure here (corrupt shard)
      // memoizes empty evidence under the unchanged fingerprint —
      // correct results, but pruning stays off until the next sync
      // rewrites the shards, and the operator should see why.
      try readEvidenceRows(spark, qualified, m, cols, filesys)
      catch {
        case scala.util.control.NonFatal(e) =>
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"skip-evidence read for ${m.name} on $qualified failed " +
              s"(${e.getMessage}); planning without it — if this " +
              "repeats on an idle table, the index shards are damaged: " +
              "run IndexManager.sync or DROP and re-CREATE the index")
          Seq.empty
      }
    }
    // one file+column can carry evidence from BOTH kinds — merge,
    // preferring whichever side each index actually populated
    val out = rows.groupBy(_._1).map { case (f, rs) =>
      f -> rs.groupBy(_._2).map { case (c, es) =>
        c -> es.map(_._3).reduce((a, b) => ZoneBounds(
          num = a.num.orElse(b.num), str = a.str.orElse(b.str),
          bloom = a.bloom.orElse(b.bloom)))
      }
    }
    boundsCache.synchronized(boundsCache.put(cacheKey, (fp, out)))
    out
  }

  /** One index's evidence rows: (fileHash, column, bounds). */
  private def readEvidenceRows(
      spark: SparkSession, qualified: String, m: IndexMeta,
      cols: Set[String],
      filesys: FileSystem): Seq[(String, String, ZoneBounds)] = {
    val dataDir = new Path(indexDir(spark, qualified, m.name), "data")
    if (!filesys.exists(dataDir)) Seq.empty
    else if (m.kind == "bloom") {
        // Bloom shards are ~1.2·expectedItems BYTES per (file, column)
        // — not the ~100-byte zonemap rows the planning cache was
        // sized for. Collecting a million-file table's filters to the
        // driver would be a planning-time memory blow-up at exactly
        // the scale the feature targets, so cap the bytes (one
        // metadata call) and skip the index's evidence past it: the
        // zonemap rows still contribute, correctness never depended
        // on bloom evidence being present.
        val cap = spark.conf
          .getOption("spark.graft.zonemap.select.bloom.maxBytes")
          .flatMap(_.toLongOption).getOrElse(256L * 1024 * 1024)
        val bytes =
          try filesys.getContentSummary(dataDir).getLength
          catch { case _: Exception => Long.MaxValue }
        if (bytes > cap) {
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"bloom index ${m.name} on $qualified holds $bytes shard " +
              s"bytes > spark.graft.zonemap.select.bloom.maxBytes=$cap; " +
              "skipping its planning-time evidence (raise the cap or " +
              "lower fpp/expectedItems to re-enable)")
          Seq.empty
        } else spark.read.parquet(dataDir.toString)
          .where(lower(col("col")).isin(cols.toSeq: _*))
          .select(col("f").cast("string"), lower(col("col")), col("bloom"))
          .collect().toSeq
          .map(r => (r.getString(0), r.getString(1), ZoneBounds(
            num = None, str = None,
            bloom = Option(r.getAs[Array[Byte]](2)).map(
              org.apache.spark.util.sketch.BloomFilter.readFrom))))
      }
      else spark.read.parquet(dataDir.toString)
        .where(lower(col("col")).isin(cols.toSeq: _*))
        .where(col("mn_num").isNotNull || col("mn").isNotNull)
        .select(col("f").cast("string"), lower(col("col")),
          col("mn_num"), col("mx_num"),
          col("mn").cast("binary"), col("mx").cast("binary"))
        .collect().toSeq
        .map(r => (r.getString(0), r.getString(1), ZoneBounds(
          num = if (r.isNullAt(2) || r.isNullAt(3)) None
                else Some((r.getDouble(2), r.getDouble(3))),
          str = if (r.isNullAt(4) || r.isNullAt(5)) None
                else Some((r.getAs[Array[Byte]](4), r.getAs[Array[Byte]](5))))))
  }

  /** Bounded LRU (access-order): a long-lived server session planning
    * over many tables/column sets must not accumulate per-file bounds
    * maps in driver memory forever — including for dropped tables. A
    * capacity eviction only costs the next query of that key one small
    * re-read; correctness rides the fingerprint, not residency. */
  private val BoundsCacheCap = 256
  private val boundsCache = new java.util.LinkedHashMap[
      (String, String, String),
      (String, Map[String, Map[String, ZoneBounds]])](16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[(String, String, String),
          (String, Map[String, Map[String, ZoneBounds]])]): Boolean =
      size() > BoundsCacheCap
  }

  /** Files a `zonemap` index proves CANNOT contain `value` for an
    * equality predicate on `column` — returned as the surviving shard
    * hash set so callers can measure pruning. */
  def zonemapPrune(spark: SparkSession, qualified: String, name: String,
                   column: String, value: Double): DataFrame = {
    requireFresh(spark, qualified, name)
    val dataDir = new Path(indexDir(spark, qualified, name), "data")
    spark.read.parquet(dataDir.toString)
      .where(col("col") === column)
      .where(col("mn_num").isNotNull &&
        (col("mn_num") > value || col("mx_num") < value))
      .select(col("f").as("prunable_shard"))
  }

  // ------------------------------------------------ frozen param helpers

  /** Deterministic codebook frozen at CREATE: the first k vectors in
    * key order (content-addressed enough for cell ROUTING — IVF
    * recall depends on probe count, not centroid optimality; a Lloyd
    * refinement can be layered the way q88 does for the query-side
    * codebooks). */
  /** Scan-fallback codebook for the index-aware ANN face — the same
    * deterministic first-k-by-key codebook [[create]] freezes. */
  private[engine] def scanIvfCodebook(spark: SparkSession, qualified: String,
                                      keyCol: String,
                                      vecCol: String): Seq[Seq[Double]] =
    ivfCodebook(spark, qualified, keyCol, vecCol)

  private def ivfCodebook(spark: SparkSession, qualified: String,
                          keyCol: String,
                          vecCol: String): Seq[Seq[Double]] = {
    val rows = spark.table(qualified)
      .select(col(keyCol).cast("long").as("k"),
        col(vecCol).cast("array<double>").as("v"))
      .where(col("v").isNotNull)
      .orderBy(col("k")).limit(DefaultIvfK)
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    require(rows.nonEmpty, s"cannot build ivf codebook: $qualified has no vectors")
    rows
  }

  private def sq8Scales(spark: SparkSession, qualified: String,
                        vecCol: String): (Seq[Double], Seq[Double]) = {
    val v = spark.table(qualified)
      .select(col(vecCol).cast("array<double>").as("v"))
      .where(col("v").isNotNull)
    val dim = v.select(size(col("v"))).head.getInt(0)
    val aggs = (1 to dim).flatMap(i => Seq(
      min(element_at(col("v"), i)).as(s"mn$i"),
      max(element_at(col("v"), i)).as(s"mx$i")))
    val row = v.agg(aggs.head, aggs.tail: _*).head
    ((0 until dim).map(i => row.getDouble(2 * i)),
     (0 until dim).map(i => row.getDouble(2 * i + 1)))
  }

  private def encodeVector(v: Seq[Double]): String = v.mkString(",")
  private def decodeVector(s: String): Seq[Double] =
    s.split(",").toSeq.map(_.toDouble)
  private def encodeMatrix(m: Seq[Seq[Double]]): String =
    m.map(encodeVector).mkString(";")
  private def decodeMatrix(s: String): Seq[Seq[Double]] =
    s.split(";").toSeq.map(decodeVector)
}
