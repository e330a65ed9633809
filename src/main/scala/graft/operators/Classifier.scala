package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Text

/** TRAINED linear quality classifier — the third trained-model family
  * next to the Lloyd codebook (q88) and the BPE tokenizer (q89): the
  * fastText-style "train a cheap linear scorer, apply it to the whole
  * corpus" loop production curation pipelines run (CCNet's fastText
  * quality filter, GPT-3's WebText classifier).
  *
  * Algorithm: the DISTRIBUTED PERCEPTRON by iterative parameter
  * mixing (McDonald, Hall & Mann, NAACL 2010) — the published
  * shared-nothing training shape: each of [[S]] shards runs an ONLINE
  * perceptron pass over its own documents, the S weight vectors are
  * averaged, and the average seeds the next epoch. Shards are
  * CONTENT-ADDRESSED (md5(text) mod S) and walked in doc_id order, so
  * the "online" pass is a deterministic fold per shard no matter how
  * Spark physically partitions the data — which is what makes a
  * sequential-update algorithm bit-exactly replayable: the DuckDB
  * oracle replays every epoch as a recursive CTE folding the same
  * shard sequences, and the epoch average uses both engines' native
  * truncating integer division (Scala `/` == DuckDB `//`).
  *
  * Features are hashed unigram counts (the hashing trick, [[D]]
  * buckets via the md5 family's chars 9-16 slice — the SimHash
  * hi-word slice) + a constant-1 bias slot: integers end to end, so
  * no float summation order can flip a margin anywhere.
  *
  * The training target is the stopword-DENSITY gate
  * `20*stop_ct >= n_tokens` (stop ratio >= 5% — the CCNet-style
  * "natural language vs word soup" signal). The target is linear in
  * token counts with an integer margin, so the perceptron provably
  * converges — and measurably does: training error hits 0 within 16
  * epochs at sf0.001/0.01/0.1 and is then a FIXED POINT (no
  * misclassifications → no updates → the average returns the same
  * vector), so the fixed [[Epochs]] is deterministic, not a tuned
  * stop. Docs inside the ±[[Deadband]] margin band are excluded from
  * training (distant-supervision practice: don't teach the model the
  * boundary noise), which is what gives the separation a real margin.
  *
  * Scale shape: the feature table is built once (one corpus pass +
  * one count shuffle), then repartitioned by shard and externally
  * sorted ONCE (a shard never has to fit in memory) and cached in
  * that layout — at 100 TB it would be a materialized table bucketed
  * and sorted by (shard, doc_id). Each epoch is then ONE single-stage
  * Spark job: one streaming fold per shard over the cached sorted
  * partitions, and an S-row collect (the bounded-collect contract;
  * compare Lloyd's k rows). Epoch count is a small constant — the q89
  * merge-per-round hazard does not apply. More shards = more
  * parallelism and a coarser mix; S is the only knob.
  */
object Classifier {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Hashed feature buckets; one extra constant-1 bias slot. D=128
    * keeps the driver corpus's 31-word vocabulary collision-free
    * between stop and non-stop words (measured; a mixed bucket blurs
    * the target and costs margin, it does not break correctness). */
  private[graft] val D = 128
  private[graft] val NF = D + 1
  private[graft] val S = 8
  private[graft] val Deadband = 20
  private[graft] val Epochs = 16

  /** The linear training target: +1 iff stop-ratio >= 5%, as the
    * integer cross-multiplication 20*stop_ct - n_tokens >= 0. */
  private def margCol = lit(20) * Text.stopwordCount(
    Text.tokens(col("text"))) - size(Text.tokens(col("text")))

  /** Corpus/batch partition for the incremental story (q96d) — the
    * q87 convention: doc_id % 10 == 7 marks the ARRIVING batch. */
  private def partCol(part: Int): Column = part match {
    case 0 => col("doc_id") % 10 =!= 7
    case 1 => col("doc_id") % 10 === 7
    case _ => lit(true)
  }

  /** Labeled training docs outside the deadband: (doc_id, sh, y). */
  private def labeled(s: SparkSession, dir: String,
                      part: Int = -1): DataFrame = {
    val in = docs(s, dir).where(partCol(part))
    // CONDITIONAL spread (the q51 sketchIn pattern): on a warehouse
    // layout the scan is already parallel and the deadband filter
    // pushing into it is FREE parallelism — no exchange is added. At
    // fixture layout (one row group → one task) the pushed filter
    // would run both tokenizations serially (the r13 serial-suspect
    // entries for the q96 family), so spread by doc_id first
    // (REPARTITION_BY_NUM: AQE-coalesce-exempt) and block the
    // pushdown with a one-element explode — a predicate on generator
    // OUTPUT cannot cross the Generate. A window barrier was measured
    // 10x CPU here (it severs whole-stage codegen downstream); the
    // Generate keeps scan-to-aggregate in one codegen region.
    val spreadTarget = s.sparkContext.defaultParallelism
    // both branches emit (doc_id, text, marg); marg is computed INSIDE
    // the barrier struct so the deadband filter and the label
    // projection reference the generated FIELD — evaluated once per
    // row — instead of each re-deriving the two tokenizations (the
    // filter and the projection are separate codegen expressions, so
    // cross-referencing the raw formula re-ran it per consumer)
    val spread =
      if (in.rdd.getNumPartitions >= spreadTarget)
        in.select(col("doc_id"), col("text"), margCol.as("marg"))
      else in
        .repartition(spreadTarget, col("doc_id"))
        .select(explode(array(struct(
          col("doc_id"), col("text"), margCol.as("marg")))).as("r"))
        .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"),
                col("r.marg").as("marg"))
    spread
      .where(abs(col("marg")) >= Deadband)
      .select(col("doc_id"), col("text"),
        (conv(substring(md5(col("text").cast("binary")), 1, 8), 16, 10)
          .cast("long") % S).as("sh"),
        col("marg"))
      .withColumn("y", when(col("marg") >= 0, 1L).otherwise(-1L))
  }

  /** Dense integer feature vectors: (sh, doc_id, y, x[NF]) with
    * x = hashed unigram counts ++ [1]. One count shuffle; the dense
    * assembly is per-row map lookup, zero extra shuffle. */
  private[graft] def examples(s: SparkSession, dir: String,
                              part: Int = -1): DataFrame = {
    val lab = labeled(s, dir, part)
    val sparse = lab
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
      .withColumn("j",
        conv(substring(md5(col("tok").cast("binary")), 9, 8), 16, 10)
          .cast("long") % D)
      .groupBy(col("doc_id"), col("j"))
      .agg(count(lit(1)).as("c"))
    // explicit exchange (coalesce-exempt) for the dense assembly: the
    // ENSURE_REQUIREMENTS exchange AQE would plan here coalesces to
    // ONE partition at fixture bytes, serializing the per-doc
    // 129-slot array build (~0.7 s, the residual q96 serial suspect);
    // hash(doc_id) is also exactly the distribution the examples join
    // consumes, so no extra shuffle is added either way
    val dense = sparse
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("j"), col("c"))))
        .as("m"))
      .select(col("doc_id"),
        expr(s"""transform(sequence(0, ${D - 1}),
                |  i -> coalesce(element_at(m, CAST(i AS BIGINT)), 0L))"""
          .stripMargin).as("hx"))
    lab.select(col("doc_id"), col("sh"), col("y"))
      .join(dense, Seq("doc_id"))
      .select(col("sh"), col("doc_id"), col("y"),
              expr("concat(hx, array(1L))").as("x"))
  }

  /** Model store (the lloydBooks pattern): weights are a
    * deterministic artifact of an immutable corpus — train once per
    * JVM. */
  private val weightMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Long]]()

  /** Bench hook (the q61/q88/q89 contract): drop trained weights so a
    * MEASURED pass times the actual training epochs. */
  def clearPerceptronMemo(): Unit = weightMemo.clear()

  private[graft] def trainWeights(s: SparkSession, dir: String): Seq[Long] =
    weightMemo.computeIfAbsent(dir, _ =>
      mixEpochs(s, examples(s, dir), Seq.fill(NF)(0L), Epochs))

  /** Warm-start epochs of q96d's incremental update. */
  private[graft] val IncEpochs = 4

  private val incMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Long]]()

  /** q96d model: ONLINE MODEL MAINTENANCE — the corpus-trained base
    * continues training on the ARRIVING batch only (doc_id%10==7,
    * q87's convention), seeded with the base weights: the warm-start
    * protocol that keeps a deployed filter current without re-reading
    * the corpus. Batch epochs cost O(batch), not O(corpus), and if
    * the base already classifies the batch perfectly the update is a
    * NO-OP by the fixed-point argument (no misclassification -> no
    * updates -> the mix returns the seed) — drift in the arriving
    * data is exactly what makes the weights move. */
  private[graft] def incrementalWeights(s: SparkSession,
                                        dir: String): Seq[Long] =
    incMemo.computeIfAbsent(dir, _ => {
      val base = mixEpochs(s, examples(s, dir, part = 0),
        Seq.fill(NF)(0L), Epochs)
      mixEpochs(s, examples(s, dir, part = 1), base, IncEpochs)
    })

  /** The IPM training loop: `epochs` rounds of per-shard online fold
    * + truncated-mean mix, from an arbitrary seed. */
  private def mixEpochs(s: SparkSession, exDf: DataFrame,
                        init: Seq[Long], epochs: Int): Seq[Long] = {
      import s.implicits._
      // The shard layout is epoch-INVARIANT — only the seed vector
      // changes between rounds — so shuffle + external-sort ONCE and
      // cache the sorted partitions (a cached partition replays rows
      // in stored order, so the per-shard doc_id fold order is
      // preserved). Every epoch is then a single-stage job: cache
      // scan -> streaming fold -> S-row collect. Before this, each
      // epoch re-ran the repartition+sort (two stages + a shuffle per
      // epoch): with ~0.2 s of task time against multi-second walls,
      // the operator's cost IS the per-epoch stage floor, and this
      // halves it. At 100 TB the cached form is the same materialized
      // shard-bucketed table the scale note above calls for.
      // r16: the epoch loop runs on the RAW RDD of the sorted shard
      // layout, not the Dataset — `ds.mapPartitions(f).collect()`
      // re-runs Catalyst analysis/optimization/codegen on every epoch
      // (a fixed ~tens-of-ms planning job per epoch, 16-20 epochs per
      // training, three trainings across the q96 family), while the
      // fold itself is plain JVM code over the same rows in the same
      // per-partition order. The RDD cache preserves partitioning and
      // stored row order exactly as the Dataset cache did, so every
      // epoch is now a scheduler-only job: same data, same fold, same
      // weights.
      val ex = exDf.repartition(S, col("sh"))
        .sortWithinPartitions(col("sh"), col("doc_id"))
        .select(col("sh"), col("y"), col("x"))
        .as[(Long, Long, Seq[Long])]
        .rdd
        // MEMORY_AND_DISK explicitly: the bare RDD default is
        // MEMORY_ONLY, under which an evicted partition re-runs the
        // repartition+sort shuffle every epoch — spill-instead-of-
        // recompute is what the cache-once design relies on
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        var w = init
        for (_ <- 0 until epochs) {
          val seed = w.toArray
          val perShard = ex
            .mapPartitions { it =>
              val out =
                scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Long])]
              var cur = Long.MinValue
              var wv: Array[Long] = null
              it.foreach { case (sh, y, x) =>
                if (sh != cur) {
                  if (wv != null) out += ((cur, wv))
                  cur = sh; wv = seed.clone()
                }
                var dot = 0L; var k = 0
                while (k < wv.length) { dot += wv(k) * x(k); k += 1 }
                if (y * dot <= 0L) {
                  k = 0
                  while (k < wv.length) { wv(k) += y * x(k); k += 1 }
                }
              }
              if (wv != null) out += ((cur, wv))
              out.iterator
            }.collect() // <= S rows — the bounded-collect contract
          // parameter mixing: truncated integer mean over all S
          // shards; a shard with no training docs contributes its
          // unchanged seed
          val sums = Array.fill(NF)(0L)
          perShard.foreach { case (_, ws) =>
            var k = 0; while (k < NF) { sums(k) += ws(k); k += 1 } }
          val absent = S - perShard.length
          w = (0 until NF).map(k => (sums(k) + absent * seed(k)) / S)
        }
        w
      } finally { ex.unpersist(); () }
  }

  /** Bench hook for the incremental model (the q61 contract). */
  def clearIncMemo(): Unit = incMemo.clear()

  /** q96: the trained model — (j, weight) for the D hashed slots +
    * bias (j = NF). The artifact a model registry stores. */
  def perceptronWeights(s: SparkSession, dir: String): DataFrame = {
    val w = trainWeights(s, dir)
    import s.implicits._
    w.zipWithIndex.map { case (wt, k) => (k + 1L, wt) }
      .toDF("j", "weight")
  }

  /** Per-row margin of the trained model over a `text` column:
    * Σ_tok w[bucket(tok)] + w[bias] — algebraically equal to the
    * dense w·x (Σ_j c_j·w_j groups the same integer terms) but
    * needs NO explode/groupBy: scoring is a single codegen'd fold
    * per row, which is both the cheapest batch APPLY shape and the
    * stateless streaming face ([[graft.streaming.DocStream
    * .qualityScoreStream]] uses this very Column, so online and
    * offline scoring cannot drift). */
  def scoreExpr(w: Seq[Long]): Column = {
    val wl = typedlit(w)
    aggregate(
      Text.tokens(col("text")),
      lit(w.last),
      (acc, t) => acc + element_at(wl,
        (conv(substring(md5(t.cast("binary")), 9, 8), 16, 10)
          .cast("long") % D + 1).cast("int")))
  }

  /** q96b: APPLY the trained model — score every labeled doc and
    * cross-tabulate prediction vs label: the distillation-fidelity
    * confusion matrix (diagonal-only == the model reproduces the
    * gate exactly). Scoring is the per-row [[scoreExpr]] fold —
    * zero shuffle until the 2x2 aggregation. */
  def perceptronConfusion(s: SparkSession, dir: String): DataFrame = {
    val w = trainWeights(s, dir)
    labeled(s, dir)
      .select(col("y").as("label"),
              when(scoreExpr(w) > 0, 1L).otherwise(-1L).as("pred"))
      .groupBy(col("label"), col("pred"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** q96d: the incrementally-updated model — (j, weight) after the
    * warm-start epochs on the arriving batch. Diff against q96 to see
    * exactly which feature weights the new data moved. */
  def incrementalWeightsDf(s: SparkSession, dir: String): DataFrame = {
    val w = incrementalWeights(s, dir)
    import s.implicits._
    w.zipWithIndex.map { case (wt, k) => (k + 1L, wt) }
      .toDF("j", "weight")
  }

  /** q98: QUALITY-SCORE CURRICULUM — the global training order (q90's
    * machinery: bucket counts -> broadcast offsets -> bucket-local
    * rank, ONE corpus shuffle, no global sort) with the TRAINED
    * classifier as the curriculum key: predicted-clean docs first
    * (band 0), predicted-noisy last (band 1), content-hash shuffled
    * within each band. Two trained-artifact compositions in one
    * operator: the model orders the stream the training run consumes
    * — the "clean data first" curriculum a pretraining pipeline
    * actually schedules. */
  def scoreCurriculum(s: SparkSession, dir: String): DataFrame = {
    val w = trainWeights(s, dir)
    Curation.globalOrderBy(docs(s, dir),
      when(scoreExpr(w) > 0, 0L).otherwise(1L), seed = "")
  }

  /** q96c: the trained model as the CURATION GATE — keep docs the
    * classifier scores positive, report kept docs/tokens per source:
    * the actual corpus-shrinking step the model was distilled FOR
    * (CCNet applies its fastText filter exactly here). Per-row
    * [[scoreExpr]] + one partial-agg summary; at 100 TB this is one
    * pass over the corpus with a D+1-long literal riding along —
    * no joins, no model table, nothing to skew. */
  def perceptronApply(s: SparkSession, dir: String): DataFrame = {
    val w = trainWeights(s, dir)
    docs(s, dir)
      .withColumn("keep", scoreExpr(w) > 0)
      .withColumn("tk", size(Text.tokens(col("text"))))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
           sum(when(col("keep"), col("tk")).otherwise(0L)).as("kept_tokens"))
  }

  // ---------------------------------------------------------------
  // DuckDB oracle: the examples table + EVERY training epoch as a
  // recursive CTE folding each shard's doc sequence (the sequential
  // replay the deterministic sharding makes possible), then the
  // truncated-mean mix — the q88/q89 full-replay pattern.
  // ---------------------------------------------------------------

  /** One rendering, name-prefixed so the incremental oracle can
    * carry TWO example sets (corpus + batch) in one statement;
    * `filter` restricts the labeled side (sparse features join-prune
    * themselves). */
  private def exampleCtes(p: String, filter: String): String =
    s"""${p}lab AS MATERIALIZED (
       |  SELECT doc_id, text,
       |    ('0x' || substring(md5(text), 1, 8))::BIGINT % $S AS sh,
       |    20 * len(list_filter(string_split(text, ' '),
       |          x -> list_contains(['the','a','of','and','to','in'], x)))
       |      - len(string_split(text, ' ')) AS marg
       |  FROM documents $filter),
       |${p}lab2 AS MATERIALIZED (
       |  SELECT doc_id, sh,
       |    CASE WHEN marg >= 0 THEN CAST(1 AS BIGINT)
       |         ELSE CAST(-1 AS BIGINT) END AS y
       |  FROM ${p}lab WHERE abs(marg) >= $Deadband),
       |${p}sparse AS MATERIALIZED (
       |  SELECT doc_id, j, CAST(count(*) AS BIGINT) AS c FROM (
       |    SELECT doc_id,
       |      ('0x' || substring(md5(tok), 9, 8))::BIGINT % $D AS j
       |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |          FROM documents))
       |  GROUP BY doc_id, j),
       |${p}dense AS MATERIALIZED (
       |  SELECT doc_id, list(j ORDER BY j) AS hk, list(c ORDER BY j) AS hv
       |  FROM ${p}sparse GROUP BY doc_id),
       |${p}ex0 AS MATERIALIZED (
       |  SELECT l.doc_id, l.sh, l.y,
       |    list_append(
       |      list_transform(generate_series(0, ${D - 1}), i ->
       |        CAST(coalesce(d.hv[list_position(d.hk, i)], 0) AS BIGINT)),
       |      CAST(1 AS BIGINT)) AS x
       |  FROM ${p}lab2 l JOIN ${p}dense d ON d.doc_id = l.doc_id),
       |${p}ex AS MATERIALIZED (
       |  SELECT sh, doc_id, y, x,
       |    row_number() OVER (PARTITION BY sh ORDER BY doc_id) AS rn
       |  FROM ${p}ex0),
       |${p}shards AS MATERIALIZED (SELECT DISTINCT sh FROM ${p}ex),
       |${p}shcnt AS MATERIALIZED (
       |  SELECT sh, count(*) AS c FROM ${p}ex GROUP BY sh)""".stripMargin

  private def epochCtes(p: String, e: Int): String =
    s"""${p}rec$e(sh, i, w) AS (
       |  SELECT s.sh, 0, p.w FROM ${p}shards s CROSS JOIN ${p}w${e - 1} p
       |  UNION ALL
       |  SELECT r.sh, r.i + 1,
       |    CASE WHEN t.y * list_sum(list_transform(range(1, ${NF + 1}),
       |                k -> r.w[k] * t.x[k])) <= 0
       |         THEN list_transform(range(1, ${NF + 1}),
       |                k -> r.w[k] + t.y * t.x[k])
       |         ELSE r.w END
       |  FROM ${p}rec$e r JOIN ${p}ex t ON t.sh = r.sh AND t.rn = r.i + 1),
       |${p}fin$e AS MATERIALIZED (
       |  SELECT r.sh, r.w FROM ${p}rec$e r
       |  JOIN ${p}shcnt n ON n.sh = r.sh AND r.i = n.c),
       |${p}w$e AS MATERIALIZED (
       |  SELECT list(v ORDER BY j) AS w FROM (
       |    SELECT g.j,
       |      CAST(COALESCE(t.s, 0)
       |           + ($S - (SELECT count(*) FROM ${p}shards)) * p.w[g.j]
       |           AS BIGINT) // $S AS v
       |    FROM (SELECT unnest(generate_series(1, $NF)) AS j) g
       |    LEFT JOIN (
       |      SELECT u.j AS j, CAST(sum(u.v) AS BIGINT) AS s FROM (
       |        SELECT unnest(w) AS v,
       |          unnest(generate_series(1, $NF)) AS j
       |        FROM ${p}fin$e) u
       |      GROUP BY u.j) t ON t.j = g.j
       |    CROSS JOIN ${p}w${e - 1} p))""".stripMargin

  private def zeroW(p: String): String =
    s"""${p}w0 AS MATERIALIZED (
       |  SELECT list_transform(generate_series(1, $NF),
       |                        k -> CAST(0 AS BIGINT)) AS w)""".stripMargin

  private def trainCtes: String =
    (Seq(s"WITH RECURSIVE ${exampleCtes("", "")}", zeroW("")) ++
      (1 to Epochs).map(e => epochCtes("", e))).mkString(",\n")

  /** q96d oracle: the corpus chain (c-prefixed, 16 epochs from zero)
    * feeds the batch chain (b-prefixed, 4 epochs seeded with cw16) in
    * ONE statement — the full warm-start protocol replayed. */
  def incrementalOracleSql: String =
    (Seq(
      s"WITH RECURSIVE ${exampleCtes("c", "WHERE doc_id % 10 <> 7")}",
      zeroW("c")) ++
      (1 to Epochs).map(e => epochCtes("c", e)) ++
      Seq(
        exampleCtes("b", "WHERE doc_id % 10 = 7"),
        s"bw0 AS MATERIALIZED (SELECT w FROM cw$Epochs)") ++
      (1 to IncEpochs).map(e => epochCtes("b", e)))
      .mkString(",\n") +
    s"""
       |SELECT CAST(u.j AS BIGINT) AS j, CAST(u.v AS BIGINT) AS weight
       |FROM (SELECT unnest(w) AS v,
       |        unnest(generate_series(1, $NF)) AS j
       |      FROM bw$IncEpochs) u""".stripMargin

  def weightsOracleSql: String =
    s"""$trainCtes
       |SELECT CAST(u.j AS BIGINT) AS j, CAST(u.v AS BIGINT) AS weight
       |FROM (SELECT unnest(w) AS v,
       |        unnest(generate_series(1, $NF)) AS j
       |      FROM w$Epochs) u""".stripMargin

  def confusionOracleSql: String =
    s"""$trainCtes,
       |p AS (
       |  SELECT t.y AS label,
       |    CASE WHEN list_sum(list_transform(range(1, ${NF + 1}),
       |               k -> t.x[k] * m.w[k])) > 0
       |         THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS pred
       |  FROM ex t CROSS JOIN w$Epochs m)
       |SELECT label, pred, count(*) AS n_docs
       |FROM p GROUP BY label, pred""".stripMargin

  /** q96c oracle: the per-row token fold replayed over the trained
    * w$Epochs list — score = w[bias] + sum_tok w[bucket(tok)+1]. */
  def applyOracleSql: String =
    s"""$trainCtes,
       |sc AS (
       |  SELECT t.doc_id,
       |    m.w[$NF] + CAST(coalesce(sum(
       |      m.w[('0x' || substring(md5(t.tok), 9, 8))::BIGINT % $D + 1]),
       |      0) AS BIGINT) AS sc
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |        FROM documents) t
       |  CROSS JOIN w$Epochs m
       |  GROUP BY t.doc_id, m.w[$NF])
       |SELECT d.source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN s.sc > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_kept,
       |  CAST(sum(CASE WHEN s.sc > 0
       |                THEN len(string_split(d.text, ' '))
       |                ELSE 0 END) AS BIGINT) AS kept_tokens
       |FROM documents d JOIN sc s ON s.doc_id = d.doc_id
       |GROUP BY d.source""".stripMargin

  /** q98 oracle: per-doc score over the trained chain (q96c's fold),
    * banded keep-first, then the q90 global-order replay. */
  def curriculumOracleSql: String =
    s"""$trainCtes,
       |sc AS (
       |  SELECT t.doc_id,
       |    m.w[$NF] + CAST(coalesce(sum(
       |      m.w[('0x' || substring(md5(t.tok), 9, 8))::BIGINT % $D + 1]),
       |      0) AS BIGINT) AS sc
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |        FROM documents) t
       |  CROSS JOIN w$Epochs m
       |  GROUP BY t.doc_id, m.w[$NF]),
       |o AS (
       |  SELECT d.doc_id,
       |    CASE WHEN s.sc > 0 THEN CAST(0 AS BIGINT)
       |         ELSE CAST(1 AS BIGINT) END AS band,
       |    md5('' || d.text) AS h
       |  FROM documents d JOIN sc s ON s.doc_id = d.doc_id)
       |SELECT doc_id, band,
       |  row_number() OVER (ORDER BY band, h, doc_id) AS global_pos
       |FROM o""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q96_perceptron_weights" -> ((s, dir) => perceptronWeights(s, dir)),
    "q96b_perceptron_confusion" -> ((s, dir) => perceptronConfusion(s, dir)),
    "q96c_perceptron_apply" -> ((s, dir) => perceptronApply(s, dir)),
    "q96d_perceptron_incremental" -> ((s, dir) => incrementalWeightsDf(s, dir)),
    "q98_score_curriculum" -> ((s, dir) => scoreCurriculum(s, dir)))

  val oracleSql: Map[String, String] = Map(
    "q96_perceptron_weights" -> weightsOracleSql,
    "q96b_perceptron_confusion" -> confusionOracleSql,
    "q96c_perceptron_apply" -> applyOracleSql,
    "q96d_perceptron_incremental" -> incrementalOracleSql,
    "q98_score_curriculum" -> curriculumOracleSql)
}
