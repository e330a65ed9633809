package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Relational, Similarity}

/** Pins the plan properties that decide whether a query survives a
  * 100x scale-up: filter pushdown into the parquet scan, column
  * pruning, broadcast joins for dimension tables, top-k without a
  * global sort, whole-stage codegen coverage. A green hash-compare
  * with a bad plan is a latent 100 TB outage — these specs make the
  * plan itself a tested artifact. */
class PlanQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  private def plan(q: String): String =
    Relational.queries(q)(spark, dir).queryExecution.executedPlan.toString

  /** Every WindowExec in an executed plan, descending through the
    * AQE wrappers (AdaptiveSparkPlanExec / QueryStageExec) that hide
    * their subtrees from a plain `collect`. */
  private def windowNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.window.WindowExec] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val here = p match {
      case w: org.apache.spark.sql.execution.window.WindowExec => Seq(w)
      case _ => Nil
    }
    val below = p match {
      case a: AdaptiveSparkPlanExec => windowNodes(a.executedPlan)
      case q: QueryStageExec        => windowNodes(q.plan)
      case _ => p.children.flatMap(windowNodes)
    }
    here ++ below
  }

  test("q1: shipdate predicate is pushed to the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushed filter in:\n$p")
  }

  test("q1: scan reads only the 7 needed columns of 11") {
    val p = plan("q1_pricing_summary")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_partkey"),
      s"column pruning failed: $readSchema")
  }

  test("q7: dimension joins are broadcast, fact table never shuffles for dims") {
    val p = plan("q7_join_multiway")
    assert(p.contains("BroadcastHashJoin"))
    // nation/region joins must not be sort-merge
    assert("SortMergeJoin".r.findAllIn(p).size <= 2,
      s"too many sort-merge joins (dims should broadcast):\n$p")
  }

  test("q10: range + IN predicates reach the scan") {
    val p = plan("q10_filter_combo")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)"), p)
    assert(p.contains("GreaterThanOrEqual(l_quantity,10"), p)
    // (plan toString truncates the full filter list; the range filter
    // appearing proves pushdown reached the parquet source)
  }

  test("q16: top-k plans as TakeOrderedAndProject, not global sort") {
    val p = plan("q16_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Exchange rangepartitioning"),
      s"global sort leaked into top-k plan:\n$p")
  }

  test("q8: IN-subquery form plans as a real join, not a per-row subquery") {
    val p = plan("q8_semijoin_in")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"))
  }

  test("aggregations use partial (map-side) aggregation") {
    val p = plan("q6_join_implicit")
    // two HashAggregates per groupBy = partial + final
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("whole-stage codegen covers the relational hot paths") {
    for (q <- Seq("q1_pricing_summary", "q6_join_implicit", "q13_scalar_numeric")) {
      // AQE finalizes the plan (and codegen decisions) at execution;
      // codegen'd operators then carry the "*(stageId)" prefix
      val df = Relational.queries(q)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("*("), s"$q lost whole-stage codegen:\n$p")
    }
  }

  test("knn: query side is broadcast (corpus side never shuffles)") {
    val p = Similarity.queries("q36_knn_brute")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"),
      s"corpus-side shuffle in knn plan:\n$p")
  }

  test("q41 IVF: no training stage, probes broadcast, cells join hash") {
    // round 1 ran KMeans.fit inside the query (a multi-pass driver-
    // coordinated job per invocation); the codebook is now a literal,
    // so the plan must be scan -> per-row cell assignment -> one
    // broadcast join -> window top-k, nothing else
    val df = Similarity.queries("q41_knn_ivf")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"probe join not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // cell assignment is expression work on the scan, not an ML stage:
    // the plan has exactly the corpus scans, no iterative subplans
    assert(!p.toLowerCase.contains("kmeans"), p)
  }

  test("q51 sketches: no Expand (multi-countDistinct x3 row blowup)") {
    // the first round-2 formulation planned countDistinct x2 + exact
    // percentile through Expand (x3 rows) and benched 41 s at sf0.1;
    // the two-stage form must keep Expand out of the plan
    val p = Similarity.queries("q51_approx_stats")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Expand"), s"Expand reappeared in q51 plan:\n$p")
    // exact distincts are two-stage hash aggregations
    assert("HashAggregate".r.findAllIn(p).size >= 4, p)
  }

  test("curation plans: broadcast decontam, top-k vocab, no Expand") {
    import graft.operators.Curation
    val p55 = Curation.queries("q55_decontam")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p55.contains("BroadcastHashJoin") && !p55.contains("SortMergeJoin"),
      s"benchmark side not broadcast:\n$p55")
    val p57 = Curation.queries("q57_vocab_topk")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p57.contains("TakeOrderedAndProject"), p57)
    assert(!p57.contains("Expand") && !p55.contains("Expand"))
  }

  test("text curation plans: per-row redact/normalize never shuffle; repetition is top-k") {
    val redact = graft.operators.TextAnalysis
      .queries("q58_pii_redact")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!redact.contains("Exchange"),
      s"PII redaction must be a pure per-row map:\n$redact")
    val norm = graft.operators.TextAnalysis
      .queries("q60_normalize")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!norm.contains("Exchange"),
      s"normalization must be a pure per-row map:\n$norm")
    val rep = graft.operators.TextAnalysis
      .queries("q59_repetition")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(rep.contains("TakeOrderedAndProject"),
      s"repetition ranking must plan as top-k, not a global sort:\n$rep")
  }

  test("sampling/mix plans: q62 one agg shuffle, q63 one window shuffle; both prune columns") {
    val p62 = graft.operators.Curation.queries("q62_stratified_sample")(spark, dir)
      .queryExecution.executedPlan.toString
    // per-row hash + rate gate stay in the scan stage: the ONLY
    // exchange is the final per-stratum aggregation
    assert("Exchange hashpartitioning".r.findAllIn(p62).size <= 1,
      s"q62 should shuffle once (final agg):\n$p62")
    val rs62 = p62.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!rs62.contains("source") && !rs62.contains("n_chars"),
      s"q62 reads unneeded columns: $rs62")

    val p63 = graft.operators.Curation.queries("q63_token_budget_mix")(spark, dir)
      .queryExecution.executedPlan.toString
    // the cumulative cut needs exactly one hash exchange on source
    // (window); the per-source agg reuses that partitioning
    assert("Exchange hashpartitioning".r.findAllIn(p63).size <= 2,
      s"q63 shuffles too much:\n$p63")
    assert(p63.contains("Window"), s"q63 lost its window:\n$p63")
    val rs63 = p63.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!rs63.contains("lang"), s"q63 reads unneeded columns: $rs63")
  }

  test("round-5 pipeline plans: packing windows once, importance broadcasts vocab, semdedup never all-pairs") {
    import graft.operators.{Curation, Similarity}
    // q66: the per-source window is the only partitioning the query
    // needs; the per-source agg must reuse it (one hash exchange, as
    // q63 — the global-ordering formulation would be a scale killer)
    val p66 = Curation.queries("q66_sequence_packing")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p66.contains("Window"), s"q66 lost its window:\n$p66")
    assert("Exchange hashpartitioning".r.findAllIn(p66).size <= 2,
      s"q66 shuffles too much:\n$p66")
    val rs66 = p66.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!rs66.contains("lang") && !rs66.contains("n_chars"),
      s"q66 reads unneeded columns: $rs66")
    // q67: segment frequency is a hash aggregation, never a cartesian;
    // only doc_id + text leave the scan
    val p67 = Curation.queries("q67_boilerplate_segments")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p67.contains("CartesianProduct"), s"q67 went all-pairs:\n$p67")
    val rs67 = p67.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!rs67.contains("lang") && !rs67.contains("source"),
      s"q67 reads unneeded columns: $rs67")
    // q69: the unigram vocab is corpus-proportional, so the per-token
    // join is UN-hinted (AQE broadcasts small, shuffles large — the
    // forced-estimate test below pins the large case); the final
    // top-20 is TakeOrderedAndProject either way
    val p69 = Curation.queries("q69_importance_scores")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p69.contains("CartesianProduct"), s"q69 went all-pairs:\n$p69")
    assert(p69.contains("TakeOrderedAndProject"),
      s"q69 top-k must not be a global sort:\n$p69")
    // q68: the pairwise pass stays cell-scoped — an equi-join on cell,
    // never a cartesian, and no training stage (the codebook is a
    // literal, same invariant as q41)
    val p68 = Similarity.queries("q68_semdedup")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p68.contains("CartesianProduct"), s"q68 went all-pairs:\n$p68")
    assert(p68.contains("ivf_cells"), s"q68 lost the native assignment:\n$p68")
  }

  test("round-5 retrieval/card plans: bm25 posting filter + broadcasts, gopher zero-shuffle, rollup single Expand, decontam corpus-local") {
    import graft.operators.{Curation, Search, Similarity, TextAnalysis}
    // q72: the token stream filters to the query terms BEFORE any
    // exchange; df + stats join back as broadcasts; top-k is
    // TakeOrderedAndProject — the corpus never shuffles
    val p72 = Search.bm25(spark, dir, Search.DefaultQuery)
      .queryExecution.executedPlan.toString
    assert(p72.contains("BroadcastHashJoin") || p72.contains("BroadcastNestedLoopJoin"),
      s"q72 df/stats join not broadcast:\n$p72")
    assert(!p72.contains("SortMergeJoin"), s"q72 shuffled the corpus for a join:\n$p72")
    assert(p72.contains("TakeOrderedAndProject"),
      s"q72 top-k must not be a global sort:\n$p72")
    val rs72 = p72.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!rs72.contains("lang") && !rs72.contains("n_chars"),
      s"q72 reads unneeded columns: $rs72")
    // q73: a pure per-row rule evaluation — no exchange anywhere
    val p73 = TextAnalysis.queries("q73_gopher_rules")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p73.contains("Exchange"), s"q73 must not shuffle:\n$p73")
    // q76: ROLLUP = one Expand + one aggregation exchange, no
    // count-distinct blowup beyond the 3 grouping levels
    val p76 = Curation.queries("q76_dataset_card")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Expand".r.findAllIn(p76).size == 1, s"q76 Expand count:\n$p76")
    assert("Exchange hashpartitioning".r.findAllIn(p76).size <= 1,
      s"q76 shuffles too much:\n$p76")
    // q75: benchmark side broadcast; corpus side scans once with no
    // shuffle before the final ordered limit
    val p75 = Similarity.queries("q75_embed_decontam")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p75.contains("BroadcastNestedLoopJoin"),
      s"q75 bench side not broadcast:\n$p75")
    assert(p75.contains("TakeOrderedAndProject"),
      s"q75 ranking must not be a global sort:\n$p75")
    // q74: one shuffle on cell for the window + agg; native assignment
    val p74 = Similarity.queries("q74_cluster_sample")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p74.contains("ivf_cells"), s"q74 lost the native assignment:\n$p74")
    assert(!p74.contains("CartesianProduct"), s"q74 went all-pairs:\n$p74")
  }

  test("q69/q82: vocabulary joins survive a forced-large estimate (no corpus-proportional build side)") {
    // The round-5 defect: q82/q69 force-broadcast doc-frequency /
    // unigram-weight tables that are VOCABULARY-sized — fine at sf0.1,
    // an OOM at 100 TB (10⁸-10⁹ terms). The fix is an un-hinted join;
    // this pin simulates the huge-vocabulary case by disabling
    // broadcast thresholds entirely (static + AQE). A surviving
    // broadcast() hint would still plan BroadcastHashJoin under -1;
    // the un-hinted join must fall back to a shuffle on `w`. The
    // one-ROW sides (corpus stats, n_docs) keep their explicit hints —
    // those plan as BroadcastNestedLoopJoin cross joins and are
    // scale-safe at any corpus size.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = confs.map(k => k -> spark.conf.getOption(k))
    confs.foreach(k => spark.conf.set(k, "-1"))
    try {
      for ((name, df) <- Seq(
        "q69" -> graft.operators.Curation
          .queries("q69_importance_scores")(spark, dir),
        "q82" -> graft.operators.Search
          .queries("q82_tfidf_keywords")(spark, dir))) {
        df.collect() // finalize the AQE plan
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastHashJoin"),
          s"$name still broadcasts a vocabulary-sized side under forced-large estimate:\n$p")
        assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
          s"$name lost its shuffle join on w:\n$p")
      }
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q41d: two-level IVF has no cartesian product and broadcasts only probe/centroid sides") {
    // the whole point of the two-level index: the k-sized fine
    // codebook is a JOINED table, never a plan literal — so the plan
    // must be equi-joins (ccell, then cell) with the broadcast
    // reserved for the tiny query-probe list; any CartesianProduct
    // means routing collapsed to all-pairs
    val df = graft.operators.Similarity.queries("q41d_knn_ivf2")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"q41d degenerated to all-pairs:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"q41d should broadcast the tiny probe list:\n$p")
  }

  test("q87: incremental probe stays shuffle-joined under a forced-large estimate") {
    // Both sides of the incremental band join are corpus-proportional
    // (the batch is a shard of a crawl, the corpus bands are the whole
    // ingested set), and q87 carries no broadcast() hints — under
    // disabled thresholds every join must fall back to a shuffle; at
    // real scale the corpus side is the bucketBy(bh) table and AQE
    // broadcasts the shard side only when it actually fits.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = confs.map(k => k -> spark.conf.getOption(k))
    confs.foreach(k => spark.conf.set(k, "-1"))
    try {
      // q87 (the probe) carries every corpus-proportional join of the
      // incremental family in ONE inspectable plan; q87b's copy of the
      // same pipeline now executes behind its survivor localCheckpoint
      // (the double-compute fix), so its executed plan shows only the
      // checkpoint scan + the final anti — assert the probe, then that
      // q87b still evaluates end-to-end under the forced estimates.
      val probe = graft.operators.Dedup
        .queries("q87_incremental_neardup")(spark, dir)
      probe.collect()
      val p = probe.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin"),
        s"q87 broadcasts a corpus-proportional side under forced-large estimate:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"q87 lost its shuffle joins:\n$p")
      val keep = graft.operators.Dedup
        .queries("q87b_incremental_keep")(spark, dir)
      val kp = keep.queryExecution.executedPlan.toString
      assert(!kp.contains("CartesianProduct"),
        s"q87b degenerated to all-pairs under forced-large estimate:\n$kp")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q70b/q67b/q83: salted span shapes stay shuffle-joined under a forced-large estimate") {
    // The salted path exists FOR the huge-corpus case, so its
    // join-back must not depend on the duplicated-key set being
    // broadcastable: with broadcast thresholds disabled the plan has
    // to keep a shuffle join on the span key (which AQE's skew-join
    // splitting can then handle — the property the window shape
    // lacks) and, by construction, no Window over the raw hot key.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = confs.map(k => k -> spark.conf.getOption(k))
    confs.foreach(k => spark.conf.set(k, "-1"))
    try {
      val docsDf = graft.sources.Tables.load(spark, dir, "documents")
      for ((name, df) <- Seq(
        "q70b" -> graft.operators.Dedup.spanCoverage(docsDf, 5, 8),
        "q83"  -> graft.operators.Dedup.spanDedupApply(docsDf, 5, 8),
        "q67b" -> graft.operators.Curation.boilerplateSegments(docsDf, 3, 8))) {
        df.collect() // finalize the AQE plan
        val p = df.queryExecution.executedPlan.toString
        // the hazard is a window PARTITIONED BY the hot span key (one
        // reducer owns the whole boilerplate key); doc_id-partitioned
        // windows (the r16 interval-union coverage tail) are doc-scoped
        // and skew-free by construction. Walk the executed plan's
        // WindowExec nodes and check the partition expressions' REFERENCE
        // columns (not attribute-name substrings, which an alias evades):
        // every window must partition on doc-scoped columns only.
        val docScoped = Set("doc_id")
        for (w <- windowNodes(df.queryExecution.executedPlan);
             e <- w.partitionSpec;
             ref <- e.references.toSeq)
          assert(docScoped.contains(ref.name),
            s"$name windows on non-doc-scoped column '${ref.name}' " +
              s"(skew hazard on the hot span key):\n$p")
        assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
          s"$name lost its shuffle join on the span key:\n$p")
      }
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q85/q86: LM-vocab joins survive a forced-large estimate; chunking never shuffles") {
    // q85's bigram LM is CORPUS-PROPORTIONAL (same hazard class as
    // q69/q82's vocabularies): both the cb⋈cu build join and the
    // instance-scoring join must be un-hinted so they degrade to a
    // shuffle when the LM outgrows broadcast. The 1-row V side keeps
    // its hint. q86 chunking is pure per-row codegen — any Exchange
    // in its plan is a regression.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = confs.map(k => k -> spark.conf.getOption(k))
    confs.foreach(k => spark.conf.set(k, "-1"))
    try {
      val df = graft.operators.Curation.queries("q85_lm_rarity")(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin"),
        s"q85 still broadcasts a vocabulary-sized side under forced-large estimate:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"q85 lost its shuffle join on the bigram key:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
    val chunks = graft.operators.Curation.queries("q86_chunk_overlap")(spark, dir)
    chunks.collect()
    val cp = chunks.queryExecution.executedPlan.toString
    assert(!cp.contains("Exchange"), s"q86 chunking gained a shuffle:\n$cp")
  }

  test("q35b: candidate join streams the pinned probe partitioning (BHJ, explicit numPartitions)") {
    // The serial-stage fix (round 8) hinges on two plan properties
    // holding TOGETHER: (a) the pair join builds a hash table from the
    // unpinned side and STREAMS the probe side, so (b) the probe's
    // explicit REPARTITION_BY_NUM — exempt from AQE coalescing —
    // is the partitioning the quadratic pair-explosion stage actually
    // runs at. If (a) flipped to a sort-merge join, EnsureRequirements
    // would insert a fresh coalescible shuffle on `h` and the pin
    // would be dead code (the ADVICE r8 scenario) — this pin makes
    // that regression loud.
    val df = graft.operators.Dedup.queries("q35b_prefix_join")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"q35b candidate join no longer broadcasts+streams — the probe pin is bypassed:\n$p")
    val n = spark.sparkContext.defaultParallelism
    assert(p.contains("REPARTITION_BY_NUM") &&
        p.matches("(?s).*hashpartitioning\\(doc_id[^)]*, h[^)]*, " + n + "\\).*"),
      s"q35b probe side lost its explicit $n-partition pin:\n$p")
  }

  test("q84 intra-doc dedup is a bare scan: document-local work never shuffles") {
    // the whole operator is per-document by definition
    // (IntraDocDedupExpr); any Exchange is a regression back to the
    // relational 6-shuffle formulation
    val df = graft.operators.Dedup.queries("q84_intradoc_dedup")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"q84 gained a shuffle:\n$p")
  }

  test("partition-pruned UPDATE reads only affected partitions") {
    // the rewrite scan must carry the partition predicate so partition
    // pruning bounds the IO (EngineSpec proves the file-level effect;
    // this pins the plan-level cause)
    val e = new graft.engine.QueryEngine(spark)
    e.execute("CREATE DATABASE IF NOT EXISTS pq")
    e.execute("DROP TABLE IF EXISTS pq.t")
    e.execute("CREATE TABLE pq.t (id int64, region string) STORAGE filesystem PARTITION BY (region)")
    e.execute("INSERT INTO pq.t VALUES (1,'eu'),(2,'us')")
    val scan = spark.table("pq.t")
      .where(org.apache.spark.sql.functions.col("region") <=> "eu")
      .queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("region"), s"partition filter missing:\n$scan")
    e.execute("DROP TABLE pq.t")
  }

  test("q96c: classifier apply is scan + partial agg — no joins, no model table") {
    // the trained weights ride as a literal; the corpus pass must be
    // a bare scan into a two-stage aggregate. A join in this plan
    // means the model leaked back in as data.
    val df = graft.operators.Classifier.queries("q96c_perceptron_apply")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("Join"), s"q96c gained a join:\n$p")
    assert(p.split("Exchange").length - 1 <= 1,
      s"q96c should shuffle once (the final agg):\n$p")
  }

  test("q97: leakage-safe split joins only cluster-sized metadata") {
    // the corpus side scans once with its per-row bucket; the two
    // joins (membership, rep-bucket) are against dup-cluster-sized
    // tables — an all-pairs shape here means the split re-derived
    // candidates instead of reusing the cluster artifact
    val df = graft.operators.Dedup.queries("q97_leakage_safe_split")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"q97 all-pairs:\n$p")
  }

  test("q95b: float pass is shortlist-pruned — corpus vectors enter one join only") {
    // stage 1 streams the 16-byte codes (the deliberate broadcast
    // nested loop against 10 query codes); stage 2 must fetch exact
    // vectors through equi-joins keyed on the shortlist — a second
    // nested-loop with the full vectors means the prefilter bought
    // nothing
    val df = graft.operators.Similarity.queries("q95b_binary_rerank")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val nested = p.split("BroadcastNestedLoopJoin").length - 1
    assert(nested <= 1, s"q95b: float pass degenerated to all-pairs:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"q95b shortlist join missing:\n$p")
  }

  test("q99: range join plans as a binned equi-join, never a nested loop") {
    // an inequality-only join's native Spark plan is
    // BroadcastNestedLoopJoin — O(|A|·|B|) pair evaluations; the
    // binning rewrite must make every join in the plan an equi-join
    val df = Relational.queries("q99_range_join")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"q99 range join degenerated to a nested loop:\n$p")
    assert(!p.contains("CartesianProduct"), s"q99 went all-pairs:\n$p")
  }

  test("q106: Levenshtein DP runs above its own spread exchange, banded, behind the barrier") {
    // the 10x forensic (SCALING.md round 14 / commit history): the
    // candidate distinct already partitions on (doc1, doc2), broadcast
    // joins preserve it, and AQE coalesces that tiny exchange to 2
    // tasks — so without a DISTINCT-keyed REPARTITION_BY_NUM the
    // O(len^2) DP serializes (224 s of task time in 2 tasks). Pin:
    // a REPARTITION_BY_NUM exchange exists, the levenshtein sits in a
    // Generate (the pushdown barrier) with its per-row threshold (the
    // banded-DP form), and the plan keeps the threshold filter above
    // the Generate rather than pushed into the join stage.
    val df = graft.operators.Dedup.queries("q106_edit_distance_dedup")(spark, dir)
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("REPARTITION_BY_NUM"),
      s"q106 lost its spread exchange (DP will serialize at scale):\n$p")
    assert(p.contains("Generate explode(array(struct(d, levenshtein"),
      s"q106 levenshtein must live inside the Generate barrier:\n$p")
    assert(p.contains("levenshtein(t1") && p.contains("Some(cast"),
      s"q106 levenshtein lost its per-row threshold (banded DP):\n$p")
  }
}
