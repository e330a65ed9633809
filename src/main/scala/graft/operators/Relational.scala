package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** The relational operator surface of the reference engine
  * (SURVEY.md §2.2-§2.8), re-expressed with the DataFrame API so
  * Catalyst plans every one of them (pushdown, partial aggregation,
  * broadcast joins, TakeOrderedAndProject for top-k).
  *
  * Reference semantics covered here:
  *  - projections/filters/predicates  (ranger parser.go:4900-5204, 4329-4804)
  *  - implicit multi-table join + WHERE equi-filter (parser.go:4824-4898)
  *  - IN/EXISTS subqueries → semi/anti joins (ast.go:411-432)
  *  - COUNT/SUM/AVG/MIN/MAX, GROUP BY, HAVING (parser.go:5801-5875)
  *  - ORDER BY / LIMIT / OFFSET / top-k (parser.go:4176-4269)
  *  - DISTINCT, UNION [ALL] (parser.go:4063-4067, 4155-4170)
  *  - scalar functions UPPER/LOWER/LENGTH/TRIM/SUBSTRING/CONCAT/POSITION/
  *    REVERSE/ROUND/CAST/COALESCE/CASE (ast.go:599-677)
  *  - supersets the reference lacks: window functions, INTERSECT/EXCEPT,
  *    COUNT(DISTINCT), per-key sort direction (SURVEY §2.5-§2.7)
  *
  * Conventions shared with the DuckDB oracle (driver's t2 gate):
  *  - every computed column is aliased identically on both sides;
  *  - double aggregates are round()ed so summation-order FP noise
  *    cannot flip the hash compare;
  *  - counts stay BIGINT (both engines), extracted date parts and
  *    string lengths are cast to INT on the oracle side to match
  *    Spark's native result types;
  *  - LIMIT queries carry a total order (unique tie-break key).
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------- queries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- aggregation family ------------------------------------------------
    "q1_pricing_summary" -> ((s, dir) => {
      // TPC-H Q1 shape: scan-filter-partial agg-final agg. Only the 7
      // needed columns reach the scan (column pruning) and the shipdate
      // predicate is pushed to parquet row groups.
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg("l_quantity"), 2).as("avg_qty"),
          round(avg("l_extendedprice"), 2).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    "q2_agg_minmax" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          round(min("o_totalprice"), 2).as("min_price"),
          round(max("o_totalprice"), 2).as("max_price"),
          round(avg("o_totalprice"), 2).as("avg_price"))),

    "q3_count_distinct" -> ((s, dir) =>
      // superset: the reference cannot parse COUNT(DISTINCT …) (SURVEY §2.4)
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          countDistinct(col("o_custkey")).as("n_custs"),
          count(lit(1)).as("n_orders"))),

    "q4_having" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
             round(sum("o_totalprice"), 2).as("total_spent"))
        .where(col("n_orders") >= 3)),

    "q5_group_by_expr" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("o_year"),
                 month(col("o_orderdate")).as("o_month"))
        .agg(count(lit(1)).as("n_orders"),
             round(sum("o_totalprice"), 2).as("monthly_total"))),

    "q44_percentiles" -> ((s, dir) =>
      // exact interpolated percentiles (percentile == DuckDB
      // quantile_cont); approx_percentile/HLL are the scale path but
      // cannot hash-match a different engine's sketch. ONE array
      // percentile aggregate: three scalar percentile() calls each
      // buffer the group's full value map — 3x the dominant cost.
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          expr("percentile(o_totalprice, array(0.5D, 0.9D, 0.99D))").as("ps"),
          count(lit(1)).as("n"))
        .select(
          col("o_orderstatus"),
          round(element_at(col("ps"), 1), 2).as("p50"),
          round(element_at(col("ps"), 2), 2).as("p90"),
          round(element_at(col("ps"), 3), 2).as("p99"),
          col("n"))),

    "q45_asof_lastpurchase" -> ((s, dir) => {
      // as-of join, composed form: for every event, the value of that
      // user's most recent 'purchase' at-or-before it. Running max over
      // the event-time order gives the as-of lookup without a range
      // join — one shuffle on user_id, no pairwise comparison.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("last_purchase_value",
          last(when(col("event_type") === "purchase", col("value")), true).over(w))
        .select(col("event_id"), col("user_id"), col("event_type"),
                col("last_purchase_value"))
    }),

    "q46_rollup" -> ((s, dir) =>
      // ROLLUP superset (reference has no grouping sets — SURVEY §2.4)
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
             round(sum("o_totalprice"), 2).as("total"))),

    "q46b_cube" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_items"),
             round(sum("l_quantity"), 2).as("total_qty"))),

    "q47_array_ops" -> ((s, dir) =>
      // array accessor/aggregate superset over the embedding column
      t(s, dir, "embeddings")
        .select(
          col("vec_id"),
          element_at(col("embedding"), 1).cast("double").as("first_dim"),
          size(col("embedding")).as("dim"),
          expr("CAST(array_max(transform(embedding, x -> CAST(x AS DOUBLE))) AS DOUBLE)").as("max_dim"),
          expr("CAST(array_min(transform(embedding, x -> CAST(x AS DOUBLE))) AS DOUBLE)").as("min_dim"))),

    "q48_date_funcs" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 500)
        .select(
          col("o_orderkey"),
          col("o_orderdate").cast("date").as("od"),
          (col("o_orderdate") + expr("INTERVAL 30 DAYS")).cast("date").as("od30"),
          datediff(lit("2000-01-01").cast("date"),
                   col("o_orderdate").cast("date")).as("days_to_y2k"),
          dayofweek(col("o_orderdate")).as("dow"),
          quarter(col("o_orderdate")).as("qtr"))),

    "q49_explode_tokens" -> ((s, dir) =>
      // lateral explode / UNNEST: token-level rows from documents
      t(s, dir, "documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("n"),
             countDistinct(col("doc_id")).as("n_docs"))),

    // -- join family -------------------------------------------------------
    "q6_join_implicit" -> ((s, dir) => {
      // ranger's only join form: FROM a, b WHERE a.k = b.k
      // (parser.go:4824-4898). Catalyst turns the equi-filtered cross
      // join into a proper equi-join; at scale the orders side shuffles
      // on the key while customer (smaller) broadcasts under AQE.
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
             round(sum("o_totalprice"), 2).as("segment_revenue"))
    }),

    "q7_join_multiway" -> ((s, dir) => {
      // 5-way star join. Dims (region, nation) are broadcast explicitly:
      // at 100 TB the fact table never shuffles for a dim join.
      val r  = broadcast(t(s, dir, "region"))
      val n  = broadcast(t(s, dir, "nation"))
      val c  = t(s, dir, "customer")
      val o  = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    "q8_semijoin_in" -> ((s, dir) => {
      // IN (subquery) → left-semi join (ast.go:411-415)
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    }),

    "q9_antijoin_exists" -> ((s, dir) => {
      // NOT EXISTS → left-anti join (ast.go:428-432)
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
        .select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    "q99_range_join" -> ((s, dir) => {
      // Pure time-RANGE join, NO equi key: for every 'view' event, the
      // site-wide purchases in the following 10 minutes. Spark's only
      // native plan for an inequality-only join is a nested loop over
      // every (view, purchase) pair — O(|A|·|B|), 400M pair
      // evaluations at sf0.1 and unrunnable at 100 TB. The scale shape
      // bins both sides to window-width buckets: a purchase inside
      // [ta, ta+W) lives in bucket(ta) or bucket(ta)+1, so exploding
      // each view row to those two buckets turns the range predicate
      // into a ONE-SHUFFLE equi-join + exact residual filter, with
      // ≤2× replication of one side and candidates bounded by genuine
      // bucket co-residents (PlanQualitySpec pins the no-nested-loop
      // shape; SCALING.md has the naive-vs-binned A/B). Bucket
      // arithmetic stays in integer microseconds — `div`, not a
      // double divide — so the oracle replays bit-exactly.
      val ev = t(s, dir, "events")
      val views = ev.where(col("event_type") === "view")
        .select(col("event_id"), unix_micros(col("ts")).as("ta"))
      val buys = ev.where(col("event_type") === "purchase")
        .select(unix_micros(col("ts")).as("tb"), col("value"))
      rangeJoinBinned(views, buys, 600L * 1000000L) // 10 min in µs
    }),

    "q50_shipping_priority" -> ((s, dir) => {
      // TPC-H Q3 shape: selective date filters on both join sides reach
      // the scans, 3-way join, aggregate, top-10 by revenue
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      val li = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1997-01-01"))
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(col("l_orderkey"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // -- predicate family --------------------------------------------------
    "q10_filter_combo" -> ((s, dir) =>
      // BETWEEN + IN (list) + NOT + AND/OR (ast.go:255-426)
      t(s, dir, "lineitem")
        .filter(col("l_quantity").between(10, 20)
          && col("l_returnflag").isin("A", "R")
          && !(col("l_discount") > 0.05))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
                col("l_discount"))),

    "q11_filter_like_null" -> ((s, dir) =>
      t(s, dir, "part")
        .filter(col("p_name").like("%old%") && col("p_size").isNotNull)
        .select(col("p_partkey"), col("p_name"), col("p_size"))),

    // -- scalar function family -------------------------------------------
    "q12_scalar_string" -> ((s, dir) =>
      t(s, dir, "customer")
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("up_name"),
          lower(col("c_mktsegment")).as("low_seg"),
          length(col("c_name")).as("name_len"),
          substring(col("c_name"), 1, 8).as("name_pre"),
          concat(col("c_name"), lit("_"), col("c_mktsegment")).as("tagged"),
          reverse(col("c_name")).as("rev_name"),
          trim(col("c_name")).as("trimmed"))),

    "q13_scalar_numeric" -> ((s, dir) =>
      // arithmetic + - * / %  (parser.go:5877-5968) + CAST + ROUND
      t(s, dir, "lineitem")
        .filter(col("l_linenumber") === 1)
        .select(
          col("l_orderkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("charge"),
          floor(col("l_quantity")).cast("bigint").as("qty_floor"),
          (col("l_orderkey") % 7).as("key_mod"),
          // no round(): per-row IEEE arithmetic is bit-identical across
          // engines, while round() at half-cent boundaries is not
          (col("l_extendedprice") / col("l_quantity")).as("unit_price"),
          (col("l_quantity") + col("l_tax") - col("l_discount")).as("mixed"))),

    "q14_case_coalesce" -> ((s, dir) =>
      t(s, dir, "customer")
        .select(
          col("c_custkey"),
          when(col("c_acctbal") < 0, lit("negative"))
            .when(col("c_acctbal") < 5000, lit("mid"))
            .otherwise(lit("high")).as("bal_band"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg_or_other"))),

    "q15_position" -> ((s, dir) =>
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          expr("position('o' IN p_name)").cast("int").as("pos_o"),
          expr("position('ECONOMY' IN p_type)").cast("int").as("pos_econ"))),

    "q52_null_semantics" -> ((s, dir) =>
      // NULL-safe equality + null-aware aggregates over the props-k
      // extraction (which yields NULLs when the key is absent)
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.missing").cast("int"))
        .select(
          col("event_id"),
          col("k").isNull.as("k_is_null"),
          (col("k") <=> lit(null)).as("k_nullsafe_eq_null"),
          coalesce(col("k"), lit(-1)).as("k_or_default"),
          (col("k") === lit(1)).as("k_eq_one"))),

    "q53_string_funcs2" -> ((s, dir) =>
      t(s, dir, "customer")
        .select(
          col("c_custkey"),
          lpad(col("c_mktsegment"), 12, "*").as("seg_lpad"),
          rpad(col("c_mktsegment"), 12, ".").as("seg_rpad"),
          regexp_replace(col("c_name"), "[0-9]+", "#").as("name_masked"),
          translate(col("c_mktsegment"), "AEIOU", "aeiou").as("seg_lower_vowels"),
          repeat(lit("-"), 3).as("dashes"),
          split(col("c_name"), "#").getItem(0).as("name_head"))),

    // -- sort / limit family ----------------------------------------------
    "q16_topk" -> ((s, dir) =>
      // ORDER BY … LIMIT → Catalyst TakeOrderedAndProject: each partition
      // keeps only k rows, the driver merges k*p — no global sort at scale.
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)),

    "q17_limit_offset" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
        .offset(10).limit(20)),

    "q18_distinct" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_mktsegment")).distinct()),

    // -- set operation family ---------------------------------------------
    "q19_union" -> ((s, dir) => {
      val a = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
        .select(col("c_custkey").as("custkey"))
      val b = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("custkey"))
      a.union(b).distinct()   // UNION implies dedup (SURVEY §2.7)
    }),

    "q20_union_all" -> ((s, dir) => {
      val a = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
        .select(col("c_custkey").as("custkey"), lit("rich_customer").as("src"))
      val b = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("custkey"), lit("big_order").as("src"))
      a.union(b)
    }),

    "q21_intersect" -> ((s, dir) => {
      // superset: reference has no INTERSECT/EXCEPT (SURVEY §2.7)
      val a = t(s, dir, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("custkey"))
      val b = t(s, dir, "orders").select(col("o_custkey").as("custkey"))
      a.intersect(b)
    }),

    "q22_except" -> ((s, dir) => {
      val a = t(s, dir, "customer").select(col("c_custkey").as("custkey"))
      val b = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
        .select(col("o_custkey").as("custkey"))
      a.except(b)
    }),

    // -- window family (superset; SURVEY §2.5) ----------------------------
    "q23_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
                row_number().over(w).cast("bigint").as("rn"))
        .where(col("rn") <= 3)
    }),

    "q24_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
                round(sum(col("o_totalprice")).over(w), 2).as("running_total"))
    }),

    "q16b_topk_per_key" -> ((s, dir) =>
      // per-key top-k via the custom TopKPerKey operator (plans/):
      // bounded heap per key, no sort exchange — the window+row_number
      // formulation this replaces sorts every group
      graft.plans.TopKPerKey(
        t(s, dir, "orders").select(col("o_orderpriority"), col("o_orderkey"),
                                   col("o_totalprice")),
        keys = Seq("o_orderpriority"),
        orderBy = Seq("o_totalprice" -> true, "o_orderkey" -> false),
        k = 3)),

    // -- temporal family ---------------------------------------------------
    "q25_events_daily" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n_events"),
             round(sum("value"), 2).as("total_value"),
             countDistinct(col("user_id")).as("n_users"))),

    "q25b_props_json" -> ((s, dir) =>
      // semi-structured column: JSON props extracted + aggregated
      t(s, dir, "events")
        .select(col("event_type"),
                get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
             sum(col("k")).as("sum_k"),
             min(col("k")).as("min_k"),
             max(col("k")).as("max_k"),
             round(avg(col("k")), 4).as("avg_k"))),

    "q79_funnel" -> ((s, dir) => {
      // 3-stage ordered funnel (view -> click -> purchase): each stage
      // counts users whose first qualifying event follows their
      // previous stage's time — the product-analytics staple. Stage
      // tables shrink monotonically but are |users|-sized (corpus-
      // proportional, NOT a bounded dimension), so the joins carry no
      // broadcast hint: AQE broadcasts them at small scale and
      // falls back to a shuffle join on user_id at billions of users
      // — per-user state stays bounded either way. The event scan
      // filters by type BEFORE each groupBy, so each stage shuffles
      // only its own event type.
      val ev = t(s, dir, "events").select(col("user_id"), col("event_type"), col("ts"))
      val s1 = ev.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val s2 = ev.where(col("event_type") === "click")
        .join(s1, "user_id").where(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val s3 = ev.where(col("event_type") === "purchase")
        .join(s2, "user_id").where(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      ev.agg(countDistinct(col("user_id")).as("n_users"))
        .crossJoin(s1.agg(count(lit(1)).as("n_view")))
        .crossJoin(s2.agg(count(lit(1)).as("n_view_click")))
        .crossJoin(s3.agg(count(lit(1)).as("n_full_funnel")))
    }),

    "q80_retention" -> ((s, dir) =>
      // cohort retention: users grouped by first-activity day, counted
      // on each later activity day offset 0..7 — the engagement panel
      // every events warehouse serves. The first-day table is
      // |users|-sized (corpus-proportional), so no broadcast hint:
      // AQE broadcasts at small scale, shuffles on user_id at
      // billions of users. Activity dedupes (user, day) with partial
      // aggregation before the join.
      {
        val ev = t(s, dir, "events")
          .select(col("user_id"), col("ts").cast("date").as("day"))
        val first = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
        val activity = ev.distinct()
        activity.join(first, "user_id")
          .withColumn("offset", datediff(col("day"), col("cohort")))
          .where(col("offset").between(0, 7))
          .groupBy(col("cohort"), col("offset"))
          .agg(countDistinct(col("user_id")).as("n_users"))
      }),

    "q26_sessionize" -> ((s, dir) => {
      // gap-based sessionization (30 min): the batch analog of what
      // Structured Streaming's session windows do with state.
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
               col("ts").cast("double") - col("prev_ts").cast("double") > 1800.0, 1L)
            .otherwise(0L))
        .withColumn("session_id",
          sum(col("new_session")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"))
        .agg(max(col("session_id")).as("n_sessions"),
             count(lit(1)).as("n_events"))
    }),

    "q23b_window_nav" -> ((s, dir) => {
      // navigation-function family (superset — SURVEY §2.5): LAG/LEAD/
      // NTILE/FIRST/LAST over each customer's order history. All five
      // specs share the o_custkey partitioning + (date, key) sort, so
      // one shuffle and one sort serve the whole select; the
      // whole-partition last_price frame reuses that sort. ntile is
      // cast to BIGINT to match DuckDB's result type.
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val wAll =
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      // window-parallelism pin: HashPartitioning(o_custkey, P)
      // satisfies the window's required distribution, so this replaces
      // (not adds to) the window's own exchange — but being explicit
      // it is exempt from AQE coalescing, which otherwise runs the
      // five-function sort+window stage ~4-way at fixture bytes
      t(s, dir, "orders")
        .repartition(s.sparkContext.defaultParallelism, col("o_custkey"))
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"),
          round(lag(col("o_totalprice"), 1).over(w), 2).as("prev_price"),
          round(lead(col("o_totalprice"), 1).over(w), 2).as("next_price"),
          ntile(4).over(w).cast("bigint").as("quartile"),
          round(first(col("o_totalprice")).over(w), 2).as("first_price"),
          round(last(col("o_totalprice")).over(wAll), 2).as("last_price"))
    }),

    "q46c_grouping_sets" -> ((s, dir) =>
      // explicit GROUPING SETS (superset): status-only, priority-only
      // and grand-total — strictly fewer expanded groups than q46b's
      // CUBE; Catalyst's Expand emits 3 projections per row into ONE
      // partially-aggregated shuffle (no per-set rescan).
      t(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
             round(sum("o_totalprice"), 2).as("total"))),

    "q46e_unpivot" -> ((s, dir) =>
      // UNPIVOT / melt (superset): three measure columns become
      // (measure, val) rows — a zero-shuffle per-row Expand (3
      // projections per input row), then one partial-agg shuffle.
      t(s, dir, "lineitem")
        .unpivot(
          ids = Array(col("l_returnflag")),
          values = Array(col("l_quantity"), col("l_extendedprice"),
                         col("l_discount")),
          variableColumnName = "measure",
          valueColumnName = "val")
        .groupBy(col("l_returnflag"), col("measure"))
        .agg(round(sum(col("val")), 2).as("total"),
             count(lit(1)).as("n"))),

    "q25c_gapfill" -> ((s, dir) => {
      // calendar gap-fill / resample: daily event counts with missing
      // (event_type, day) combinations zero-filled over the observed
      // date range. The spine is types × days — two TINY dims (a
      // 1-row bounds agg exploded by sequence(), and the distinct
      // types), so the cross join is broadcast-cheap at any corpus
      // size; the corpus-sized daily agg then left-joins onto it.
      val ev = t(s, dir, "events")
      val daily = ev
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
      val days = ev
        .agg(min(col("ts").cast("date")).as("d0"),
             max(col("ts").cast("date")).as("d1"))
        .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val types = ev.select(col("event_type")).distinct()
      types.crossJoin(days)
        .join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
                coalesce(col("n"), lit(0L)).as("n_events"))
    }),

    "q46d_pivot" -> ((s, dir) =>
      // PIVOT with a FIXED value list: no extra distinct-values job and
      // a stable output schema — the only pivot form that scales (a
      // discovered value list is a driver-side collect over the corpus).
      // Catalyst rewrites it to one pass of conditional aggregates,
      // exactly the oracle's CASE formulation.
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority",
               Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                   "5-LOW"))
        .agg(round(sum("o_totalprice"), 2))
        .select(col("o_orderstatus"),
          col("`1-URGENT`").as("p_urgent"), col("`2-HIGH`").as("p_high"),
          col("`3-MEDIUM`").as("p_medium"),
          col("`4-NOT SPECIFIED`").as("p_notspec"),
          col("`5-LOW`").as("p_low")))
  )

  // ---------------------------------------------------------------- oracle

  /** DuckDB-runnable SQL with identical semantics and column names. */
  val oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  round(avg(l_extendedprice), 2) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q2_agg_minmax" ->
      """SELECT o_orderpriority,
        |  count(*) AS n_orders,
        |  round(min(o_totalprice), 2) AS min_price,
        |  round(max(o_totalprice), 2) AS max_price,
        |  round(avg(o_totalprice), 2) AS avg_price
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q3_count_distinct" ->
      """SELECT o_orderstatus,
        |  count(DISTINCT o_custkey) AS n_custs,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q4_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_spent
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 3""".stripMargin,

    "q5_group_by_expr" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(month(o_orderdate) AS INTEGER) AS o_month,
        |  count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS monthly_total
        |FROM orders GROUP BY 1, 2""".stripMargin,

    "q47_array_ops" ->
      """SELECT vec_id,
        |  CAST(embedding[1] AS DOUBLE) AS first_dim,
        |  CAST(len(embedding) AS INTEGER) AS dim,
        |  CAST(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS DOUBLE) AS max_dim,
        |  CAST(list_min(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS DOUBLE) AS min_dim
        |FROM embeddings""".stripMargin,

    "q48_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS od,
        |  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS od30,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INTEGER) AS days_to_y2k,
        |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr
        |FROM orders WHERE o_orderkey < 500""".stripMargin,

    "q49_explode_tokens" ->
      """SELECT tok, count(*) AS n, count(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |      FROM documents WHERE doc_id < 50)
        |GROUP BY tok""".stripMargin,

    "q50_shipping_priority" ->
      """SELECT l_orderkey, o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem, orders
        |WHERE l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |GROUP BY l_orderkey, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,

    "q44_percentiles" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
        |  round(quantile_cont(o_totalprice, 0.99), 2) AS p99,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q45_asof_lastpurchase" ->
      """SELECT event_id, user_id, event_type,
        |  last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS last_purchase_value
        |FROM events""".stripMargin,

    "q46_rollup" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,

    "q46b_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS n_items,
        |  round(sum(l_quantity), 2) AS total_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "q6_join_implicit" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS segment_revenue
        |FROM customer, orders
        |WHERE c_custkey = o_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q7_join_multiway" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem, orders, customer, nation, region
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q8_semijoin_in" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')""".stripMargin,

    "q9_antijoin_exists" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 300000)""".stripMargin,

    "q99_range_join" ->
      // the oracle states the range join DIRECTLY (DuckDB's IEJoin
      // executes inequality joins natively); the Spark side's binned
      // equi-join must reproduce it bit-exactly
      """SELECT v.event_id,
        |  count(b.tb) AS n_purchases,
        |  coalesce(round(sum(b.value), 2), 0.0) AS purchase_value
        |FROM (SELECT event_id, epoch_us(ts) AS ta FROM events
        |      WHERE event_type = 'view') v
        |LEFT JOIN (SELECT epoch_us(ts) AS tb, value FROM events
        |           WHERE event_type = 'purchase') b
        |  ON b.tb >= v.ta AND b.tb < v.ta + 600000000
        |GROUP BY v.event_id""".stripMargin,

    "q10_filter_combo" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20
        |  AND l_returnflag IN ('A', 'R')
        |  AND NOT (l_discount > 0.05)""".stripMargin,

    "q11_filter_like_null" ->
      """SELECT p_partkey, p_name, p_size FROM part
        |WHERE p_name LIKE '%old%' AND p_size IS NOT NULL""".stripMargin,

    "q12_scalar_string" ->
      """SELECT c_custkey,
        |  upper(c_name) AS up_name,
        |  lower(c_mktsegment) AS low_seg,
        |  CAST(length(c_name) AS INTEGER) AS name_len,
        |  substring(c_name, 1, 8) AS name_pre,
        |  c_name || '_' || c_mktsegment AS tagged,
        |  reverse(c_name) AS rev_name,
        |  trim(c_name) AS trimmed
        |FROM customer""".stripMargin,

    "q13_scalar_numeric" ->
      """SELECT l_orderkey,
        |  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
        |  CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
        |  l_orderkey % 7 AS key_mod,
        |  l_extendedprice / l_quantity AS unit_price,
        |  l_quantity + l_tax - l_discount AS mixed
        |FROM lineitem WHERE l_linenumber = 1""".stripMargin,

    "q14_case_coalesce" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'negative'
        |       WHEN c_acctbal < 5000 THEN 'mid'
        |       ELSE 'high' END AS bal_band,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other
        |FROM customer""".stripMargin,

    "q15_position" ->
      """SELECT p_partkey,
        |  CAST(position('o' IN p_name) AS INTEGER) AS pos_o,
        |  CAST(position('ECONOMY' IN p_type) AS INTEGER) AS pos_econ
        |FROM part""".stripMargin,

    "q52_null_semantics" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.missing') AS INTEGER) IS NULL AS k_is_null,
        |  CAST(json_extract_string(props, '$.missing') AS INTEGER)
        |    IS NOT DISTINCT FROM NULL AS k_nullsafe_eq_null,
        |  coalesce(CAST(json_extract_string(props, '$.missing') AS INTEGER), -1) AS k_or_default,
        |  CAST(json_extract_string(props, '$.missing') AS INTEGER) = 1 AS k_eq_one
        |FROM events""".stripMargin,

    "q53_string_funcs2" ->
      """SELECT c_custkey,
        |  lpad(c_mktsegment, 12, '*') AS seg_lpad,
        |  rpad(c_mktsegment, 12, '.') AS seg_rpad,
        |  regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_masked,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_lower_vowels,
        |  repeat('-', 3) AS dashes,
        |  string_split(c_name, '#')[1] AS name_head
        |FROM customer""".stripMargin,

    "q16_topk" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q17_limit_offset" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 20 OFFSET 10""".stripMargin,

    "q18_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer",

    "q19_union" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
        |UNION
        |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000""".stripMargin,

    "q20_union_all" ->
      """SELECT c_custkey AS custkey, 'rich_customer' AS src FROM customer WHERE c_acctbal > 9000
        |UNION ALL
        |SELECT o_custkey AS custkey, 'big_order' AS src FROM orders WHERE o_totalprice > 400000""".stripMargin,

    "q21_intersect" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders""".stripMargin,

    "q22_except" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000""".stripMargin,

    "q23_window_rank" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal, rn FROM (
        |  SELECT c_custkey, c_mktsegment, c_acctbal,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        |  FROM customer) WHERE rn <= 3""".stripMargin,

    "q24_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        |FROM orders""".stripMargin,

    "q25_events_daily" ->
      """SELECT event_type, CAST(ts AS DATE) AS day,
        |  count(*) AS n_events,
        |  round(sum(value), 2) AS total_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q16b_topk_per_key" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,

    "q25b_props_json" ->
      """WITH t AS (
        |  SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |  FROM events)
        |SELECT event_type, count(*) AS n_events,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k,
        |  round(avg(k), 4) AS avg_k
        |FROM t GROUP BY event_type""".stripMargin,

    "q79_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, ts FROM events),
        |s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM ev
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM ev e
        |  JOIN s1 ON s1.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM ev e
        |  JOIN s2 ON s2.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |  GROUP BY e.user_id)
        |SELECT
        |  (SELECT count(DISTINCT user_id) FROM ev) AS n_users,
        |  (SELECT count(*) FROM s1) AS n_view,
        |  (SELECT count(*) FROM s2) AS n_view_click,
        |  (SELECT count(*) FROM s3) AS n_full_funnel""".stripMargin,

    "q80_retention" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |first AS (
        |  SELECT user_id, min(day) AS cohort FROM ev GROUP BY user_id),
        |activity AS (SELECT DISTINCT user_id, day FROM ev)
        |SELECT f.cohort, CAST(a.day - f.cohort AS INTEGER) AS "offset",
        |  count(DISTINCT a.user_id) AS n_users
        |FROM activity a JOIN first f ON f.user_id = a.user_id
        |WHERE a.day - f.cohort BETWEEN 0 AND 7
        |GROUP BY f.cohort, a.day - f.cohort""".stripMargin,

    "q26_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |), sessions AS (
        |  SELECT user_id, event_id,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged)
        |SELECT user_id,
        |  CAST(max(session_id) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM sessions GROUP BY user_id""".stripMargin,

    "q23b_window_nav" ->
      """SELECT o_custkey, o_orderkey,
        |  round(o_totalprice, 2) AS price,
        |  round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
        |  round(lead(o_totalprice, 1) OVER w, 2) AS next_price,
        |  ntile(4) OVER w AS quartile,
        |  round(first_value(o_totalprice) OVER w, 2) AS first_price,
        |  round(last_value(o_totalprice) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
        |    AS last_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin,

    "q46c_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,

    "q46e_unpivot" ->
      """SELECT l_returnflag, measure,
        |  round(sum(val), 2) AS total, count(*) AS n
        |FROM (
        |  UNPIVOT (SELECT l_returnflag, l_quantity, l_extendedprice,
        |                  l_discount FROM lineitem)
        |  ON l_quantity, l_extendedprice, l_discount
        |  INTO NAME measure VALUE val)
        |GROUP BY l_returnflag, measure""".stripMargin,

    "q25c_gapfill" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |bounds AS (
        |  SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
        |  FROM events),
        |days AS (
        |  SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM bounds),
        |types AS (SELECT DISTINCT event_type FROM events)
        |SELECT t.event_type, d.day, COALESCE(dd.n, 0) AS n_events
        |FROM types t CROSS JOIN days d
        |LEFT JOIN daily dd ON dd.event_type = t.event_type
        |                  AND dd.day = d.day""".stripMargin,

    "q46d_pivot" ->
      """SELECT o_orderstatus,
        |  round(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END), 2) AS p_urgent,
        |  round(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END), 2) AS p_high,
        |  round(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END), 2) AS p_medium,
        |  round(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice END), 2) AS p_notspec,
        |  round(sum(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END), 2) AS p_low
        |FROM orders GROUP BY o_orderstatus""".stripMargin
  )

  /** Binned rewrite of the equi-key-less interval join behind q99:
    * every `views` row (event_id, ta) matched to `buys` rows (tb,
    * value) with tb in [ta, ta+W). Bucket width == window length W,
    * so a qualifying tb lives in bucket(ta) or bucket(ta)+1 and in
    * EXACTLY one of the two probe replicas — the equi-join on the
    * bucket plus the exact residual filter needs no dedup pass.
    * Left semantics: every view appears, zero-filled. All bucket
    * arithmetic is integer (`div`) so the DuckDB oracle's direct
    * IEJoin replay buckets identically. RangeJoinSpec pins the
    * boundary semantics on planted timestamps; PlanQualitySpec pins
    * the no-nested-loop plan. */
  private[graft] def rangeJoinBinned(views: DataFrame, buys: DataFrame,
                                     w: Long): DataFrame = {
    val bb = buys.withColumn("bin", expr(s"tb div ${w}L"))
    val hits = views
      .select(col("event_id"), col("ta"),
        explode(array(expr(s"ta div ${w}L"),
                      expr(s"ta div ${w}L + 1L"))).as("bin"))
      .join(bb, "bin")
      .where(col("tb") >= col("ta") && col("tb") < col("ta") + lit(w))
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_purchases"),
           round(sum(col("value")), 2).as("purchase_value"))
    views.select(col("event_id"))
      .join(hits, Seq("event_id"), "left")
      .select(col("event_id"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
        coalesce(col("purchase_value"), lit(0.0)).as("purchase_value"))
  }
}
