package graft.queries

import graft.Tables
import graft.ops.{Cols, Dedup, HashDiff}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core relational operators from SURVEY §2 (projections, filters, joins,
  * aggregations, windows, set ops) expressed over the harness tables, each
  * with a DuckDB oracle.
  *
  * Conventions (scale + determinism):
  *  - money arithmetic in DecimalType → exact, aggregation-order-independent
  *    (see [[graft.ops.Cols]]); final cast to double;
  *  - every query ends in a total ORDER BY on both sides — Catalyst's
  *    EliminateSorts removes it under the bench's count(), so it costs
  *    nothing at scale while making oracle compares order-proof;
  *  - dimension-table joins are explicit `broadcast()`; fact-fact joins
  *    shuffle on their keys (what a 1000-executor plan wants).
  */
object CoreQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // ---- A5/P9/F1: grouped rollups with exact money math (TPC-H Q1 shape)
    "q1_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") < lit("2001-06-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          Cols.moneySum(col("l_extendedprice")).as("sum_base"),
          Cols.revenueSum(col("l_extendedprice"), col("l_discount")).as("sum_disc"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ---- J4: 3-way join with filters (scores ⋈ servers ⋈ vendors shape)
    "j4_threeway" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
      val c = Tables.customer(s, dir)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          Cols.revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_mktsegment"))
    }),

    // ---- J1/J2: broadcast dimension lookup join
    "j1_broadcast_lookup" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_lines"))
        .orderBy(col("p_brand"))
    }),

    // ---- J5: computed-key join (reference strips "db." prefix before match)
    "j5_computed_key" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
        .withColumn("key_from_name", regexp_extract(col("c_name"), "([0-9]+)$", 1).cast("bigint"))
      val o = Tables.orders(s, dir)
      o.join(broadcast(c), col("o_custkey") === col("key_from_name"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          Cols.moneySum(col("o_totalprice")).as("total"))
        .orderBy(col("c_mktsegment"))
    }),

    // ---- J6: FK navigation chain (customer → nation → region)
    "j6_fk_chain" -> ((s, dir) => {
      Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"),
          Cols.moneySum(col("c_acctbal")).as("total_acctbal"))
        .orderBy(col("r_name"))
    }),

    // ---- J7/E3: anti join (unresolved-FK / membership-check shape)
    "j7_anti_join" -> ((s, dir) => {
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // ---- J7: semi join
    "j7_semi_join" -> ((s, dir) => {
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    }),

    // ---- A1/O3: keep-best per group (deterministic tie-break)
    "a1_keep_best" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_extendedprice").desc, col("l_linenumber").asc)
      Tables.lineitem(s, dir)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("l_orderkey"), col("l_linenumber").as("best_line"),
          col("l_extendedprice").as("best_price"))
        .orderBy(col("l_orderkey"))
    }),

    // ---- A2: exact group median (fleet-median shape; percentile, not approx)
    "a2_group_median" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(round(median(col("l_extendedprice")), 4).as("median_price"),
          count(lit(1)).as("n"))
        .orderBy(col("p_brand"))
    }),

    // ---- A4: mode (most frequent value) with deterministic tie-break
    "a4_mode" -> ((s, dir) => {
      val counts = Tables.events(s, dir)
        .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("cnt").desc, col("event_type").asc)
      counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("mode_event"), col("cnt"))
        .orderBy(col("user_id"))
    }),

    // ---- A5: min/max/sum rollups per supplier
    "a5_rollups" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_suppkey"))
        .agg(min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          sum(col("l_quantity")).as("sum_qty"),
          Cols.moneySum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("l_suppkey"))
    }),

    // ---- A6: bounds aggregation across groups (storage-type bounds shape)
    "a6_bounds" -> ((s, dir) => {
      Tables.part(s, dir)
        .groupBy(col("p_type"))
        .agg(min(col("p_size")).as("min_size"), max(col("p_size")).as("max_size"),
          max(col("p_retailprice")).as("max_price"), count(lit(1)).as("n"))
        .orderBy(col("p_type"))
    }),

    // ---- A7: catalog row merge (sorted distinct union + boolean OR + max)
    "a7_catalog_merge" -> ((s, dir) => {
      Tables.part(s, dir)
        .groupBy(col("p_brand"))
        .agg(
          concat_ws(",", sort_array(collect_set(col("p_type")))).as("types"),
          expr("bool_or(p_size > 25)").as("has_large"),
          max(col("p_size")).as("max_size"))
        .orderBy(col("p_brand"))
    }),

    // ---- A8: filtered average (time-to-start shape), exact then rounded
    "a8_filtered_avg" -> ((s, dir) => {
      Tables.events(s, dir)
        .filter(col("value") > 0 && col("event_type") === "purchase")
        .groupBy(col("event_type"))
        .agg(round(sum(col("value").cast(DecimalType(18, 2))).cast("double") / count(lit(1)), 2)
          .as("avg_value"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // ---- A9: duplicate counting for dedup logging
    "a9_dup_count" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"), col("l_partkey")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1)
        .agg(coalesce(sum(col("cnt") - 1), lit(0)).as("surplus_rows"),
          count(lit(1)).as("dup_keys"))
    }),

    // ---- A10: row content hash keyed by PK (md5 — DuckDB 1.0 lacks sha1;
    //      the library's CanonicalJson uses sha1 for reference parity)
    "a10_row_hash" -> ((s, dir) => {
      Tables.nation(s, dir)
        .select(col("n_nationkey"),
          md5(concat_ws("|", col("n_name"), col("n_regionkey"))).as("row_hash"))
        .orderBy(col("n_nationkey"))
    }),

    // ---- A11: ordered dedup keep-last (insert.py keep-last semantics).
    //      (l_orderkey, l_linenumber) is NOT unique in the synthetic data,
    //      so the "input order" is a full deterministic tie-break chain.
    "a11_dedup_keep_last" -> ((s, dir) => {
      // aggregation-form keep-last: max(struct) with map-side combine —
      // no per-key sort, shuffles only the projected columns
      Dedup.keepLastByMax(
          Tables.lineitem(s, dir).select("l_orderkey", "l_partkey",
            "l_linenumber", "l_quantity", "l_extendedprice", "l_suppkey"),
          Seq("l_orderkey", "l_partkey"),
          Seq("l_linenumber", "l_quantity", "l_extendedprice", "l_suppkey"))
        .select(col("l_orderkey"), col("l_partkey"),
          col("l_linenumber").as("last_line"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_partkey"))
    }),

    // ---- O1: tier sort — array-of-struct sorted INSIDE the array column
    //      (map-side, no shuffle beyond the grouping that builds the array)
    "o1_tier_sort" -> ((s, dir) => {
      val tiers = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(collect_list(struct(col("l_quantity").as("lower"),
          col("l_extendedprice").as("price"))).as("tiers"))
      tiers.select(col("l_orderkey"),
          posexplode(graft.ops.TierOps.sortTiersBy(col("tiers"), "lower"))
            .as(Seq("pos", "tier")))
        .select(col("l_orderkey"), col("pos").cast("long").as("pos"),
          col("tier.lower").as("lower"), col("tier.price").as("price"))
        .orderBy(col("l_orderkey"), col("pos"))
    }),

    // ---- J3: zone-availability fan-out — equi-join that REPLICATES rows
    //      (each supplier offered in every nation of its region)
    "j3_zone_fanout" -> ((s, dir) => {
      val sup = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_regionkey"))),
          col("s_nationkey") === col("n_nationkey"))
      val offerings = Tables.nation(s, dir)
        .select(col("n_regionkey"), col("n_name").as("offered_in"))
      sup.join(broadcast(offerings), "n_regionkey")
        .select(col("s_suppkey"), col("s_name"), col("offered_in"))
        .orderBy(col("s_suppkey"), col("offered_in"))
    }),

    // ---- O2: cumulative tier bounds via lag (Azure tier chain shape)
    "o2_cumulative_bounds" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_extendedprice").asc, col("l_linenumber").asc)
      Tables.lineitem(s, dir)
        .withColumn("lower_bound", lag(col("l_extendedprice"), 1, 0.0).over(w))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("lower_bound"), col("l_extendedprice").as("upper_bound"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ---- W1: SCD "current view" — latest row per business key
    "w1_scd_current" -> ((s, dir) => {
      Dedup.keepLast(Tables.events(s, dir), Seq("user_id"), Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("ts"), col("event_type"), col("value"))
        .orderBy(col("user_id"))
    }),

    // ---- E1/J7: snapshot diff new/update/deleted/unchanged
    "e1_snapshot_diff" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val cut1 = lit("1997-01-01").cast("timestamp")
      val cut2 = lit("1999-01-01").cast("timestamp")
      // target snapshot: orders before cut2; source snapshot: after cut1,
      // with 'P' rows repriced so the overlap contains updates.
      val target = o.filter(col("o_orderdate") < cut2)
        .withColumn("__hash", md5(concat_ws("|", col("o_totalprice"), col("o_orderstatus"))))
      val source = o.filter(col("o_orderdate") >= cut1)
        .withColumn("o_totalprice",
          when(col("o_orderstatus") === "P", col("o_totalprice") + 1).otherwise(col("o_totalprice")))
        .withColumn("__hash", md5(concat_ws("|", col("o_totalprice"), col("o_orderstatus"))))
      HashDiff.diff(source, target, Seq("o_orderkey"))
        .groupBy(col("change")).agg(count(lit(1)).as("n"))
        .orderBy(col("change"))
    }),

    // ---- E2/U7: union of a base branch and a derived branch
    "e2_union_derived" -> ((s, dir) => {
      val p = Tables.part(s, dir)
      val base = p.select(col("p_partkey"), col("p_retailprice").as("price"),
        lit("list").as("kind"))
      val derived = p.select(col("p_partkey"),
        round(col("p_retailprice").cast(DecimalType(18, 2)) * lit(0.9).cast(DecimalType(3, 2)), 2)
          .cast("double").as("price"),
        lit("discounted").as("kind"))
      base.unionByName(derived).orderBy(col("p_partkey"), col("kind"))
    }),

    // ---- E5: INTERSECT / EXCEPT set semantics — segment customers who
    //      did (and did not) place orders; both compile to aggregate-free
    //      left-semi/anti joins after Catalyst's ReplaceIntersectWithSemiJoin
    "e5_set_ops" -> ((s, dir) => {
      val buyers = Tables.orders(s, dir).select(col("o_custkey").as("custkey"))
      val segment = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      val active = segment.intersect(buyers).withColumn("status", lit("active"))
      val dormant = segment.except(buyers).withColumn("status", lit("dormant"))
      active.unionByName(dormant).orderBy(col("custkey"))
    }),

    // ---- A14: collection aggregation — per-customer order-key arrays.
    //      sort_array makes the result topology-independent (collect_list
    //      order is partition-dependent); state is bounded by group fan-in,
    //      the combine still runs map-side. The gated variant serializes
    //      the array with concat_ws: the driver's pandas comparator cannot
    //      hash ndarray cells, so the cross-engine contract is a string
    //      column; orderKeyArrays keeps the array-typed form (spec-covered).
    "a14_order_array" -> ((s, dir) => {
      orderKeyArrays(s, dir)
        .withColumn("order_keys", concat_ws(",", col("order_keys")))
        .orderBy(col("o_custkey"))
    }),

    // ---- A16: exact percentiles — p50/p95 per group via linear
    //      interpolation on the sorted values ((n-1)·p definition, same
    //      as SQL quantile_cont). Exact, not approx_percentile: the
    //      reference's analytics never trade accuracy for speed at this
    //      cardinality (grouped by 3 flags); at corpus scale swap in
    //      approx_percentile's mergeable t-digest.
    "a16_percentiles" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
          round(expr("percentile(l_quantity, 0.95)"), 4).as("p95_qty"),
          round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95_price"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- A15: correlated-aggregate filter (Q17 shape) — lineitems below
    //      a fifth of their part's average quantity; the subquery becomes
    //      a join against the per-part aggregate (one shuffle, map-side
    //      combine), never a per-row re-scan. Decimal sum keeps the
    //      single-row result topology-independent.
    "a15_small_qty_revenue" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val avgQ = li.groupBy(col("l_partkey"))
        .agg(avg(col("l_quantity")).as("avg_qty"))
      li.join(avgQ, "l_partkey")
        .filter(col("l_quantity") < col("avg_qty") * 0.2)
        .agg((sum(col("l_extendedprice").cast(DecimalType(18, 2)))
          .cast("double") / lit(7.0)).as("avg_yearly"))
    }),

    // ---- A13: ROLLUP multi-level aggregation — per (flag, status),
    //      per flag, and grand total in ONE pass (Expand + single
    //      combine-enabled shuffle, not three scans)
    "a13_rollup" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // ---- F1/F2/F5: conjunctive predicate filters with guards
    "f2_filters" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R" && col("l_quantity") > 40 &&
          col("l_discount").between(0.02, 0.08) && col("l_extendedprice") > 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ---- F5: corrupted-data guards — implausible values are NULLED (not
    //      dropped, so the row survives with its other fields), zero or
    //      negative measurements are filtered out entirely
    "f5_guards" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_quantity") > 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          when(col("l_extendedprice") > 90000, lit(null).cast("double"))
            .otherwise(col("l_extendedprice")).as("price_guarded"),
          col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }),

    // ---- F4: tolerance predicate (config float match shape)
    "f4_tolerance_match" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(abs(col("l_discount") - lit(0.05)) <= 1e-6)
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- P3: regex decode + literal-map lookup annotation
    "p3_regex_annotate" -> ((s, dir) => {
      val famDesc = map(
        lit("widget"), lit("General purpose"), lit("bolt"), lit("Compute optimized"),
        lit("gear"), lit("Memory optimized"), lit("cog"), lit("Storage optimized"))
      Tables.part(s, dir)
        .withColumn("family", regexp_extract(col("p_name"), "([a-z]+)$", 1))
        .withColumn("family_desc", coalesce(try_element_at(famDesc, col("family")), lit("Other")))
        .select(col("p_partkey"), col("p_name"), col("family"), col("family_desc"))
        .orderBy(col("p_partkey"))
    }),

    // ---- P5/P9: unit conversions (hourly→monthly ×730, GiB→GB) + round(4)
    "p5_unit_convert" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(col("p_partkey"),
          round(col("p_retailprice").cast(DecimalType(18, 2)) * lit(Cols.HoursPerMonth), 4)
            .cast("double").as("monthly_price"),
          round(col("p_size") * lit(Cols.GibToGb), 4).as("size_gb"))
        .orderBy(col("p_partkey"))
    }),

    // ---- P10: text-length validation predicates
    "p10_text_checks" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(col("p_partkey"),
          size(split(trim(col("p_name")), "\\s+")).as("n_words"),
          length(col("p_name")).as("n_chars"),
          (length(col("p_name")).between(5, 50) &&
            size(split(trim(col("p_name")), "\\s+")).between(1, 5)).as("valid"))
        .orderBy(col("p_partkey"))
    }),

    // ---- O4: priority ordering (preferred keys first, rest alphabetical)
    "o4_priority_order" -> ((s, dir) => {
      Tables.nation(s, dir)
        .withColumn("priority",
          when(col("n_name") === "NATION_0", 0)
            .when(col("n_name") === "NATION_7", 1).otherwise(99))
        .select(col("n_nationkey"), col("n_name"), col("priority"))
        .orderBy(col("priority"), col("n_name"))
    }),

    // ---- W3: rolling average over an explicit row frame (the one frame
    //      spec family the reference lacks; scale: per-user partitions)
    "w3_rolling_avg" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-2, 0)
      Tables.events(s, dir)
        .withColumn("rolling_avg",
          round(sum(col("value").cast(DecimalType(18, 2))).over(w).cast("double") /
            count(lit(1)).over(w), 4))
        .select(col("user_id"), col("event_id"), col("rolling_avg"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // ---- J9: 6-way join with selective dimension filter (join-order /
    //      TPC-H Q5 shape — Catalyst reorders, dimensions broadcast)
    "j9_join_order" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val su = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(Cols.revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("n_name"))
    }),

    // ---- A12: HAVING-filtered aggregation + semi join back (Q18 shape)
    "a12_big_orders" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val big = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 150)
      Tables.orders(s, dir)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("total_qty"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- O5/O1: max over a row-wise collection (max-tier price shape)
    "o5_max_tier" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          array_max(array(col("l_tax"), col("l_discount"))).as("max_rate"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }))

  /** Array-typed form of a14 — per-customer sorted order-key arrays.
    * Library users get the real `array<long>` column; the gated query
    * serializes it only because the driver's comparator can't hash arrays.
    */
  def orderKeyArrays(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(sort_array(collect_list(col("o_orderkey"))).as("order_keys"),
        count(lit(1)).as("n_orders"))

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  SUM(l_quantity) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc,
        |  COUNT(*) AS cnt
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '2001-06-01'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "j4_threeway" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
        |  COUNT(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "j1_broadcast_lookup" ->
      """SELECT p_brand, SUM(l_quantity) AS sum_qty, COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "j5_computed_key" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer
        |  ON o_custkey = CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "j6_fk_chain" ->
      """SELECT r_name, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "j7_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "j7_semi_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "a1_keep_best" ->
      """SELECT l_orderkey, best_line, best_price FROM (
        |  SELECT l_orderkey, l_linenumber AS best_line, l_extendedprice AS best_price,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rn
        |  FROM lineitem) WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,
    "a2_group_median" ->
      """SELECT p_brand, ROUND(MEDIAN(l_extendedprice), 4) AS median_price, COUNT(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "a4_mode" ->
      """SELECT user_id, mode_event, cnt FROM (
        |  SELECT user_id, event_type AS mode_event, cnt,
        |    row_number() OVER (PARTITION BY user_id ORDER BY cnt DESC, event_type ASC) AS rn
        |  FROM (SELECT user_id, event_type, COUNT(*) AS cnt FROM events
        |        GROUP BY user_id, event_type))
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "a5_rollups" ->
      """SELECT l_suppkey, MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
        |  SUM(l_quantity) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    "a6_bounds" ->
      """SELECT p_type, MIN(p_size) AS min_size, MAX(p_size) AS max_size,
        |  MAX(p_retailprice) AS max_price, COUNT(*) AS n
        |FROM part GROUP BY p_type ORDER BY p_type""".stripMargin,
    "a7_catalog_merge" ->
      """SELECT p_brand,
        |  string_agg(DISTINCT p_type, ',' ORDER BY p_type) AS types,
        |  bool_or(p_size > 25) AS has_large, MAX(p_size) AS max_size
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "a8_filtered_avg" ->
      """SELECT event_type,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 2) AS avg_value,
        |  COUNT(*) AS n
        |FROM events WHERE value > 0 AND event_type = 'purchase'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a9_dup_count" ->
      """SELECT CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT) AS surplus_rows, COUNT(*) AS dup_keys FROM (
        |  SELECT l_orderkey, l_partkey, COUNT(*) AS cnt FROM lineitem
        |  GROUP BY l_orderkey, l_partkey) WHERE cnt > 1""".stripMargin,
    "a10_row_hash" ->
      """SELECT n_nationkey, md5(concat_ws('|', n_name, n_regionkey)) AS row_hash
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "a11_dedup_keep_last" ->
      """SELECT l_orderkey, l_partkey, last_line, l_quantity FROM (
        |  SELECT l_orderkey, l_partkey, l_linenumber AS last_line, l_quantity,
        |    row_number() OVER (PARTITION BY l_orderkey, l_partkey
        |      ORDER BY l_linenumber DESC, l_quantity DESC, l_extendedprice DESC, l_suppkey DESC) AS rn
        |  FROM lineitem) WHERE rn = 1 ORDER BY l_orderkey, l_partkey""".stripMargin,
    "o1_tier_sort" ->
      """SELECT l_orderkey,
        |  row_number() OVER (PARTITION BY l_orderkey
        |    ORDER BY l_quantity, l_extendedprice) - 1 AS pos,
        |  l_quantity AS lower, l_extendedprice AS price
        |FROM lineitem ORDER BY l_orderkey, pos""".stripMargin,
    "j3_zone_fanout" ->
      """SELECT s_suppkey, s_name, o.n_name AS offered_in
        |FROM supplier
        |JOIN nation sn ON sn.n_nationkey = s_nationkey
        |JOIN nation o ON o.n_regionkey = sn.n_regionkey
        |ORDER BY s_suppkey, offered_in""".stripMargin,
    "o2_cumulative_bounds" ->
      """SELECT l_orderkey, l_linenumber,
        |  COALESCE(lag(l_extendedprice) OVER (PARTITION BY l_orderkey
        |    ORDER BY l_extendedprice ASC, l_linenumber ASC), 0.0) AS lower_bound,
        |  l_extendedprice AS upper_bound
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "w1_scd_current" ->
      """SELECT user_id, ts, event_type, value FROM (
        |  SELECT user_id, ts, event_type, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "e1_snapshot_diff" ->
      """WITH target AS (
        |  SELECT o_orderkey, md5(concat_ws('|', o_totalprice, o_orderstatus)) AS h
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'),
        |source AS (
        |  SELECT o_orderkey, md5(concat_ws('|',
        |    CASE WHEN o_orderstatus = 'P' THEN o_totalprice + 1 ELSE o_totalprice END,
        |    o_orderstatus)) AS h
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01')
        |SELECT change, COUNT(*) AS n FROM (
        |  SELECT CASE WHEN t.h IS NULL THEN 'new'
        |              WHEN s.h IS NULL THEN 'deleted'
        |              WHEN s.h <> t.h THEN 'update'
        |              ELSE 'unchanged' END AS change
        |  FROM source s FULL OUTER JOIN target t USING (o_orderkey))
        |GROUP BY change ORDER BY change""".stripMargin,
    "e2_union_derived" ->
      """SELECT p_partkey, price, kind FROM (
        |  SELECT p_partkey, p_retailprice AS price, 'list' AS kind FROM part
        |  UNION ALL
        |  SELECT p_partkey,
        |    CAST(ROUND(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(0.9 AS DECIMAL(3,2)), 2) AS DOUBLE) AS price,
        |    'discounted' AS kind FROM part)
        |ORDER BY p_partkey, kind""".stripMargin,
    "e5_set_ops" ->
      """WITH buyers AS (SELECT o_custkey AS custkey FROM orders),
        |seg AS (SELECT c_custkey AS custkey FROM customer
        |        WHERE c_mktsegment = 'BUILDING')
        |SELECT custkey, 'active' AS status
        |FROM (SELECT custkey FROM seg INTERSECT SELECT custkey FROM buyers)
        |UNION ALL
        |SELECT custkey, 'dormant' AS status
        |FROM (SELECT custkey FROM seg EXCEPT SELECT custkey FROM buyers)
        |ORDER BY custkey""".stripMargin,
    "a16_percentiles" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        |  ROUND(quantile_cont(l_quantity, 0.95), 4) AS p95_qty,
        |  ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a15_small_qty_revenue" ->
      """SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
        |    AS avg_yearly
        |FROM lineitem l JOIN (
        |  SELECT l_partkey, AVG(l_quantity) AS avg_qty
        |  FROM lineitem GROUP BY l_partkey) a
        |ON l.l_partkey = a.l_partkey
        |WHERE l.l_quantity < 0.2 * a.avg_qty""".stripMargin,
    "a14_order_array" ->
      """SELECT o_custkey,
        |  array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "a13_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  COUNT(*) AS n_rows, SUM(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "f5_guards" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_extendedprice > 90000 THEN NULL
        |       ELSE l_extendedprice END AS price_guarded,
        |  l_quantity
        |FROM lineitem WHERE l_quantity > 0
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,
    "f2_filters" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity > 40
        |  AND l_discount BETWEEN 0.02 AND 0.08 AND l_extendedprice > 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "f4_tolerance_match" ->
      """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
        |WHERE abs(l_discount - 0.05) <= 0.000001
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "p3_regex_annotate" ->
      """SELECT p_partkey, p_name, regexp_extract(p_name, '([a-z]+)$', 1) AS family,
        |  CASE regexp_extract(p_name, '([a-z]+)$', 1)
        |    WHEN 'widget' THEN 'General purpose' WHEN 'bolt' THEN 'Compute optimized'
        |    WHEN 'gear' THEN 'Memory optimized' WHEN 'cog' THEN 'Storage optimized'
        |    ELSE 'Other' END AS family_desc
        |FROM part ORDER BY p_partkey""".stripMargin,
    "p5_unit_convert" ->
      """SELECT p_partkey,
        |  CAST(ROUND(CAST(p_retailprice AS DECIMAL(18,2)) * 730, 4) AS DOUBLE) AS monthly_price,
        |  ROUND(p_size * 1.073741824, 4) AS size_gb
        |FROM part ORDER BY p_partkey""".stripMargin,
    "p10_text_checks" ->
      """SELECT p_partkey,
        |  len(regexp_split_to_array(trim(p_name), '\s+')) AS n_words,
        |  length(p_name) AS n_chars,
        |  (length(p_name) BETWEEN 5 AND 50 AND
        |   len(regexp_split_to_array(trim(p_name), '\s+')) BETWEEN 1 AND 5) AS valid
        |FROM part ORDER BY p_partkey""".stripMargin,
    "o4_priority_order" ->
      """SELECT n_nationkey, n_name,
        |  CASE WHEN n_name = 'NATION_0' THEN 0 WHEN n_name = 'NATION_7' THEN 1
        |       ELSE 99 END AS priority
        |FROM nation ORDER BY priority, n_name""".stripMargin,
    "o5_max_tier" ->
      """SELECT l_orderkey, l_linenumber, greatest(l_tax, l_discount) AS max_rate
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "w3_rolling_avg" ->
      """SELECT user_id, event_id,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    / COUNT(*) OVER w, 4) AS rolling_avg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "j9_join_order" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "a12_big_orders" ->
      """SELECT o_orderkey, o_custkey, total_qty, o_totalprice
        |FROM orders JOIN (
        |  SELECT l_orderkey, SUM(l_quantity) AS total_qty FROM lineitem
        |  GROUP BY l_orderkey HAVING SUM(l_quantity) > 150) big
        |ON o_orderkey = big.l_orderkey
        |ORDER BY o_orderkey""".stripMargin)
}
