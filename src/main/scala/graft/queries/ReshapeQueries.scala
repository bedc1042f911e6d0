package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Wide↔long reshaping (SURVEY §2.10): stack/unpivot, explode, JSON-line
  * extraction, derived-row unions — the shapes the reference's inspector
  * parsers produce (U1-U7), mapped onto the harness tables. All map-side
  * (no shuffle) except the final presentation sort. */
object ReshapeQueries extends QueryPack {

  /** Epoch micros of an event timestamp regardless of how the parquet
    * writer annotated it: `unix_micros` accepts only TIMESTAMP (ltz), but
    * the harness `events.ts` arrives as TIMESTAMP_NTZ when written without
    * a timezone annotation (driver regeneration flipped this mid-stream).
    * Session timezone is pinned UTC in Verify/Bench, so the NTZ→LTZ cast
    * reads the naive value as a UTC instant — exactly DuckDB's
    * `epoch_us` interpretation of a naive timestamp, keeping the oracle
    * hash stable across both annotations. */
  private def tsMicros(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    unix_micros(c.cast("timestamp"))

  val queries: Map[String, Q] = Map(
    // ---- U1: fixed-key map → rows (passmark-style unpivot via stack)
    "u1_stack_unpivot" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(col("p_partkey"),
          expr("stack(2, 'size', CAST(p_size AS DOUBLE), 'retailprice', p_retailprice)")
            .as(Seq("metric", "value")))
        .orderBy(col("p_partkey"), col("metric"))
    }),

    // ---- U2: nested structure → rows (explode)
    "u2_explode_tokens" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(col("p_partkey"), explode(split(col("p_name"), "\\s+")).as("word"))
        .orderBy(col("p_partkey"), col("word"))
    }),

    // ---- U3: compression-matrix unpivot END TO END — the nested
    //      {algo → {level → [runs]}} JSON is built from lineitem, then the
    //      real parser (double explode + stack(3) + keep-max) runs on it
    "u3_matrix_unpivot" -> ((s, dir) => {
      val runs = Tables.lineitem(s, dir).filter(col("l_orderkey") < 1000)
        .select(lower(col("l_returnflag")).as("algo"),
          lower(col("l_linestatus")).as("level"),
          struct(col("l_discount").as("ratio"),
            col("l_quantity").as("compression_speed"),
            col("l_extendedprice").as("decompression_speed")).as("run"))
      val byLevel = runs.groupBy(col("algo"), col("level"))
        .agg(collect_list(col("run")).as("runs"))
      val byAlgo = byLevel.groupBy(col("algo"))
        .agg(map_from_arrays(collect_list(col("level")),
          collect_list(col("runs"))).as("levels"))
      val raw = byAlgo
        .agg(to_json(map_from_arrays(collect_list(col("algo")),
          collect_list(col("levels")))).as("content"))
        .select(lit("tpch").as("vendor_id"), lit("lineitem").as("server_id"),
          col("content"))
      graft.ingest.InspectorParsers.parseCompression(raw)
        .select(col("benchmark_id"),
          col("config")("algo").as("algo"), col("config")("level").as("level"),
          col("config")("measurement").as("measurement"), col("score"))
        .orderBy(col("benchmark_id"), col("level"))
    }),

    // ---- S3: XML parse round-trip — nvidia-smi-shaped XML synthesized
    //      from supplier rows, parsed back by the DOM UDF; the oracle
    //      reads the same fields straight off the table, so any parser
    //      defect (escaping, element order, unit regex) hash-mismatches
    "s3_xml_roundtrip" -> ((s, dir) => {
      val gpuXml = Tables.supplier(s, dir).select(col("s_nationkey"),
        concat(lit("<gpu><product_name>"), col("s_name"), lit("</product_name>"),
          lit("<fb_memory_usage_total>"), (col("s_suppkey") * 2).cast("string"),
          lit(" MiB</fb_memory_usage_total>"),
          lit("<graphics_clock>"), (col("s_suppkey") + 1000).cast("string"),
          lit(" MHz</graphics_clock></gpu>")).as("g"))
      val raw = gpuXml.groupBy(col("s_nationkey"))
        .agg(concat_ws("", collect_list(col("g"))).as("inner"))
        .select(lit("tpch").as("vendor_id"),
          col("s_nationkey").cast("string").as("server_id"),
          concat(lit("<nvidia_smi_log>"), col("inner"),
            lit("</nvidia_smi_log>")).as("content"))
      graft.ingest.InspectorParsers.parseNvidiaSmi(raw)
        .orderBy(col("server_id"), col("gpu_model"))
    }),

    // ---- U6: JSON-per-line extraction (llm_speed JSONL shape)
    "u6_json_props" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k_val"))
        .orderBy(col("event_id"))
    }),

    // ---- U7: derived-metric rows unioned beside measured ones
    "u7_derived_union" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("event_type") === "purchase")
      val measured = ev.select(col("event_id"), col("value"), lit("measured").as("kind"))
      val derived = ev.select(col("event_id"),
        round(col("value") * 2, 2).as("value"), lit("extrapolated").as("kind"))
      measured.unionByName(derived).orderBy(col("event_id"), col("kind"))
    }),

    // ---- U10: PIVOT — long-to-wide with explicit value list (no
    //      values-discovery scan, single shuffle, map-side partial agg;
    //      the inverse of the u1/u3 unpivots). Quantities are
    //      integer-valued doubles, so the sums are order-exact.
    "u10_pivot" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("l_quantity")))
        .orderBy(col("l_returnflag"))
    }),

    // ---- W6: interval coalescing (gaps-and-islands over RANGES — the
    //      general form of the d9 span merge and the time twin of w2):
    //      per supplier, overlapping [shipdate, receiptdate] intervals
    //      merge into maximal shipping-activity windows. One key-
    //      partitioned window pass + one aggregate, no self-join.
    "w6_interval_union" -> ((s, dir) => {
      // interval = [ship date, ship + 1..7 transit days] (deterministic
      // in l_linenumber; the synthetic lineitem has no receipt column)
      val li = Tables.lineitem(s, dir).select(col("l_suppkey"),
        col("l_orderkey"), col("l_linenumber"),
        to_date(col("l_shipdate")).as("d0"),
        date_add(to_date(col("l_shipdate")),
          (col("l_linenumber") % 7 + 1).cast("int")).as("d1"))
      // total order (see Intervals.coalesce): identical intervals repeat
      // across orders, and a cross-engine gate needs tie-free frames
      val spans = graft.ops.Intervals.coalesce(li, Seq("l_suppkey"), "d0", "d1",
        tieBreakCols = Seq("l_orderkey", "l_linenumber"))
      spans.groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_windows"),
          sum(datediff(col("span_end"), col("span_start")) + 1).as("busy_days"),
          max(datediff(col("span_end"), col("span_start")) + 1).as("max_window_days"),
          max(col("n_merged")).as("max_merged"))
        .orderBy(col("l_suppkey"))
    }),

    // ---- W2: gap-based sessionization (30-min inactivity gap): lag diff
    //      flags session starts, running sum numbers them — two windows,
    //      both partitioned by user, no global sort
    "w2_sessionize" -> ((s, dir) => {
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("prev_us", lag(tsMicros(col("ts")), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_us").isNull ||
            tsMicros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1).otherwise(0))
        .withColumn("session_id", sum(col("new_session")).over(byUser))
        .groupBy(col("user_id"), col("session_id")).agg(count(lit(1)).as("n_events"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"), max(col("n_events")).as("max_session_events"))
        .orderBy(col("user_id"))
    }),

    // ---- U8: lscpu hardware-spec parse END TO END — an lscpu -J shaped
    //      JSON document (top-level fields + nested cache children) is
    //      synthesized per supplier, parsed by HardwareParsers.parseLscpu
    //      (field lookup, cache-geometry math, CPU model standardization),
    //      and the oracle recomputes every derived column directly
    "u8_lscpu_specs" -> ((s, dir) => {
      graft.ingest.HardwareParsers.parseLscpu(u8LscpuRaw(s, dir))
        .select(col("server_id"),
          col("vcpus"), col("cpu_cores"), col("cpu_speed"),
          col("cpu_manufacturer"), col("cpu_family"), col("cpu_model"),
          col("l1d_kib"), col("l1d_total_kib"), col("l2_total_kib"),
          col("l3_total_kib"),
          coalesce(col("l3_total_kib"), col("l2_total_kib"), col("l1d_total_kib"))
            .as("cache_total_kib"))
        .orderBy(col("server_id"))
    }),

    // ---- U9: membench RAM-scope synthesis with the cache threshold
    //      DERIVED from the parsed lscpu specs (per-server broadcast join)
    //      instead of a hand-fed constant — the reference reads the
    //      threshold off the server row (inspector.py:652-655)
    "u9_membench_ram" -> ((s, dir) => {
      val totals = graft.ingest.HardwareParsers.cacheTotalsKib(
        graft.ingest.HardwareParsers.parseLscpu(u8LscpuRaw(s, dir)))
      val sizes = Seq(512L, 4096L, 50000L, 100000L)
      val lines = for (op <- Seq("rd", "wr"); (sz, i) <- sizes.zipWithIndex)
        yield format_string(s"$op,$sz,%s",
          col("s_suppkey") * 10 + lit(i + 1) + lit(if (op == "wr") 100 else 0))
      val mem = Tables.supplier(s, dir).select(
        lit("tpch").as("vendor_id"), col("s_suppkey").cast("string").as("server_id"),
        concat_ws("\n", lines: _*).as("content"))
      graft.ingest.InspectorParsers.parseMembench(mem, totals)
        .filter(col("config")("scope") === "RAM")
        .select(col("server_id"), col("config")("operation").as("operation"), col("score"))
        .orderBy(col("server_id"), col("operation"))
    }),

    // ---- W5: as-of join — every purchase picks up the latest click value
    //      at or before it per user (tagged-union + one keyed window, no
    //      quadratic range join); the oracle is DuckDB's native ASOF JOIN
    "w5_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      val clicks0 = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("event_id").as("click_event"), col("value").as("click_value"))
      // ambiguous same-instant duplicates resolved BEFORE the as-of join
      val clicks = graft.ops.Dedup.keepLast(clicks0, Seq("user_id", "ts"),
        Seq(col("click_event"))).drop("click_event")
      graft.ops.AsOf.asofJoin(purchases, clicks, Seq("user_id"), "ts", "ts")
        .select(col("user_id"), col("event_id"),
          tsMicros(col("ts")).as("ts_us"), col("value"), col("click_value"))
        .orderBy(col("event_id"))
    }),

    // ---- U5: first-crossing synthesis (membench RAM-scope shape): per
    //      user, the first event whose running total value crosses 1000
    "u5_first_crossing" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("running", sum(col("value")).over(w))
        .filter(col("running") >= 1000)
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
            .orderBy(col("ts"), col("event_id"))))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), round(col("running"), 2).as("running"))
        .orderBy(col("user_id"))
    }))

  /** Synthesized lscpu -J document per supplier: CPU counts derived from
    * s_suppkey, three rotating model-name shapes (Intel/AMD/Ampere), L1d +
    * L2 as nested cache children, L3 only on even keys (so the cache-total
    * fallback chain is exercised both ways). */
  private def u8LscpuRaw(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val cores = col("s_suppkey") % 4 + 1
    val model = when(col("s_suppkey") % 3 === 0,
        "Intel(R) Xeon(R) Platinum 8175M CPU @ 2.50GHz")
      .when(col("s_suppkey") % 3 === 1, "AMD EPYC 7571")
      .otherwise(lit("Ampere Altra Q80-30"))
    val l3Part = when(col("s_suppkey") % 2 === 0,
      lit(""",{"field":"L3 cache:","data":"33554432 (1 instance)"}""")).otherwise(lit(""))
    val content = format_string(
      """{"lscpu":[{"field":"CPU(s):","data":"%s"},""" +
        """{"field":"Thread(s) per core:","data":"2"},""" +
        """{"field":"Socket(s):","data":"1"},""" +
        """{"field":"Core(s) per socket:","data":"%s"},""" +
        """{"field":"Model name:","data":"%s"},""" +
        """{"field":"Flags:","data":"fpu vme sse sse2"},""" +
        """{"field":"Caches:","children":[""" +
        """{"field":"L1d cache:","data":"%s (%s instances)"},""" +
        """{"field":"L2 cache:","data":"%s (%s instances)"}]}%s]}""",
      cores * 2, cores, model, cores * 32768, cores, cores * 1048576, cores, l3Part)
    Tables.supplier(s, dir).select(lit("tpch").as("vendor_id"),
      col("s_suppkey").cast("string").as("server_id"), content.as("content"))
  }

  val oracle: Map[String, String] = Map(
    "w5_asof_join" ->
      """WITH p AS (SELECT user_id, event_id, ts, value FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, value AS click_value FROM events
        |      WHERE event_type = 'click'
        |      QUALIFY row_number() OVER (PARTITION BY user_id, ts
        |        ORDER BY event_id DESC) = 1)
        |SELECT p.user_id, p.event_id, epoch_us(p.ts) AS ts_us, p.value, c.click_value
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
    "u8_lscpu_specs" ->
      """SELECT CAST(s_suppkey AS VARCHAR) AS server_id,
        |  CAST((s_suppkey % 4 + 1) * 2 AS INTEGER) AS vcpus,
        |  CAST(s_suppkey % 4 + 1 AS INTEGER) AS cpu_cores,
        |  CASE WHEN s_suppkey % 3 = 0 THEN 2.50 ELSE NULL END AS cpu_speed,
        |  CASE s_suppkey % 3 WHEN 0 THEN 'Intel' WHEN 1 THEN 'AMD'
        |    ELSE 'Ampere' END AS cpu_manufacturer,
        |  CASE s_suppkey % 3 WHEN 0 THEN 'Xeon' WHEN 1 THEN 'EPYC'
        |    ELSE 'Altra' END AS cpu_family,
        |  CASE s_suppkey % 3 WHEN 0 THEN '8175M' WHEN 1 THEN '7571'
        |    ELSE 'Ampere Altra Q80-30' END AS cpu_model,
        |  CAST(32 AS BIGINT) AS l1d_kib,
        |  CAST((s_suppkey % 4 + 1) * 32 AS BIGINT) AS l1d_total_kib,
        |  CAST((s_suppkey % 4 + 1) * 1024 AS BIGINT) AS l2_total_kib,
        |  CASE WHEN s_suppkey % 2 = 0 THEN CAST(32768 AS BIGINT)
        |    ELSE NULL END AS l3_total_kib,
        |  CASE WHEN s_suppkey % 2 = 0 THEN CAST(32768 AS BIGINT)
        |    ELSE CAST((s_suppkey % 4 + 1) * 1024 AS BIGINT) END AS cache_total_kib
        |FROM supplier ORDER BY server_id""".stripMargin,
    "u9_membench_ram" ->
      """SELECT CAST(s_suppkey AS VARCHAR) AS server_id, op AS operation,
        |  CAST(s_suppkey * 10
        |    + CASE WHEN s_suppkey % 2 = 0 OR s_suppkey % 4 = 3 THEN 3 ELSE 2 END
        |    + CASE WHEN op = 'wr' THEN 100 ELSE 0 END AS DOUBLE) AS score
        |FROM supplier, (SELECT unnest(['rd', 'wr']) AS op)
        |ORDER BY server_id, operation""".stripMargin,
    "w6_interval_union" ->
      """WITH iv AS (SELECT l_suppkey, l_orderkey, l_linenumber,
        |    CAST(l_shipdate AS DATE) AS d0,
        |    CAST(l_shipdate AS DATE) + CAST(l_linenumber % 7 + 1 AS INTEGER) AS d1
        |  FROM lineitem),
        |g AS (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, d0, d1,
        |    CASE WHEN max(d1) OVER (PARTITION BY l_suppkey
        |        ORDER BY d0, d1, l_orderkey, l_linenumber
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |      OR d0 > max(d1) OVER (PARTITION BY l_suppkey
        |        ORDER BY d0, d1, l_orderkey, l_linenumber
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      THEN 1 ELSE 0 END AS ng
        |  FROM iv),
        |i AS (SELECT l_suppkey, d0, d1,
        |    SUM(ng) OVER (PARTITION BY l_suppkey
        |      ORDER BY d0, d1, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM g),
        |s AS (SELECT l_suppkey, grp, MIN(d0) AS span_start,
        |    MAX(d1) AS span_end, COUNT(*) AS n_merged
        |  FROM i GROUP BY l_suppkey, grp)
        |SELECT l_suppkey, COUNT(*) AS n_windows,
        |  CAST(SUM(span_end - span_start + 1) AS BIGINT) AS busy_days,
        |  CAST(MAX(span_end - span_start + 1) AS BIGINT) AS max_window_days,
        |  CAST(MAX(n_merged) AS BIGINT) AS max_merged
        |FROM s GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    "w2_sessionize" ->
      """SELECT user_id, COUNT(*) AS n_sessions, MAX(n_events) AS max_session_events FROM (
        |  SELECT user_id, session_id, COUNT(*) AS n_events FROM (
        |    SELECT user_id, event_id,
        |      SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |    FROM (
        |      SELECT user_id, event_id, ts,
        |        CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |               IS NULL THEN 1
        |             WHEN epoch_us(ts) - lag(epoch_us(ts))
        |               OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
        |               THEN 1 ELSE 0 END AS new_session
        |      FROM events))
        |  GROUP BY user_id, session_id)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "s3_xml_roundtrip" ->
      """SELECT 'tpch' AS vendor_id, CAST(s_nationkey AS VARCHAR) AS server_id,
        |  s_name AS gpu_model, s_suppkey * 2 AS memory_mib,
        |  CAST(s_suppkey + 1000 AS INTEGER) AS graphics_clock_mhz
        |FROM supplier ORDER BY server_id, gpu_model""".stripMargin,
    "u3_matrix_unpivot" ->
      """WITH runs AS (
        |  SELECT lower(l_returnflag) AS algo, lower(l_linestatus) AS level,
        |    'ratio' AS measurement, l_discount AS value
        |  FROM lineitem WHERE l_orderkey < 1000
        |  UNION ALL
        |  SELECT lower(l_returnflag), lower(l_linestatus), 'compress', l_quantity
        |  FROM lineitem WHERE l_orderkey < 1000
        |  UNION ALL
        |  SELECT lower(l_returnflag), lower(l_linestatus), 'decompress', l_extendedprice
        |  FROM lineitem WHERE l_orderkey < 1000)
        |SELECT concat('compression:', algo, ':', measurement) AS benchmark_id,
        |  algo, level, measurement, MAX(value) AS score
        |FROM runs GROUP BY algo, level, measurement
        |ORDER BY benchmark_id, level""".stripMargin,
    "u1_stack_unpivot" ->
      """SELECT p_partkey, metric, value FROM (
        |  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part)
        |ORDER BY p_partkey, metric""".stripMargin,
    "u2_explode_tokens" ->
      """SELECT p_partkey, unnest(regexp_split_to_array(p_name, '\s+')) AS word
        |FROM part ORDER BY p_partkey, word""".stripMargin,
    "u6_json_props" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,
    "u7_derived_union" ->
      """SELECT event_id, value, kind FROM (
        |  SELECT event_id, value, 'measured' AS kind FROM events
        |  WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT event_id, ROUND(value * 2, 2) AS value, 'extrapolated' AS kind FROM events
        |  WHERE event_type = 'purchase')
        |ORDER BY event_id, kind""".stripMargin,
    "u10_pivot" ->
      """SELECT l_returnflag,
        |  SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS F,
        |  SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS O
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "u5_first_crossing" ->
      """SELECT user_id, event_id, ROUND(running, 2) AS running FROM (
        |  SELECT user_id, event_id, running,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM (
        |    SELECT user_id, event_id, ts,
        |      SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
        |    FROM events)
        |  WHERE running >= 1000)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin)
}
