package graft.queries

import graft.Tables
import graft.analytics.WorkloadScores
import org.apache.spark.sql.functions._

/** Flagship composite-score queries (SURVEY §3.3 / A3): the workload-profile
  * weighted geometric mean mapped onto the harness `events` table —
  * unit = user_id, benchmark_id = event_type, score = value.
  */
object ScoreQueries extends QueryPack {

  /** Two workloads over the five event types; ignore-missing policy (the
    * penalize/require variants are exercised by ScalaTest fixtures). */
  private val entryRows = Seq(
    ("throughput", 0, "view", 2.0, true, "ignore", 1e-4),
    ("throughput", 1, "click", 1.0, true, "ignore", 1e-4),
    ("throughput", 2, "purchase", 1.0, true, "ignore", 1e-4),
    ("reliability", 0, "view", 1.0, true, "ignore", 1e-4),
    ("reliability", 1, "error", 1.0, false, "ignore", 1e-4))

  val queries: Map[String, Q] = Map(
    // A1+A2+A3+J8 end to end: best-per-entry → fleet median → normalized
    // weighted geomean. Rounded to 6 decimals on both sides (log2/pow may
    // differ in the last ulp across engines).
    "a3_weighted_geomean" -> ((s, dir) => {
      val scores = Tables.events(s, dir)
        .select(col("user_id"), col("event_type").as("benchmark_id"), col("value").as("score"))
      val entries = WorkloadScores.entriesDf(s, entryRows)
      WorkloadScores.compute(scores, entries, Seq("user_id"), sigFigRound = false)
        .filter(col("score").isNotNull)
        .select(col("user_id"), col("workload"),
          round(col("score"), 6).as("score"), col("n_components"))
        .orderBy(col("user_id"), col("workload"))
    }),

    // A3 with all three missing-component policies live in one workload:
    // signup REQUIRED (absent → row suppressed), view PENALIZED (absent →
    // norm floor 1e-2), purchase IGNORE (absent → weight renormalizes)
    "a3_geomean_policies" -> ((s, dir) => {
      val scores = Tables.events(s, dir)
        .select(col("user_id"), col("event_type").as("benchmark_id"), col("value").as("score"))
      val entries = WorkloadScores.entriesDf(s, Seq(
        ("engagement", 0, "signup", 1.0, true, "require", 1e-4),
        ("engagement", 1, "purchase", 2.0, true, "ignore", 1e-4),
        ("engagement", 2, "view", 1.0, true, "penalize", 1e-2)))
      WorkloadScores.compute(scores, entries, Seq("user_id"), sigFigRound = false)
        .filter(col("score").isNotNull)
        .select(col("user_id"), col("workload"),
          round(col("score"), 6).as("score"), round(col("coverage"), 6).as("coverage"))
        .orderBy(col("user_id"))
    }),

    // F4 inside the fan-out (reference geekbench single-vs-multi split,
    // `workload_profiles.py:132-180`): two entries over the SAME benchmark
    // separated only by config_filter — entry 0 sees runs with cores=1,
    // entry 1 the cores=16 runs, entry 2 is unfiltered. The config map is
    // derived from the event's props JSON so both engines compute it.
    "a3_config_filter" -> ((s, dir) => {
      val cores = when(get_json_object(col("props"), "$.k").cast("int") % 2 === 0,
        lit("1")).otherwise(lit("16"))
      val scores = Tables.events(s, dir)
        .select(col("user_id"), col("event_type").as("benchmark_id"),
          col("value").as("score"), map(lit("cores"), cores).as("config"))
      val entries = WorkloadScores.entriesDf(s, Seq(
        ("cpu", 0, "view", 1.0, true, "ignore", 1e-4),
        ("cpu", 1, "view", 1.0, true, "ignore", 1e-4),
        ("cpu", 2, "click", 1.0, true, "ignore", 1e-4)))
        .withColumn("config_filter",
          when(col("entry_idx") === 0, map(lit("cores"), lit("1")))
            .when(col("entry_idx") === 1, map(lit("cores"), lit("16"))))
      WorkloadScores.compute(scores, entries, Seq("user_id"), sigFigRound = false)
        .filter(col("score").isNotNull)
        .select(col("user_id"), col("workload"),
          round(col("score"), 6).as("score"), col("n_components"))
        .orderBy(col("user_id"), col("workload"))
    }),

    // A2 on its own: the fleet-median normalization reference (exact median)
    "a2_fleet_median" -> ((s, dir) => {
      val scores = Tables.events(s, dir)
        .select(col("user_id"), col("event_type").as("benchmark_id"), col("value").as("score"))
      val entries = WorkloadScores.entriesDf(s, entryRows)
      WorkloadScores.fleetMedians(WorkloadScores.bestScores(scores, entries, Seq("user_id")))
        .select(col("workload"), col("entry_idx"), round(col("fleet_median"), 6).as("fleet_median"))
        .orderBy(col("workload"), col("entry_idx"))
    }))

  private val entriesCte =
    """entries(workload, entry_idx, benchmark_id, weight, hib) AS (VALUES
      |  ('throughput', 0, 'view', 2.0, true), ('throughput', 1, 'click', 1.0, true),
      |  ('throughput', 2, 'purchase', 1.0, true),
      |  ('reliability', 0, 'view', 1.0, true), ('reliability', 1, 'error', 1.0, false)),
      |best AS (
      |  SELECT e.workload, e.entry_idx, e.weight, e.hib, ev.user_id,
      |    CASE WHEN e.hib THEN MAX(ev.value) ELSE MIN(ev.value) END AS best
      |  FROM events ev JOIN entries e ON ev.event_type = e.benchmark_id
      |  GROUP BY e.workload, e.entry_idx, e.weight, e.hib, ev.user_id),
      |med AS (
      |  SELECT workload, entry_idx, MEDIAN(best) AS fleet_median
      |  FROM best GROUP BY workload, entry_idx)""".stripMargin

  val oracle: Map[String, String] = Map(
    "a3_weighted_geomean" ->
      s"""WITH $entriesCte,
         |norm AS (
         |  SELECT b.user_id, b.workload, b.weight,
         |    CASE WHEN b.hib THEN b.best / m.fleet_median
         |         ELSE m.fleet_median / b.best END AS norm
         |  FROM best b JOIN med m USING (workload, entry_idx)
         |  WHERE (CASE WHEN b.hib THEN b.best / m.fleet_median
         |              ELSE m.fleet_median / b.best END) > 0)
         |SELECT user_id, workload,
         |  ROUND(POWER(2.0, SUM(weight * LOG2(norm)) / SUM(weight)), 6) AS score,
         |  COUNT(*) AS n_components
         |FROM norm GROUP BY user_id, workload ORDER BY user_id, workload""".stripMargin,
    "a2_fleet_median" ->
      s"""WITH $entriesCte
         |SELECT workload, entry_idx, ROUND(fleet_median, 6) AS fleet_median
         |FROM med ORDER BY workload, entry_idx""".stripMargin,
    "a3_config_filter" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, value,
        |    CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) % 2 = 0
        |         THEN '1' ELSE '16' END AS cores
        |  FROM events),
        |entries(workload, entry_idx, benchmark_id, weight, hib, fcores) AS (VALUES
        |  ('cpu', 0, 'view', 1.0, true, '1'),
        |  ('cpu', 1, 'view', 1.0, true, '16'),
        |  ('cpu', 2, 'click', 1.0, true, NULL)),
        |best AS (
        |  SELECT e.workload, e.entry_idx, e.weight, e.hib, ev.user_id,
        |    CASE WHEN e.hib THEN MAX(ev.value) ELSE MIN(ev.value) END AS best
        |  FROM ev JOIN entries e ON ev.event_type = e.benchmark_id
        |  WHERE e.fcores IS NULL OR ev.cores = e.fcores
        |  GROUP BY e.workload, e.entry_idx, e.weight, e.hib, ev.user_id),
        |med AS (
        |  SELECT workload, entry_idx, MEDIAN(best) AS fleet_median
        |  FROM best GROUP BY workload, entry_idx),
        |norm AS (
        |  SELECT b.user_id, b.workload, b.weight,
        |    CASE WHEN b.hib THEN b.best / m.fleet_median
        |         ELSE m.fleet_median / b.best END AS norm
        |  FROM best b JOIN med m USING (workload, entry_idx)
        |  WHERE (CASE WHEN b.hib THEN b.best / m.fleet_median
        |              ELSE m.fleet_median / b.best END) > 0)
        |SELECT user_id, workload,
        |  ROUND(POWER(2.0, SUM(weight * LOG2(norm)) / SUM(weight)), 6) AS score,
        |  COUNT(*) AS n_components
        |FROM norm GROUP BY user_id, workload ORDER BY user_id, workload""".stripMargin,
    "a3_geomean_policies" ->
      """WITH entries(workload, entry_idx, benchmark_id, weight, hib, policy, penalty) AS (
        |  VALUES ('engagement', 0, 'signup', 1.0, true, 'require', 0.0001),
        |         ('engagement', 1, 'purchase', 2.0, true, 'ignore', 0.0001),
        |         ('engagement', 2, 'view', 1.0, true, 'penalize', 0.01)),
        |best AS (
        |  SELECT e.workload, e.entry_idx, e.weight, e.hib, e.policy, e.penalty,
        |    ev.user_id, MAX(ev.value) AS best
        |  FROM events ev JOIN entries e ON ev.event_type = e.benchmark_id
        |  GROUP BY e.workload, e.entry_idx, e.weight, e.hib, e.policy, e.penalty, ev.user_id),
        |med AS (
        |  SELECT workload, entry_idx, MEDIAN(best) AS fleet_median
        |  FROM best GROUP BY workload, entry_idx),
        |units AS (SELECT DISTINCT user_id FROM best),
        |grid AS (SELECT u.user_id, e.* FROM units u CROSS JOIN entries e),
        |norm AS (
        |  SELECT g.user_id, g.workload, g.weight, g.policy, g.penalty,
        |    CASE WHEN b.best IS NULL THEN NULL
        |         WHEN (CASE WHEN g.hib THEN b.best / m.fleet_median
        |                    ELSE m.fleet_median / b.best END) <= 0 THEN NULL
        |         WHEN g.hib THEN b.best / m.fleet_median
        |         ELSE m.fleet_median / b.best END AS norm
        |  FROM grid g
        |  LEFT JOIN best b ON b.user_id = g.user_id AND b.workload = g.workload
        |    AND b.entry_idx = g.entry_idx
        |  JOIN med m ON m.workload = g.workload AND m.entry_idx = g.entry_idx),
        |agg AS (
        |  SELECT user_id, workload,
        |    SUM(CASE WHEN norm IS NOT NULL THEN weight * LOG2(norm)
        |             WHEN policy = 'penalize' THEN weight * LOG2(penalty) END) AS wlog,
        |    SUM(CASE WHEN norm IS NOT NULL OR policy = 'penalize' THEN weight END) AS w_eff,
        |    MAX(CASE WHEN policy = 'require' AND norm IS NULL THEN 1 ELSE 0 END) AS missing_req,
        |    SUM(CASE WHEN norm IS NOT NULL THEN weight END) AS w_present,
        |    SUM(weight) AS w_total
        |  FROM norm GROUP BY user_id, workload)
        |SELECT user_id, workload,
        |  ROUND(POWER(2.0, wlog / w_eff), 6) AS score,
        |  ROUND(w_present / w_total, 6) AS coverage
        |FROM agg
        |WHERE missing_req = 0 AND w_eff IS NOT NULL AND w_eff <> 0
        |ORDER BY user_id""".stripMargin)
}
