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
         |FROM med ORDER BY workload, entry_idx""".stripMargin)
}
