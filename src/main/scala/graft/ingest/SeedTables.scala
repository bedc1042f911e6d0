package graft.ingest

import graft.schema.{Schemas, Validate}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Static seed tables compiled into the engine (reference S5,
  * `lookup.py:18-766`, `workload_profiles.py:125-470`): countries,
  * compliance frameworks, benchmark metadata, workload profiles. The
  * reference ships ~39 countries / ~60 benchmarks / 6 workload profiles;
  * here a representative seed set with identical shape — seeds are data,
  * swapped per deployment. */
object SeedTables {

  private val countryRows: Seq[(String, String)] = Seq(
    "US" -> "North America", "CA" -> "North America", "MX" -> "North America",
    "BR" -> "South America", "CL" -> "South America",
    "DE" -> "Europe", "FR" -> "Europe", "GB" -> "Europe", "IE" -> "Europe",
    "NL" -> "Europe", "SE" -> "Europe", "ES" -> "Europe", "IT" -> "Europe",
    "PL" -> "Europe", "CH" -> "Europe", "FI" -> "Europe",
    "JP" -> "Asia", "KR" -> "Asia", "SG" -> "Asia", "IN" -> "Asia",
    "CN" -> "Asia", "HK" -> "Asia", "ID" -> "Asia", "AE" -> "Asia",
    "IL" -> "Asia", "BH" -> "Asia",
    "AU" -> "Oceania", "NZ" -> "Oceania",
    "ZA" -> "Africa")

  private val frameworkRows: Seq[(String, String, String)] = Seq(
    ("hipaa", "Health Insurance Portability and Accountability Act", "HIPAA"),
    ("iso27001", "ISO/IEC 27001", "ISO 27001"),
    ("soc2t2", "System and Organization Controls Level 2 Type 2", "SOC 2 Type 2"))

  /** Benchmark metadata rows: (benchmark_id, framework, measurement, unit,
    * higher_is_better). */
  private val benchmarkRows: Seq[(String, String, String, String, Boolean)] = Seq(
    ("bw_mem:rd", "bw_mem", "bandwidth", "MB/s", true),
    ("bw_mem:wr", "bw_mem", "bandwidth", "MB/s", true),
    ("stressng:cpu", "stressng", "bogo_ops", "ops", true),
    ("stressng:best1", "stressng", "bogo_ops", "ops", true),
    ("stressng:bestn", "stressng", "bogo_ops", "ops", true),
    ("passmark:summ_cpu", "passmark", "score", "points", true),
    ("passmark:me_latency", "passmark", "latency", "ns", false),
    ("geekbench:file_compression", "geekbench", "score", "points", true),
    ("membench", "membench", "bandwidth", "MB/s", true),
    ("llm_speed:prompt_processing", "llm", "speed", "tokens/s", true),
    ("llm_speed:text_generation", "llm", "speed", "tokens/s", true),
    ("static_web:rps", "static_web", "throughput", "req/s", true),
    ("static_web:throughput", "static_web", "throughput", "B/s", true),
    ("redis:rps", "redis", "throughput", "ops/s", true))

  /** Workload-profile entries in [[graft.analytics.WorkloadScores]] shape:
    * (workload, entry_idx, benchmark_id, weight, higher_is_better, policy,
    * penalty). */
  val workloadEntries: Seq[(String, Int, String, Double, Boolean, String, Double)] = Seq(
    ("web_serving", 0, "static_web:rps", 2.0, true, "require", 1e-4),
    ("web_serving", 1, "stressng:bestn", 1.0, true, "ignore", 1e-4),
    ("web_serving", 2, "bw_mem:rd", 1.0, true, "ignore", 1e-4),
    ("caching", 0, "redis:rps", 2.0, true, "require", 1e-4),
    ("caching", 1, "membench", 1.0, true, "ignore", 1e-4),
    ("batch_compute", 0, "stressng:bestn", 2.0, true, "require", 1e-4),
    ("batch_compute", 1, "passmark:summ_cpu", 1.0, true, "ignore", 1e-4),
    ("llm_inference", 0, "llm_speed:text_generation", 2.0, true, "penalize", 1e-2),
    ("llm_inference", 1, "llm_speed:prompt_processing", 1.0, true, "penalize", 1e-2),
    ("llm_inference", 2, "bw_mem:rd", 1.0, true, "ignore", 1e-4),
    ("latency_sensitive", 0, "passmark:me_latency", 2.0, false, "require", 1e-4),
    ("latency_sensitive", 1, "stressng:best1", 1.0, true, "ignore", 1e-4),
    ("general", 0, "stressng:bestn", 1.0, true, "ignore", 1e-4),
    ("general", 1, "bw_mem:rd", 1.0, true, "ignore", 1e-4),
    ("general", 2, "static_web:rps", 1.0, true, "ignore", 1e-4))

  /** Country seeds as a SQL VALUES list for the DuckDB oracle — generated
    * from the same rows, so engine and oracle cannot drift. */
  def countryValuesSql: String =
    countryRows.map { case (id, cont) => s"('$id', '$cont')" }.mkString(", ")

  def countries(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Validate.conform(
      countryRows.toDF("country_id", "continent")
        .withColumn("status", lit("active"))
        .withColumn("observed_at", current_timestamp()),
      Schemas.country)
  }

  def complianceFrameworks(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Validate.conform(
      frameworkRows.toDF("compliance_framework_id", "name", "abbreviation")
        .withColumn("status", lit("active"))
        .withColumn("observed_at", current_timestamp()),
      Schemas.complianceFramework)
  }

  def benchmarks(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Validate.conform(
      benchmarkRows.toDF("benchmark_id", "framework", "measurement", "unit", "higher_is_better")
        .withColumn("status", lit("active"))
        .withColumn("observed_at", current_timestamp()),
      Schemas.benchmark)
  }

  def workloads(spark: SparkSession): DataFrame =
    graft.analytics.WorkloadScores.entriesDf(spark, workloadEntries)
}
