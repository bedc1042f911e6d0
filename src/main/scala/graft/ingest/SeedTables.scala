package graft.ingest

import graft.schema.{Schemas, Validate}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Static seed tables compiled into the engine (reference S5,
  * `lookup.py:18-766`, `workload_profiles.py:125-470`), at full literal
  * parity: 39 countries, the 57-benchmark catalog (24 direct + 17
  * Geekbench + 16 PassMark generated entries), 3 compliance frameworks,
  * and the 6 live workload profiles with their 39 weighted entries
  * including per-entry config filters. Seeds are data: the frames conform
  * through the same Validate path as crawled rows.
  */
object SeedTables {

  /** `lookup.py:18-58` country→continent mapping, all 39 rows. */
  private val countryRows: Seq[(String, String)] = Seq(
    "AE" -> "Asia", "AT" -> "Europe", "AU" -> "Oceania", "BE" -> "Europe",
    "BH" -> "Asia", "BR" -> "South America", "CA" -> "North America",
    "CH" -> "Europe", "CL" -> "South America", "CN" -> "Asia",
    "DE" -> "Europe", "DK" -> "Europe", "ES" -> "Europe", "FI" -> "Europe",
    "FR" -> "Europe", "GB" -> "Europe", "HK" -> "Asia", "ID" -> "Asia",
    "IE" -> "Europe", "IL" -> "Asia", "IT" -> "Europe", "IN" -> "Asia",
    "JP" -> "Asia", "KR" -> "Asia", "MY" -> "Asia", "MX" -> "North America",
    "NL" -> "Europe", "NO" -> "Europe", "NZ" -> "Oceania", "PH" -> "Asia",
    "PL" -> "Europe", "QA" -> "Asia", "SA" -> "Asia", "SE" -> "Europe",
    "SG" -> "Asia", "TH" -> "Asia", "TW" -> "Asia", "US" -> "North America",
    "ZA" -> "Africa")

  private val frameworkRows: Seq[(String, String, String)] = Seq(
    ("hipaa", "The Health Insurance Portability and Accountability Act", "HIPAA"),
    ("soc2t2", "System and Organization Controls Level 2 Type 2", "SOC 2 Type 2"),
    ("iso27001", "ISO/IEC 27001", "ISO 27001"))

  /** Benchmark metadata: (benchmark_id, framework, measurement, unit,
    * higher_is_better). Direct entries from `lookup.py:213-766`; the
    * Geekbench/PassMark families expand exactly like the reference's
    * `_geekbenchmark`/`_passmark` helpers (measurement = snake-cased
    * name). */
  private val directBenchmarkRows: Seq[(String, String, Option[String], Option[String], Boolean)] = Seq(
    ("bogomips", "bogomips", None, Some("Millions of instructions per second (MIPS)"), true),
    ("bw_mem", "bw_mem", None, Some("Megabytes per second (MB/sec)"), true),
    ("compression_text:ratio", "compression_text", Some("ratio"), None, false),
    ("compression_text:compress", "compression_text", Some("compress"), Some("Bytes per second (Bps)"), true),
    ("compression_text:decompress", "compression_text", Some("decompress"), Some("Bytes per second (Bps)"), true),
    ("openssl", "openssl", None, Some("Bytes per second (Bps)"), true),
    ("stress_ng:cpu_all", "stress_ng", Some("cpu_all"), Some("Bogo operations per second (ops/s)"), true),
    ("stress_ng:div16", "stress_ng", Some("div16"), Some("Bogo operations per second (ops/s)"), true),
    ("stress_ng:best1", "stress_ng", Some("best1"), Some("Bogo operations per second (ops/s)"), true),
    ("stress_ng:bestn", "stress_ng", Some("bestn"), Some("Bogo operations per second (ops/s)"), true),
    ("static_web:rps", "static_web", Some("rps"), Some("Requests per second (rps)"), true),
    ("static_web:rps-extrapolated", "static_web", Some("rps-extrapolated"), Some("Requests per second (rps)"), true),
    ("static_web:throughput", "static_web", Some("throughput"), Some("Bytes per second (Bps)"), true),
    ("static_web:throughput-extrapolated", "static_web", Some("throughput-extrapolated"), Some("Bytes per second (Bps)"), true),
    ("static_web:latency", "static_web", Some("latency"), Some("Seconds (sec)"), false),
    ("redis:rps", "redis", Some("rps"), Some("Operations per second (ops/sec)"), true),
    ("redis:rps-extrapolated", "redis", Some("rps-extrapolated"), Some("Operations per second (ops/sec)"), true),
    ("redis:latency", "redis", Some("latency"), Some("Milliseconds (ms)"), false),
    ("membench:bandwidth_read", "membench", Some("memory_bandwidth"), Some("MB/s"), true),
    ("membench:bandwidth_write", "membench", Some("memory_bandwidth"), Some("MB/s"), true),
    ("membench:bandwidth_copy", "membench", Some("memory_bandwidth"), Some("MB/s"), true),
    ("membench:latency", "membench", Some("memory_latency"), Some("ns"), false),
    ("llm_speed:text_generation", "llm_speed", Some("text_generation"), Some("tokens/second (t/s)"), true),
    ("llm_speed:prompt_processing", "llm_speed", Some("prompt_processing"), Some("tokens/second (t/s)"), true))

  /** `lookup.py:280-357`: the 17 Geekbench 6 workload names. */
  private val geekbenchNames: Seq[String] = Seq(
    "Score", "File Compression", "Navigation", "HTML5 Browser", "PDF Renderer",
    "Photo Library", "Clang", "Text Processing", "Asset Compression",
    "Object Detection", "Background Blur", "Horizon Detection",
    "Object Remover", "HDR", "Photo Filter", "Ray Tracer",
    "Structure from Motion")

  /** `lookup.py:555-645`: PassMark tests as (name, unit, higher_is_better). */
  private val passmarkRows: Seq[(String, Option[String], Boolean)] = Seq(
    ("CPU Mark", None, true),
    ("CPU Integer Maths Test", Some("Millions of operations per second (Mops/s)"), true),
    ("CPU Floating Point Maths Test", Some("Millions of operations per second (Mops/s)"), true),
    ("CPU Prime Numbers Test", Some("Million prime numbers per second (Mnums/s)"), true),
    ("CPU String Sorting Test", Some("Thousands of strings per second (Kstrings/s)"), true),
    ("CPU Encryption Test", Some("Megabytes per second (MB/s)"), true),
    ("CPU Compression Test", Some("Kilobytes per second (kB/s)"), true),
    ("CPU Single Threaded Test", Some("Millions of operations per second (Mops/s)"), true),
    ("CPU Physics Test", Some("Frames per second (fps)"), true),
    ("CPU Extended Instructions Test", Some("Millions of matrices per second (Mmat/s)"), true),
    ("Memory Mark", None, true),
    ("Database Operations", Some("Thousands of operations per second (Kops/s)"), true),
    ("Memory Read Cached", Some("Megabytes per second (MB/s)"), true),
    ("Memory Read Uncached", Some("Megabytes per second (MB/s)"), true),
    ("Memory Write", Some("Megabytes per second (MB/s)"), true),
    ("Memory Latency", Some("Nanoseconds (ns)"), false))

  /** The reference's `sub(r"\W+", "_", name.lower())` measurement id. */
  private def snake(name: String): String =
    name.toLowerCase.replaceAll("\\W+", "_")

  val benchmarkRows: Seq[(String, String, Option[String], Option[String], Boolean)] =
    directBenchmarkRows ++
      geekbenchNames.map(n =>
        (s"geekbench:${snake(n)}", "geekbench", Some(snake(n)), None, true)) ++
      passmarkRows.map { case (n, unit, hib) =>
        (s"passmark:${snake(n)}", "passmark", Some(snake(n)), unit, hib) }

  /** The 6 live workload profiles (`workload_profiles.py:125-470`):
    * (workload, entry_idx, benchmark_id, weight, label, config_filter).
    * Filters are the reference's literal key/value pairs — matching runs
    * through [[graft.analytics.WorkloadScores.configMatches]]'s
    * float-tolerant comparison. */
  val workloadEntryRows: Seq[(String, Int, String, Double, String, Map[String, String])] = Seq(
    ("web", 0, "static_web:rps-extrapolated", 0.30, "Static web RPS (1 KiB, 8 conn/vCPU)",
      Map("size" -> "1k", "connections_per_vcpus" -> "8.0")),
    ("web", 1, "static_web:rps-extrapolated", 0.20, "Static web RPS (64 KiB, 8 conn/vCPU)",
      Map("size" -> "64k", "connections_per_vcpus" -> "8.0")),
    ("web", 2, "static_web:throughput-extrapolated", 0.20, "Static web throughput (256 KiB, 8 conn/vCPU)",
      Map("size" -> "256k", "connections_per_vcpus" -> "8.0")),
    ("web", 3, "openssl", 0.20, "OpenSSL AES-256-CBC (16 kB blocks)",
      Map("algo" -> "AES-256-CBC", "block_size" -> "16384")),
    ("web", 4, "compression_text:compress", 0.05, "Gzip compression (multi-core, level 5)",
      Map("algo" -> "gzip", "compression_level" -> "5", "cores" -> "multi")),
    ("web", 5, "passmark:cpu_string_sorting_test", 0.05, "PassMark string sorting", Map.empty),
    ("compute", 0, "stress_ng:bestn", 0.15, "stress-ng div16 best-N cores", Map.empty),
    ("compute", 1, "stress_ng:best1", 0.10, "stress-ng div16 single core", Map.empty),
    ("compute", 2, "passmark:cpu_mark", 0.20, "PassMark CPU Mark (composite)", Map.empty),
    ("compute", 3, "bw_mem", 0.10, "Memory bandwidth (read, 64 MB)",
      Map("operation" -> "rd", "size" -> "64.0")),
    ("compute", 4, "passmark:cpu_floating_point_maths_test", 0.15, "PassMark floating point", Map.empty),
    ("compute", 5, "passmark:cpu_extended_instructions_test", 0.15, "PassMark AVX/SSE/FMA (SIMD)", Map.empty),
    ("compute", 6, "passmark:cpu_integer_maths_test", 0.10, "PassMark integer math", Map.empty),
    ("compute", 7, "passmark:cpu_physics_test", 0.05, "PassMark physics simulation", Map.empty),
    ("cache", 0, "redis:rps-extrapolated", 0.50, "Redis RPS (pipeline=1, SET)",
      Map("operation" -> "SET", "pipeline" -> "1.0")),
    ("cache", 1, "redis:rps-extrapolated", 0.20, "Redis RPS (pipeline=16, SET)",
      Map("operation" -> "SET", "pipeline" -> "16.0")),
    ("cache", 2, "passmark:memory_mark", 0.10, "PassMark Memory Mark (composite)", Map.empty),
    ("cache", 3, "bw_mem", 0.10, "Memory bandwidth (read, 16 MB ~ L3)",
      Map("operation" -> "rd", "size" -> "16.0")),
    ("cache", 4, "passmark:cpu_single_threaded_test", 0.10, "PassMark single-thread CPU", Map.empty),
    ("data_analysis", 0, "passmark:cpu_mark", 0.70, "PassMark CPU Mark (composite)", Map.empty),
    ("data_analysis", 1, "compression_text:compress", 0.10, "Gzip compression (single-core, level 5)",
      Map("algo" -> "gzip", "compression_level" -> "5", "cores" -> "single")),
    ("data_analysis", 2, "bw_mem", 0.10, "Memory bandwidth (read, 64 MB)",
      Map("operation" -> "rd", "size" -> "64.0")),
    ("data_analysis", 3, "passmark:memory_mark", 0.10, "PassMark Memory Mark (composite)", Map.empty),
    ("llm", 0, "llm_speed:text_generation", 0.15, "LLM text generation (SmolLM-135M, 128 tok)",
      Map("model" -> "SmolLM-135M.Q4_K_M.gguf", "tokens" -> "128")),
    ("llm", 1, "llm_speed:prompt_processing", 0.15, "LLM prompt processing (SmolLM-135M, 512 tok)",
      Map("model" -> "SmolLM-135M.Q4_K_M.gguf", "tokens" -> "512")),
    ("llm", 2, "llm_speed:text_generation", 0.15, "LLM text generation (Llama 7B, 128 tok)",
      Map("model" -> "llama-7b.Q4_K_M.gguf", "tokens" -> "128")),
    ("llm", 3, "llm_speed:prompt_processing", 0.15, "LLM prompt processing (Llama 7B, 512 tok)",
      Map("model" -> "llama-7b.Q4_K_M.gguf", "tokens" -> "512")),
    ("llm", 4, "llm_speed:text_generation", 0.15, "LLM text generation (Llama-3.3 70B, 128 tok)",
      Map("model" -> "Llama-3.3-70B-Instruct-Q4_K_M.gguf", "tokens" -> "128")),
    ("llm", 5, "llm_speed:prompt_processing", 0.15, "LLM prompt processing (Llama-3.3 70B, 512 tok)",
      Map("model" -> "Llama-3.3-70B-Instruct-Q4_K_M.gguf", "tokens" -> "512")),
    ("llm", 6, "bw_mem", 0.05, "Memory bandwidth (read, 256 MB)",
      Map("operation" -> "rd", "size" -> "256.0")),
    ("llm", 7, "passmark:cpu_extended_instructions_test", 0.025, "PassMark AVX/SSE/FMA (SIMD)", Map.empty),
    ("llm", 8, "passmark:cpu_floating_point_maths_test", 0.025, "PassMark floating point", Map.empty),
    ("cicd", 0, "geekbench:clang", 0.50, "Geekbench Clang compilation (multi-core)",
      Map("cores" -> "multi")),
    ("cicd", 1, "geekbench:clang", 0.10, "Geekbench Clang compilation (single-core)",
      Map("cores" -> "single")),
    ("cicd", 2, "stress_ng:bestn", 0.20, "stress-ng div16 best-N cores", Map.empty),
    ("cicd", 3, "passmark:cpu_integer_maths_test", 0.05, "PassMark integer math", Map.empty),
    ("cicd", 4, "passmark:cpu_compression_test", 0.05, "PassMark compression", Map.empty),
    ("cicd", 5, "compression_text:compress", 0.05, "Brotli compression (multi-core, level 0)",
      Map("algo" -> "brotli", "compression_level" -> "0", "cores" -> "single")),
    ("cicd", 6, "passmark:cpu_string_sorting_test", 0.05, "PassMark string sorting", Map.empty))

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

  /** Workload entries in [[graft.analytics.WorkloadScores]] shape, with
    * the per-entry `config_filter` column its fan-out applies (all live
    * entries reference higher-is-better benchmarks and use the
    * weight-renormalizing ignore policy, like the reference's score
    * computation). */
  def workloads(spark: SparkSession): DataFrame = {
    import spark.implicits._
    workloadEntryRows
      .toDF("workload", "entry_idx", "benchmark_id", "weight", "label", "config_filter")
      .withColumn("higher_is_better", lit(true))
      .withColumn("policy", lit("ignore"))
      .withColumn("penalty", lit(1e-4))
  }
}
