package graft.ingest

import graft.SparkSpec

/** Benchmark-catalog exact-set parity against the reference
  * (`lookup.py:213-766`): 24 direct `Benchmark()` entries plus the
  * generated geekbench (17) and passmark (16) families, whose ids are
  * `<framework>:` + the snake-cased test name — 57 ids total. The list
  * below was extracted from the reference source by AST walk (direct
  * `benchmark_id=` constants, `_geekbenchmark`/`_passmark` first args
  * through `sub(r"\W+","_",name.lower())`), so a drift in either
  * direction — a missing id or an invented one — fails the set diff.
  */
class SeedParitySpec extends SparkSpec {

  private val referenceDirect = Set(
    "bogomips",
    "bw_mem",
    "compression_text:compress",
    "compression_text:decompress",
    "compression_text:ratio",
    "geekbench:score",
    "llm_speed:prompt_processing",
    "llm_speed:text_generation",
    "membench:bandwidth_copy",
    "membench:bandwidth_read",
    "membench:bandwidth_write",
    "membench:latency",
    "openssl",
    "redis:latency",
    "redis:rps",
    "redis:rps-extrapolated",
    "static_web:latency",
    "static_web:rps",
    "static_web:rps-extrapolated",
    "static_web:throughput",
    "static_web:throughput-extrapolated",
    "stress_ng:best1",
    "stress_ng:bestn",
    "stress_ng:cpu_all",
    "stress_ng:div16")

  private val referenceGeekbench = Set(
    "asset_compression", "background_blur", "clang", "file_compression",
    "hdr", "horizon_detection", "html5_browser", "navigation",
    "object_detection", "object_remover", "pdf_renderer", "photo_filter",
    "photo_library", "ray_tracer", "structure_from_motion",
    "text_processing").map("geekbench:" + _)

  private val referencePassmark = Set(
    "cpu_compression_test", "cpu_encryption_test",
    "cpu_extended_instructions_test", "cpu_floating_point_maths_test",
    "cpu_integer_maths_test", "cpu_mark", "cpu_physics_test",
    "cpu_prime_numbers_test", "cpu_single_threaded_test",
    "cpu_string_sorting_test", "database_operations", "memory_latency",
    "memory_mark", "memory_read_cached", "memory_read_uncached",
    "memory_write").map("passmark:" + _)

  private val referenceIds = referenceDirect ++ referenceGeekbench ++ referencePassmark

  test("reference benchmark id universe is 57 ids (24 direct + 17 gb + 16 pm)") {
    // geekbench:score is a direct entry in the reference, not a
    // _geekbenchmark() generation — counted on the direct side here.
    assert(referenceDirect.size == 25 && referenceGeekbench.size == 16 &&
      referencePassmark.size == 16)
    assert(referenceIds.size == 57)
  }

  test("SeedTables benchmark ids equal the reference set exactly") {
    val ours = SeedTables.benchmarkRows.map(_._1).toSet
    val missing = referenceIds -- ours
    val invented = ours -- referenceIds
    assert(missing.isEmpty, s"ids in reference but not SeedTables: $missing")
    assert(invented.isEmpty, s"ids in SeedTables but not reference: $invented")
  }

  test("generated-family framework/measurement fields are consistent with the id") {
    SeedTables.benchmarkRows.foreach { case (id, framework, measurement, _, _) =>
      if (id.startsWith("geekbench:") || id.startsWith("passmark:")) {
        assert(id == s"$framework:${measurement.getOrElse("")}", id)
      }
    }
  }
}
