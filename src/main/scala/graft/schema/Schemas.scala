package graft.schema

import org.apache.spark.sql.types._

/** Explicit StructType schemas for the reference's 19 core tables
  * (reference `tables.py:56-776`, nested JSON field shapes
  * `table_fields.py:53-335`; see SURVEY §1). Schemas are code — never
  * inferred — and every table carries the two meta columns `status` and
  * `observed_at` (reference `table_bases.py:219-230`).
  *
  * SCD Type 2 twins share the schema; only the primary key changes
  * (`observed_at` promoted into it, reference `tables_scd.py:45-53`).
  */
object Schemas {

  private def f(name: String, t: DataType, nullable: Boolean = true) =
    StructField(name, t, nullable)

  private val meta = Seq(
    f("status", StringType, nullable = false),
    f("observed_at", TimestampType, nullable = false))

  // ---- nested JSON shapes (ArrayType(StructType)) --------------------
  val cpuType: StructType = StructType(Seq(
    f("manufacturer", StringType), f("family", StringType), f("model", StringType),
    f("cores", IntegerType), f("threads", IntegerType),
    f("l1_cache_size", LongType), f("l2_cache_size", LongType), f("l3_cache_size", LongType),
    f("microcode", StringType), f("capabilities", ArrayType(StringType)),
    f("bugs", ArrayType(StringType)), f("bogomips", DoubleType)))

  val gpuType: StructType = StructType(Seq(
    f("manufacturer", StringType), f("family", StringType), f("model", StringType),
    f("memory", LongType), f("firmware_version", StringType),
    f("bios_version", StringType), f("graphics_clock", IntegerType),
    f("sm_clock", IntegerType), f("mem_clock", IntegerType), f("video_clock", IntegerType)))

  val diskType: StructType = StructType(Seq(
    f("size", LongType), f("storage_type", StringType), f("description", StringType)))

  val priceTierType: StructType = StructType(Seq(
    f("lower", DoubleType), f("upper", DoubleType), f("price", DoubleType)))

  // ---- dimension tables ---------------------------------------------
  val country: StructType = StructType(Seq(
    f("country_id", StringType, nullable = false),
    f("continent", StringType)) ++ meta)

  val complianceFramework: StructType = StructType(Seq(
    f("compliance_framework_id", StringType, nullable = false),
    f("name", StringType), f("abbreviation", StringType),
    f("description", StringType), f("homepage", StringType)) ++ meta)

  val vendor: StructType = StructType(Seq(
    f("vendor_id", StringType, nullable = false),
    f("name", StringType), f("logo", StringType), f("homepage", StringType),
    f("country_id", StringType), f("state", StringType), f("city", StringType),
    f("address_line", StringType), f("zip_code", StringType),
    f("founding_year", IntegerType), f("status_page", StringType)) ++ meta)

  val vendorComplianceLink: StructType = StructType(Seq(
    f("vendor_id", StringType, nullable = false),
    f("compliance_framework_id", StringType, nullable = false),
    f("comment", StringType)) ++ meta)

  val region: StructType = StructType(Seq(
    f("vendor_id", StringType, nullable = false),
    f("region_id", StringType, nullable = false),
    f("name", StringType), f("api_reference", StringType), f("display_name", StringType),
    f("aliases", ArrayType(StringType)),
    f("country_id", StringType), f("state", StringType), f("city", StringType),
    f("address_line", StringType), f("zip_code", StringType),
    f("lon", DoubleType), f("lat", DoubleType),
    f("founding_year", IntegerType), f("green_energy", BooleanType)) ++ meta)

  val zone: StructType = StructType(Seq(
    f("vendor_id", StringType, nullable = false),
    f("region_id", StringType, nullable = false),
    f("zone_id", StringType, nullable = false),
    f("name", StringType), f("api_reference", StringType),
    f("display_name", StringType)) ++ meta)

  val storage: StructType = StructType(Seq(
    f("vendor_id", StringType, nullable = false),
    f("storage_id", StringType, nullable = false),
    f("name", StringType), f("description", StringType),
    f("storage_type", StringType), f("max_iops", LongType),
    f("max_throughput", LongType), f("min_size", LongType),
    f("max_size", LongType)) ++ meta)

  val server: StructType = StructType(Seq(
    f("vendor_id", StringType, nullable = false),
    f("server_id", StringType, nullable = false),
    f("name", StringType), f("api_reference", StringType), f("display_name", StringType),
    f("description", StringType), f("family", StringType),
    f("vcpus", IntegerType), f("hypervisor", StringType),
    f("cpu_allocation", StringType), f("cpu_cores", IntegerType), f("cpu_speed", DoubleType),
    f("cpu_architecture", StringType), f("cpu_manufacturer", StringType),
    f("cpu_family", StringType), f("cpu_model", StringType), f("cpu_l1_cache", LongType),
    f("cpu_l2_cache", LongType), f("cpu_l3_cache", LongType),
    f("cpu_flags", ArrayType(StringType)), f("cpus", ArrayType(cpuType)),
    f("memory_amount", LongType), f("memory_generation", StringType),
    f("memory_speed", IntegerType), f("memory_ecc", BooleanType),
    // float, not int: fractional GPU offerings exist (reference migration
    // aeae56af8ca6 v0.3.4 converted this column; `table_bases.py:734`)
    f("gpu_count", DoubleType), f("gpu_memory_min", LongType), f("gpu_memory_total", LongType),
    f("gpu_manufacturer", StringType), f("gpu_family", StringType), f("gpu_model", StringType),
    f("gpus", ArrayType(gpuType)),
    f("storage_size", LongType), f("storage_type", StringType),
    f("storages", ArrayType(diskType)),
    f("network_speed", DoubleType), f("inbound_traffic", DoubleType),
    f("outbound_traffic", DoubleType), f("ipv4", IntegerType)) ++ meta)

  val serverPrice: StructType = StructType(Seq(
    f("vendor_id", StringType, nullable = false),
    f("region_id", StringType, nullable = false),
    f("zone_id", StringType, nullable = false),
    f("server_id", StringType, nullable = false),
    f("operating_system", StringType, nullable = false),
    f("allocation", StringType, nullable = false),
    f("unit", StringType), f("price", DoubleType),
    f("price_upfront", DoubleType), f("price_tiered", ArrayType(priceTierType)),
    f("currency", StringType)) ++ meta)

  val serverDescription: StructType = StructType(Seq(
    f("vendor_id", StringType, nullable = false),
    f("server_id", StringType, nullable = false),
    f("model", StringType),
    f("page", ArrayType(StringType)),
    f("description", StringType), f("og_description", StringType),
    f("meta_description", StringType), f("tagline", StringType),
    f("bullet_points", ArrayType(StringType)),
    f("categories", ArrayType(StringType))) ++ meta)

  val storagePrice: StructType = StructType(Seq(
    f("vendor_id", StringType, nullable = false),
    f("region_id", StringType, nullable = false),
    f("storage_id", StringType, nullable = false),
    f("unit", StringType), f("price", DoubleType),
    f("price_tiered", ArrayType(priceTierType)), f("currency", StringType)) ++ meta)

  val database: StructType = StructType(Seq(
    f("vendor_id", StringType, nullable = false),
    f("database_id", StringType, nullable = false),
    f("name", StringType), f("engine", StringType),
    f("engine_versions", ArrayType(StringType)),
    f("multi_az", BooleanType), f("serverless", BooleanType),
    f("continuous_backups", IntegerType)) ++ meta)

  val databasePrice: StructType = StructType(Seq(
    f("vendor_id", StringType, nullable = false),
    f("region_id", StringType, nullable = false),
    f("zone_id", StringType, nullable = false),
    f("database_id", StringType, nullable = false),
    f("server_id", StringType),
    f("allocation", StringType, nullable = false),
    f("unit", StringType), f("price", DoubleType),
    f("price_tiered", ArrayType(priceTierType)), f("currency", StringType)) ++ meta)

  val databaseStorage: StructType = StructType(Seq(
    f("vendor_id", StringType, nullable = false),
    f("database_storage_id", StringType, nullable = false),
    f("name", StringType), f("storage_type", StringType),
    f("max_iops", LongType), f("max_throughput", LongType),
    f("min_size", LongType), f("max_size", LongType)) ++ meta)

  val databaseStoragePrice: StructType = StructType(Seq(
    f("vendor_id", StringType, nullable = false),
    f("region_id", StringType, nullable = false),
    f("database_storage_id", StringType, nullable = false),
    f("unit", StringType), f("price", DoubleType),
    f("price_tiered", ArrayType(priceTierType)), f("currency", StringType)) ++ meta)

  val trafficPrice: StructType = StructType(Seq(
    f("vendor_id", StringType, nullable = false),
    f("region_id", StringType, nullable = false),
    f("direction", StringType, nullable = false),
    f("unit", StringType), f("price", DoubleType),
    f("price_tiered", ArrayType(priceTierType)), f("currency", StringType)) ++ meta)

  val ipv4Price: StructType = StructType(Seq(
    f("vendor_id", StringType, nullable = false),
    f("region_id", StringType, nullable = false),
    f("unit", StringType), f("price", DoubleType), f("currency", StringType)) ++ meta)

  val benchmark: StructType = StructType(Seq(
    f("benchmark_id", StringType, nullable = false),
    // added by reference migration 8c5bd4869b90 (v0.5.1); `table_bases.py:1059`
    f("category", StringType),
    f("name", StringType), f("description", StringType),
    f("framework", StringType), f("config_fields", MapType(StringType, StringType)),
    f("measurement", StringType), f("unit", StringType),
    f("higher_is_better", BooleanType)) ++ meta)

  /** `config` is part of the PK; the canonical-JSON string `config_json`
    * sibling makes it groupable/joinable (MapType equality is not allowed
    * in Spark group-bys — SURVEY §7.4 risk 2). */
  val benchmarkScore: StructType = StructType(Seq(
    f("vendor_id", StringType, nullable = false),
    f("server_id", StringType, nullable = false),
    f("benchmark_id", StringType, nullable = false),
    f("config", MapType(StringType, StringType)),
    f("config_json", StringType, nullable = false),
    f("score", DoubleType),
    f("framework_version", StringType), f("kernel_version", StringType),
    f("note", StringType)) ++ meta)

  val metadataTable: StructType = StructType(Seq(
    f("key", StringType, nullable = false), f("value", StringType)) ++ meta)

  // ---- registry ------------------------------------------------------
  /** table name → (schema, primary-key columns). */
  val tables: Map[String, (StructType, Seq[String])] = Map(
    "country" -> (country, Seq("country_id")),
    "compliance_framework" -> (complianceFramework, Seq("compliance_framework_id")),
    "vendor" -> (vendor, Seq("vendor_id")),
    "vendor_compliance_link" -> (vendorComplianceLink, Seq("vendor_id", "compliance_framework_id")),
    "region" -> (region, Seq("vendor_id", "region_id")),
    "zone" -> (zone, Seq("vendor_id", "region_id", "zone_id")),
    "storage" -> (storage, Seq("vendor_id", "storage_id")),
    "server" -> (server, Seq("vendor_id", "server_id")),
    "server_price" -> (serverPrice,
      Seq("vendor_id", "region_id", "zone_id", "server_id", "operating_system", "allocation")),
    "server_description" -> (serverDescription, Seq("vendor_id", "server_id")),
    "storage_price" -> (storagePrice, Seq("vendor_id", "region_id", "storage_id")),
    "database" -> (database, Seq("vendor_id", "database_id")),
    "database_price" -> (databasePrice,
      Seq("vendor_id", "region_id", "zone_id", "database_id", "allocation")),
    "database_storage" -> (databaseStorage, Seq("vendor_id", "database_storage_id")),
    "database_storage_price" -> (databaseStoragePrice,
      Seq("vendor_id", "region_id", "database_storage_id")),
    "traffic_price" -> (trafficPrice, Seq("vendor_id", "region_id", "direction")),
    "ipv4_price" -> (ipv4Price, Seq("vendor_id", "region_id")),
    "benchmark" -> (benchmark, Seq("benchmark_id")),
    "benchmark_score" -> (benchmarkScore,
      Seq("vendor_id", "server_id", "benchmark_id", "config_json")),
    "_metadata" -> (metadataTable, Seq("key")))

  /** SCD Type 2 twin: same schema, `observed_at` promoted into the PK
    * (reference `tables_scd.py:45-53`). */
  def scdKey(table: String): Seq[String] = tables(table)._2 :+ "observed_at"
}
