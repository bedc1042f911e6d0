package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Seventh concrete [[VendorInventory]]: a vendor publishing TWO plan
  * catalogs (virtual + bare-metal) with per-location PRICE OVERRIDES —
  * the shape of the reference's Vultr module (`vendors/_vultr.py`).
  * Distinct ingest traits the other six adapters don't exercise:
  *
  *  - **per-location price overrides** (`_vultr.py:549-560`): each plan
  *    carries base hourly/monthly costs plus a sparse `location_cost`
  *    MAP keyed by region whose entries override the base DURING the
  *    location fan-out — P7 override precedence inside a J3 fan-out,
  *    field-by-field (a partial override struct falls back per field);
  *  - **two unioned plan endpoints** (`_vultr.py:393-395`): virtual
  *    plans quote `vcpu_count` (shared cores), metal plans quote
  *    `cpu_count`/`cpu_threads` (dedicated) — the CPU allocation is
  *    derived from WHICH field exists (`_vultr.py:407-411`);
  *  - **fractional GPU counts** (`_vultr.py:441-455`): `gpu_count` may
  *    be an int, a STRING fraction (`"1/2"` → 0.5), or absent — then
  *    derived as `vram_total / vram_per_gpu` (why the registry models
  *    gpu_count as Double), with a manual fallback table for metal GPU
  *    plans whose API rows omit GPU fields entirely (`_vultr.py:168-198`);
  *  - **gpu_memory_min = min(per-GPU, total)** (`_vultr.py:440-444`):
  *    fractional offerings expose less than one card's VRAM;
  *  - **iterative CPU-model prefix stripping** (`_vultr.py:228-262`):
  *    `Gold 6448H` → `6448H`, family classified by substring rules;
  *  - **region-options-gated storage** (`_vultr.py:649-668`): the
  *    statically-priced block-storage catalog exists only in regions
  *    whose `options` array lists it;
  *  - **zero-price plans produce EMPTY tier chains** (`_vultr.py:557`)
  *    and two single-row special cases (IPv6-only plan, inactive free
  *    plan, `_vultr.py:536-543`).
  *
  * Fixtures are original, shaped after the reference's API responses.
  * Scale note: plan catalogs are control-plane small (hundreds of
  * rows), so every lookup side broadcasts; the only fan-out is
  * plans × locations, which shuffles nothing.
  */
class OverrideVendor extends VendorInventory {
  val vendorId = "override"

  private def withVendor(df: DataFrame): DataFrame =
    df.withColumn("vendor_id", lit(vendorId))

  // ------------------------------------------------------------- payloads

  /** Virtual plans (`/v2/plans` shape): location_cost overrides on the
    * first plan (od fields) and second plan (spot fields ONLY — a
    * partial override that must fall back per field), a ratio-derived
    * fractional GPU, a "1/2" string-fraction GPU, an IPv6-only plan and
    * a zero-priced free plan. */
  private[ingest] val plansPayload: String =
    """{"plans": [
      |  {"id": "vc2-2c-4gb", "type": "vc2", "vcpu_count": 2, "ram": 4096,
      |   "disk": 80, "disk_count": 1, "disk_type": "SSD", "cpu_vendor": "intel",
      |   "bandwidth": 3000, "hourly_cost": 0.018, "monthly_cost": 12.0,
      |   "deploy_ondemand": true, "deploy_preemptible": false,
      |   "locations": ["ams", "ewr", "sgp"],
      |   "location_cost": {"sgp": {"hourly_cost": 0.024, "monthly_cost": 16.0}}},
      |  {"id": "vhf-4c-16gb", "type": "vhf", "vcpu_count": 4, "ram": 16384,
      |   "disk": 384, "disk_count": 1, "disk_type": "HIGHFREQUENCY",
      |   "cpu_vendor": "amd", "bandwidth": 4000,
      |   "hourly_cost": 0.048, "monthly_cost": 32.0,
      |   "deploy_ondemand": true, "deploy_preemptible": true,
      |   "hourly_cost_preemptible": 0.019, "monthly_cost_preemptible": 13.0,
      |   "locations": ["ams", "ewr"],
      |   "location_cost": {"ewr": {"hourly_cost_preemptible": 0.017,
      |                             "monthly_cost_preemptible": 11.5}}},
      |  {"id": "vcg-a16-2c-8g-2vram", "type": "vcg", "vcpu_count": 2,
      |   "ram": 8192, "disk": 50, "disk_count": 1, "disk_type": "CLOUDGPU",
      |   "cpu_vendor": "amd", "bandwidth": 2000, "gpu_brand": "NVIDIA",
      |   "gpu_type": "NVIDIA_A16", "gpu_vram_gb": 2,
      |   "hourly_cost": 0.059, "monthly_cost": 40.0,
      |   "deploy_ondemand": true, "deploy_preemptible": false,
      |   "locations": ["ewr"]},
      |  {"id": "vcg-l40s-12c-100g-24vram", "type": "vcg", "vcpu_count": 12,
      |   "ram": 102400, "disk": 1050, "disk_count": 1, "disk_type": "CLOUDGPU",
      |   "cpu_vendor": "amd", "bandwidth": 6000, "gpu_brand": "NVIDIA",
      |   "gpu_type": "NVIDIA_L40S", "gpu_vram_gb": 24, "gpu_count": "1/2",
      |   "hourly_cost": 0.259, "monthly_cost": 175.0,
      |   "deploy_ondemand": true, "deploy_preemptible": false,
      |   "locations": ["ams", "ewr"]},
      |  {"id": "vc2-1c-0.5gb-v6", "type": "vc2", "vcpu_count": 1, "ram": 512,
      |   "disk": 10, "disk_count": 1, "disk_type": "SSD", "cpu_vendor": "intel",
      |   "bandwidth": 500, "hourly_cost": 0.0035, "monthly_cost": 2.5,
      |   "deploy_ondemand": true, "deploy_preemptible": false,
      |   "locations": ["sgp"]},
      |  {"id": "vc2-1c-0.5gb-free", "type": "vc2", "vcpu_count": 1, "ram": 512,
      |   "disk": 10, "disk_count": 1, "disk_type": "SSD", "cpu_vendor": "intel",
      |   "bandwidth": 500, "hourly_cost": 0.0, "monthly_cost": 0.0,
      |   "deploy_ondemand": true, "deploy_preemptible": false,
      |   "locations": ["ams"]}
      |]}""".stripMargin

  /** Bare-metal plans (`/v2/plans-metal` shape): no `vcpu_count` (the
    * allocation signal), threads/cores split, brand-less CPU model
    * strings, and a metal GPU plan with NO gpu fields at all (the
    * manual fallback table must fill them). */
  private[ingest] val plansMetalPayload: String =
    """{"plans_metal": [
      |  {"id": "vbm-24c-256gb", "type": "NVMe", "cpu_count": 24,
      |   "cpu_threads": 48, "cpu_model": "Gold 6448H", "cpu_mhz": 2400,
      |   "ram": 262144, "disk": 960, "disk_count": 2, "bandwidth": 10000,
      |   "hourly_cost": 2.397, "monthly_cost": 1610.0,
      |   "deploy_ondemand": true, "deploy_preemptible": false,
      |   "locations": ["ewr"]},
      |  {"id": "vdm-mi300x-96c-1536gb-1536vram", "type": "vdm",
      |   "cpu_count": 96, "cpu_threads": 192, "cpu_model": "EPYC 9334",
      |   "cpu_mhz": 2700, "ram": 1572864, "disk": 3840, "disk_count": 8,
      |   "disk_type": "DEDICATEDMETAL", "bandwidth": 25000,
      |   "hourly_cost": 9.9, "monthly_cost": 6650.0,
      |   "deploy_ondemand": true, "deploy_preemptible": false,
      |   "locations": ["ewr"]}
      |]}""".stripMargin

  /** Regions (`/v2/regions` shape): the `options` array gates which
    * block-storage products each region sells. */
  private[ingest] val regionsPayload: String =
    """{"regions": [
      |  {"id": "ams", "city": "Amsterdam", "country": "NL",
      |   "options": ["block_storage_high_perf", "block_storage_storage_opt"]},
      |  {"id": "ewr", "city": "New Jersey", "country": "US",
      |   "options": ["block_storage_high_perf"]},
      |  {"id": "sgp", "city": "Singapore", "country": "SG", "options": []}
      |]}""".stripMargin

  /** Static location metadata (`_REGION_LOCATIONS`, `_vultr.py:18-106`). */
  private[ingest] val regionMeta: Seq[(String, String, Double, Double)] = Seq(
    ("ams", null, 4.9041, 52.3676),
    ("ewr", "New Jersey", -74.1724, 40.7357),
    ("sgp", null, 103.8198, 1.3521))

  /** Plan-type → family display name (`_PLAN_TYPES`, `_vultr.py:109-126`). */
  private[ingest] val planTypes: Seq[(String, String)] = Seq(
    ("vc2", "Cloud Compute"), ("vhf", "High Frequency Compute"),
    ("vhp", "High Performance"), ("voc", "Optimized Cloud Compute"),
    ("vcg", "Cloud GPU"), ("vdm", "Dedicated Metal GPU"),
    ("vdc", "Dedicated Cloud"), ("SSD", "Bare Metal SSD"),
    ("NVMe", "Bare Metal NVMe"))

  /** disk_type/plan-type → storage type (`_DISK_TYPES`, `_vultr.py:137-148`). */
  private[ingest] val diskTypes: Seq[(String, String)] = Seq(
    ("SSD", "ssd"), ("HIGHFREQUENCY", "nvme_ssd"), ("AMDHIGHPERF", "nvme_ssd"),
    ("INTELHIGHPERF", "nvme_ssd"), ("DEDICATEDOPTIMIZED", "nvme_ssd"),
    ("CLOUDGPU", "nvme_ssd"), ("DEDICATEDMETAL", "nvme_ssd"),
    ("VX", "network"), ("NVMe", "nvme_ssd"))

  /** gpu_type → (per-GPU VRAM GiB, architecture family)
    * (`_GPU_TYPES`, `_vultr.py:151-164`). */
  private[ingest] val gpuTypes: Seq[(String, Int, String)] = Seq(
    ("NVIDIA_A16", 16, "Ampere"), ("NVIDIA_A40", 48, "Ampere"),
    ("NVIDIA_L40S", 48, "Ada Lovelace"), ("NVIDIA_A100", 40, "Ampere"),
    ("NVIDIA_H100", 80, "Hopper"), ("NVIDIA_GH200", 96, "Grace Hopper"),
    ("AMD_MI300X", 192, "CDNA3"))

  /** Metal GPU plans whose API rows omit GPU fields — manual fallback
    * (`_DEDICATED_METAL_GPU_PLANS`, `_vultr.py:168-198`). */
  private[ingest] val metalGpuFallback: Seq[(String, String, Int, Int)] = Seq(
    ("vdm-mi300x-96c-1536gb-1536vram", "AMD_MI300X", 8, 1536))

  /** Block-storage catalog with static prices gated by region options
    * (`_BLOCK_STORAGE`, `_vultr.py:202-225`). */
  private[ingest] val blockStorage: Seq[(String, String, String, Long, Long, Long, Long, Double)] =
    Seq(
      ("block_storage_high_perf", "NVMe Block Storage", "nvme_ssd",
        10L, 10000L, 10000L, 400L, 0.10),
      ("block_storage_storage_opt", "HDD Block Storage", "hdd",
        40L, 40000L, 500L, 100L, 0.025))

  // ----------------------------------------------------------- raw parses

  private val overrideStruct = new StructType()
    .add("hourly_cost", DoubleType).add("monthly_cost", DoubleType)
    .add("hourly_cost_preemptible", DoubleType)
    .add("monthly_cost_preemptible", DoubleType)
  private val planSchema = ArrayType(new StructType()
    .add("id", StringType).add("type", StringType)
    .add("vcpu_count", IntegerType)
    .add("cpu_count", IntegerType).add("cpu_threads", IntegerType)
    .add("cpu_model", StringType).add("cpu_mhz", IntegerType)
    .add("cpu_vendor", StringType)
    .add("ram", LongType).add("disk", LongType).add("disk_count", IntegerType)
    .add("disk_type", StringType).add("bandwidth", LongType)
    .add("gpu_brand", StringType).add("gpu_type", StringType)
    .add("gpu_vram_gb", IntegerType).add("gpu_count", StringType)
    .add("hourly_cost", DoubleType).add("monthly_cost", DoubleType)
    .add("deploy_ondemand", BooleanType).add("deploy_preemptible", BooleanType)
    .add("hourly_cost_preemptible", DoubleType)
    .add("monthly_cost_preemptible", DoubleType)
    .add("locations", ArrayType(StringType))
    .add("location_cost", MapType(StringType, overrideStruct)))

  /** Both plan endpoints parsed with ONE schema and unioned — the field
    * conventions differ (vcpu_count vs cpu_count/cpu_threads), the
    * record shape doesn't (`plans + plans_metal`, `_vultr.py:396`). */
  private[ingest] def planRows(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val virt = Seq(plansPayload).toDF("payload")
      .select(explode(from_json(col("payload"),
        new StructType().add("plans", planSchema)).getField("plans")).as("p"))
    val metal = Seq(plansMetalPayload).toDF("payload")
      .select(explode(from_json(col("payload"),
        new StructType().add("plans_metal", planSchema)).getField("plans_metal")).as("p"))
    virt.unionByName(metal).select(col("p.*"))
  }

  private def regionRows(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val schema = new StructType().add("regions", ArrayType(new StructType()
      .add("id", StringType).add("city", StringType)
      .add("country", StringType).add("options", ArrayType(StringType))))
    Seq(regionsPayload).toDF("payload")
      .select(explode(from_json(col("payload"), schema).getField("regions")).as("r"))
      .select(col("r.id").as("region_id"), col("r.city").as("city"),
        col("r.country").as("country_id"), col("r.options").as("options"))
  }

  /** `"1/2"` → 0.5, `"2"` → 2.0, null/garbage → null (`_vultr.py:445-450`). */
  private def parseGpuCount(c: Column): Column =
    when(c.contains("/"),
      round(element_at(split(c, "/"), 1).cast("double") /
        element_at(split(c, "/"), 2).cast("double"), 4))
      .otherwise(c.cast("double"))

  /** Iterative brand-prefix strip (`_standardize_cpu_model`,
    * `_vultr.py:228-245`): the `+` quantifier replays the reference's
    * strip-until-stable loop in one anchored regex. */
  private[ingest] def stdCpuModel(c: Column): Column =
    nullif(trim(regexp_replace(c,
      "^(?:(?:EPYC|Grace|Platinum|Gold)\\s+|E3-|E-)+", "")), lit(""))

  /** Substring family classification (`_extract_cpu_family`,
    * `_vultr.py:247-261`). */
  private[ingest] def cpuFamily(c: Column): Column = {
    val nl = lower(c)
    when(nl.contains("epyc") || nl.contains("turin") || nl.contains("genoa"), "EPYC")
      .when(nl.contains("grace") || nl.contains("neoverse"), "Grace")
      .when(nl.startsWith("e-") || nl.startsWith("e3-") ||
        nl.startsWith("gold ") || nl.startsWith("platinum "), "Xeon")
  }

  // ---------------------------------------------------------- inventories

  def inventoryComplianceFrameworks(spark: SparkSession): DataFrame =
    SeedTables.complianceFrameworks(spark)

  def inventoryCountries(spark: SparkSession): DataFrame =
    SeedTables.countries(spark)

  def inventoryRegions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val meta = broadcast(regionMeta.toDF("region_id", "state", "lon", "lat"))
    withVendor(regionRows(spark).join(meta, Seq("region_id"))
      .select(col("region_id"), col("city").as("name"),
        col("region_id").as("api_reference"),
        concat(col("city"), lit(" ("), col("country_id"), lit(")")).as("display_name"),
        array().cast("array<string>").as("aliases"),
        col("country_id"), col("state"), col("city"), col("lon"), col("lat")))
  }

  /** 1-1 dummy zones (`_vultr.py:369-390`). */
  def inventoryZones(spark: SparkSession): DataFrame =
    withVendor(regionRows(spark)
      .select(col("region_id"), col("region_id").as("zone_id"),
        col("city").as("name"), col("city").as("api_reference"),
        col("city").as("display_name")))

  def inventoryServers(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val families = broadcast(planTypes.toDF("type", "family"))
    val disks = broadcast(diskTypes.toDF("disk_key", "storage_type"))
    val profiles = broadcast(gpuTypes.toDF("eff_gpu_type", "vram_gb", "rule_gpu_family"))
    val fallback = broadcast(metalGpuFallback.toDF(
      "id", "fb_gpu_type", "fb_gpu_count", "fb_vram_total"))
    val base = planRows(spark)
      .join(families, Seq("type"), "left")
      .join(fallback, Seq("id"), "left")
      // fallback fills type/total/count only where the API omitted them
      .withColumn("eff_gpu_type", coalesce(col("gpu_type"), col("fb_gpu_type")))
      .withColumn("vram_total",
        coalesce(nullif(col("gpu_vram_gb"), lit(0)), col("fb_vram_total"), lit(0)))
      .withColumn("api_count",
        coalesce(parseGpuCount(col("gpu_count")), col("fb_gpu_count").cast("double")))
      .join(profiles, Seq("eff_gpu_type"), "left")
      .withColumn("gpu_count_eff", coalesce(col("api_count"),
        when(col("vram_gb").isNotNull && col("vram_total") > 0,
          round(col("vram_total") / col("vram_gb"), 4)), lit(0.0)))
      .withColumn("disk_key", coalesce(col("disk_type"), col("type")))
      .join(disks, Seq("disk_key"), "left")
    withVendor(base.select(
      col("id").as("server_id"), col("id").as("name"),
      col("id").as("api_reference"), col("id").as("display_name"),
      col("family"),
      coalesce(col("vcpu_count"), col("cpu_threads")).as("vcpus"),
      col("cpu_count").as("cpu_cores"),
      // which field exists decides the allocation (`_vultr.py:407-411`)
      when(col("vcpu_count").isNotNull, "shared").otherwise("dedicated")
        .as("cpu_allocation"),
      (col("cpu_mhz") / 1000.0).as("cpu_speed"),
      when(cpuFamily(col("cpu_model")) === "Grace", "arm64").otherwise("x86_64")
        .as("cpu_architecture"),
      col("cpu_vendor").as("cpu_manufacturer"),
      cpuFamily(col("cpu_model")).as("cpu_family"),
      stdCpuModel(col("cpu_model")).as("cpu_model"),
      col("ram").as("memory_amount"),
      col("gpu_count_eff").as("gpu_count"),
      // fractional offerings expose less than one card (`_vultr.py:440-444`)
      when(col("vram_gb").isNotNull && col("vram_total") > 0,
        least(col("vram_gb"), col("vram_total")).cast("long") * 1024)
        .otherwise(0L).as("gpu_memory_min"),
      (col("vram_total").cast("long") * 1024).as("gpu_memory_total"),
      when(col("eff_gpu_type").isNotNull,
        coalesce(nullif(col("gpu_brand"), lit("")),
          element_at(split(col("eff_gpu_type"), "_"), 1))).as("gpu_manufacturer"),
      col("rule_gpu_family").as("gpu_family"),
      when(col("eff_gpu_type").isNotNull,
        when(size(split(col("eff_gpu_type"), "_")) > 1,
          element_at(split(col("eff_gpu_type"), "_"), 2))
          .otherwise(col("eff_gpu_type"))).as("gpu_model"),
      (col("disk") * coalesce(col("disk_count"), lit(1))).as("storage_size"),
      col("storage_type"),
      lit(0L).as("inbound_traffic"),
      col("bandwidth").cast("double").as("outbound_traffic"),
      // the smallest plan is IPv6-only (`_vultr.py:536`)
      when(col("id") === "vc2-1c-0.5gb-v6", 0).otherwise(1).as("ipv4"),
      // limited free plan not generally available (`_vultr.py:540-543`)
      when(col("id") === "vc2-1c-0.5gb-free", "inactive").otherwise("active")
        .as("status")))
  }

  /** Location fan-out with field-level override precedence and the
    * derived monthly cap; zero-price plans get EMPTY tier chains
    * (`_vultr.py:546-584`). */
  private def pricesFor(spark: SparkSession, spot: Boolean): DataFrame = {
    val (deployCol, hCol, mCol) =
      if (spot) ("deploy_preemptible", "hourly_cost_preemptible", "monthly_cost_preemptible")
      else ("deploy_ondemand", "hourly_cost", "monthly_cost")
    val fanned = planRows(spark)
      .filter(col(deployCol))
      .select(col("id").as("server_id"), col(hCol).as("base_h"),
        col(mCol).as("base_m"), col("location_cost"),
        explode(col("locations")).as("region_id"))
      .withColumn("ov", element_at(col("location_cost"), col("region_id")))
      // field-level precedence: a partial override struct falls back
      .withColumn("h", coalesce(col("ov").getField(hCol), col("base_h")))
      .withColumn("m", coalesce(col("ov").getField(mCol), col("base_m")))
      .withColumn("cap", when(col("h") > 0, floor(col("m") / col("h")).cast("double")))
    withVendor(fanned.select(
      col("region_id"), col("region_id").as("zone_id"), col("server_id"),
      lit("Linux").as("operating_system"),
      lit(if (spot) "spot" else "ondemand").as("allocation"),
      lit("hour").as("unit"), col("h").as("price"),
      lit(0.0).as("price_upfront"),
      when(col("h") > 0, array(
        struct(lit(0.0).as("lower"), col("cap").as("upper"), col("h").as("price")),
        struct((col("cap") + 1).as("lower"),
          lit(Double.PositiveInfinity).as("upper"), lit(0.0).as("price"))))
        .otherwise(array().cast("array<struct<lower:double,upper:double,price:double>>"))
        .as("price_tiered"),
      lit("USD").as("currency")))
  }

  def inventoryServerPrices(spark: SparkSession): DataFrame =
    pricesFor(spark, spot = false)

  def inventoryServerPricesSpot(spark: SparkSession): DataFrame =
    pricesFor(spark, spot = true)

  def inventoryStorages(spark: SparkSession): DataFrame = {
    import spark.implicits._
    withVendor(blockStorage
      .toDF("storage_id", "name", "storage_type", "min_size", "max_size",
        "max_iops", "max_throughput", "price_gb_month")
      .drop("price_gb_month"))
  }

  /** Statically-priced storage gated by each region's `options` array
    * (`_vultr.py:649-668`). */
  def inventoryStoragePrices(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val catalog = broadcast(blockStorage
      .toDF("storage_id", "name", "storage_type", "min_size", "max_size",
        "max_iops", "max_throughput", "price_gb_month")
      .select("storage_id", "price_gb_month"))
    withVendor(regionRows(spark)
      .select(col("region_id"), explode(col("options")).as("storage_id"))
      .join(catalog, Seq("storage_id"))
      .select(col("region_id"), col("storage_id"),
        lit("gb_month").as("unit"), col("price_gb_month").as("price"),
        lit("USD").as("currency")))
  }

  def inventoryDatabases(spark: SparkSession): DataFrame =
    VendorInventory.empty(spark, "database")

  def inventoryDatabasePrices(spark: SparkSession): DataFrame =
    VendorInventory.empty(spark, "database_price")

  /** Flat worldwide rates: ingress free, egress overage per GB
    * (`_vultr.py:670-703`). */
  def inventoryTrafficPrices(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val directions = Seq(("in", 0.0), ("out", 0.01)).toDF("direction", "price")
    withVendor(regionRows(spark).select(col("region_id")).crossJoin(directions)
      .select(col("region_id"), col("direction"), col("price"),
        array().cast("array<struct<lower:double,upper:double,price:double>>")
          .as("price_tiered"),
        lit("gb_month").as("unit"), lit("USD").as("currency")))
  }

  /** Flat reserved-IPv4 price (`_vultr.py:706-729`). */
  def inventoryIpv4Prices(spark: SparkSession): DataFrame =
    withVendor(regionRows(spark)
      .select(col("region_id"), lit(3.0).as("price"),
        lit("month").as("unit"), lit("USD").as("currency")))

  def inventoryBenchmarkScores(spark: SparkSession): DataFrame =
    VendorInventory.empty(spark, "benchmark_score")

  override def inventoryVendors(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((vendorId, "Override Cloud", "US", 2014))
      .toDF("vendor_id", "name", "country_id", "founding_year")
  }
}

object OverrideVendor {
  private def esc(s: String) = s.replace("'", "''")
  private def optD(d: Option[Double]) = d.map(_.toString).getOrElse("NULL")
  private def optS(s: Option[String]) = s.map(v => s"'${esc(v)}'").getOrElse("NULL")
  private def optI(i: Option[Int]) = i.map(_.toString).getOrElse("NULL")

  /** Raw plan fields as VALUES — (plan_id, ptype, vcpu_count, cpu_count,
    * cpu_threads, cpu_model, cpu_mhz, ram_mb, disk, disk_count,
    * disk_type, gpu_brand, gpu_type, gpu_vram_gb, gpu_count_str,
    * hourly, monthly, deploy_od, deploy_spot, spot_hourly, spot_monthly).
    * Self-checking duplication against the JSON payloads: drift turns
    * the gate rows red. */
  def planValuesSql: String = Seq(
    ("vc2-2c-4gb", "vc2", Some(2), None, None, None, None, 4096L, 80L, 1,
      Some("SSD"), None, None, None, None, 0.018, 12.0, 1, 0, None, None),
    ("vhf-4c-16gb", "vhf", Some(4), None, None, None, None, 16384L, 384L, 1,
      Some("HIGHFREQUENCY"), None, None, None, None, 0.048, 32.0, 1, 1,
      Some(0.019), Some(13.0)),
    ("vcg-a16-2c-8g-2vram", "vcg", Some(2), None, None, None, None, 8192L, 50L, 1,
      Some("CLOUDGPU"), Some("NVIDIA"), Some("NVIDIA_A16"), Some(2), None,
      0.059, 40.0, 1, 0, None, None),
    ("vcg-l40s-12c-100g-24vram", "vcg", Some(12), None, None, None, None,
      102400L, 1050L, 1, Some("CLOUDGPU"), Some("NVIDIA"), Some("NVIDIA_L40S"),
      Some(24), Some("1/2"), 0.259, 175.0, 1, 0, None, None),
    ("vc2-1c-0.5gb-v6", "vc2", Some(1), None, None, None, None, 512L, 10L, 1,
      Some("SSD"), None, None, None, None, 0.0035, 2.5, 1, 0, None, None),
    ("vc2-1c-0.5gb-free", "vc2", Some(1), None, None, None, None, 512L, 10L, 1,
      Some("SSD"), None, None, None, None, 0.0, 0.0, 1, 0, None, None),
    ("vbm-24c-256gb", "NVMe", None, Some(24), Some(48), Some("Gold 6448H"),
      Some(2400), 262144L, 960L, 2, None, None, None, None, None,
      2.397, 1610.0, 1, 0, None, None),
    ("vdm-mi300x-96c-1536gb-1536vram", "vdm", None, Some(96), Some(192),
      Some("EPYC 9334"), Some(2700), 1572864L, 3840L, 8, Some("DEDICATEDMETAL"),
      None, None, None, None, 9.9, 6650.0, 1, 0, None, None))
    .map { case (id, t, vcpu, cores, thr, model, mhz, ram, disk, dc, dt,
                 brand, gt, vram, cnt, h, m, od, sp, sh, sm) =>
      s"('${esc(id)}', '${esc(t)}', ${optI(vcpu)}, ${optI(cores)}, ${optI(thr)}, " +
        s"${optS(model)}, ${optI(mhz)}, $ram, $disk, $dc, ${optS(dt)}, " +
        s"${optS(brand)}, ${optS(gt)}, ${optI(vram)}, ${optS(cnt)}, " +
        s"$h, $m, $od, $sp, ${optD(sh)}, ${optD(sm)})"
    }.mkString(", ")

  /** (plan_id, region_id) location links as VALUES. */
  def locationValuesSql: String = Seq(
    ("vc2-2c-4gb", "ams"), ("vc2-2c-4gb", "ewr"), ("vc2-2c-4gb", "sgp"),
    ("vhf-4c-16gb", "ams"), ("vhf-4c-16gb", "ewr"),
    ("vcg-a16-2c-8g-2vram", "ewr"),
    ("vcg-l40s-12c-100g-24vram", "ams"), ("vcg-l40s-12c-100g-24vram", "ewr"),
    ("vc2-1c-0.5gb-v6", "sgp"), ("vc2-1c-0.5gb-free", "ams"),
    ("vbm-24c-256gb", "ewr"), ("vdm-mi300x-96c-1536gb-1536vram", "ewr"))
    .map { case (p, r) => s"('${esc(p)}', '${esc(r)}')" }.mkString(", ")

  /** Sparse per-location overrides as VALUES — (plan_id, region_id,
    * od_hourly, od_monthly, spot_hourly, spot_monthly); NULL = the field
    * is absent and the base price must win. */
  def overrideValuesSql: String = Seq(
    ("vc2-2c-4gb", "sgp", Some(0.024), Some(16.0), None, None),
    ("vhf-4c-16gb", "ewr", None, None, Some(0.017), Some(11.5)))
    .map { case (p, r, oh, om, sh, sm) =>
      s"('${esc(p)}', '${esc(r)}', ${optD(oh)}, ${optD(om)}, ${optD(sh)}, ${optD(sm)})"
    }.mkString(", ")

  /** gpu_type profile rows as VALUES — (gpu_type, vram_gb, family). */
  def gpuTypeValuesSql: String =
    new OverrideVendor().gpuTypes
      .map { case (t, v, f) => s"('${esc(t)}', $v, '${esc(f)}')" }.mkString(", ")

  /** Metal GPU fallback rows as VALUES — (plan_id, gpu_type, count, vram_total). */
  def fallbackValuesSql: String =
    new OverrideVendor().metalGpuFallback
      .map { case (p, t, c, v) => s"('${esc(p)}', '${esc(t)}', $c, $v)" }
      .mkString(", ")

  /** Plan-type families as VALUES. */
  def planTypeValuesSql: String =
    new OverrideVendor().planTypes
      .map { case (t, f) => s"('${esc(t)}', '${esc(f)}')" }.mkString(", ")

  /** Disk-type map as VALUES. */
  def diskTypeValuesSql: String =
    new OverrideVendor().diskTypes
      .map { case (k, v) => s"('${esc(k)}', '${esc(v)}')" }.mkString(", ")
}
