package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fifth concrete [[VendorInventory]]: a vendor whose price API returns one
  * object PER ZONE with DYNAMIC ATTRIBUTE KEYS — the record identity lives
  * in the JSON *key name* (`server_plan_<PLAN>`, `storage_<ID>`,
  * `ipv4_address`), not in a value field. This is the shape of the
  * reference's UpCloud module (`vendors/_upcloud.py:446-604`) and the one
  * P2 projection variant the other four adapters don't cover. Distinct
  * ingest traits exercised here:
  *
  *  - **key-as-data pivot**: the per-zone price object is unpivoted with
  *    `json_object_keys` + a dynamic-path `get_json_object` — pure builtin
  *    expressions, no UDF. Each key row then routes by prefix to the
  *    server/storage/traffic/ipv4 price tables;
  *  - **separate storage-billing catalog**: storage price keys only count
  *    when their id appears in the vendor's static storage catalog
  *    (`_upcloud.py:541-558` checks `k in ["storage_" + s["id"]]`), and the
  *    hourly cent quote converts to gb_month via ×24×30;
  *  - **structured plan names**: vcpus/memory/GPU/family parse out of the
  *    plan id itself (`_parse_server_name`, `_upcloud.py:94-139`) with one
  *    regex + a broadcast family-name lookup;
  *  - **GPU availability gating**: GPU plan prices appear in every zone's
  *    price list but are only real where the device-availability endpoint
  *    reports amount > 0 (`_upcloud.py:457-461`);
  *  - **constant monthly cap**: hourly billing stops at 672 hours/month
  *    (`_upcloud.py:474-481`) — the cap is billing POLICY (a constant
  *    tier bound), unlike [[CapVendor]]'s cap derived from price ratios;
  *  - **cent-denominated prices**: every quote divides by 100 at ingest.
  *
  * Scale note: the key pivot re-parses each zone's JSON text per extracted
  * key. Price lists are control-plane data (dozens of zones × hundreds of
  * keys), so this is noise here; for a data-plane payload with dynamic
  * keys, hoist the text into a single `from_json(Map
  * keys explosion)` prepass instead.
  */
class ZonalVendor extends VendorInventory {
  val vendorId = "zonal"

  private def withVendor(df: DataFrame): DataFrame =
    df.withColumn("vendor_id", lit(vendorId))

  // ------------------------------------------------------------- payloads

  /** Zone listing (`get_zones()` shape): public zones carry inventory; the
    * non-public lab zone must be excluded everywhere. */
  private[ingest] val zonesPayload: String =
    """{"zones": {"zone": [
      |  {"id": "de-fra1", "description": "Frankfurt #1", "public": "yes"},
      |  {"id": "us-chi1", "description": "Chicago #1", "public": "yes"},
      |  {"id": "fi-hel2", "description": "Helsinki #2", "public": "yes"},
      |  {"id": "dev-lab", "description": "Internal lab", "public": "no"}
      |]}}""".stripMargin

  /** Server plan catalog (`get_server_plans()` shape): memory already in
    * MB; storage_tier null for the diskless cloud-native plan; one SPOT
    * plan that the server inventory must skip. */
  private[ingest] val plansPayload: String =
    """{"plans": {"plan": [
      |  {"name": "1xCPU-2GB", "core_number": 1, "memory_amount": 2048,
      |   "storage_size": 50, "storage_tier": "maxiops", "public_traffic_out": 2048,
      |   "gpu_amount": 0, "gpu_model": null},
      |  {"name": "HICPU-8xCPU-12GB", "core_number": 8, "memory_amount": 12288,
      |   "storage_size": 100, "storage_tier": "maxiops", "public_traffic_out": 4096,
      |   "gpu_amount": 0, "gpu_model": null},
      |  {"name": "HIMEM-4xCPU-32GB", "core_number": 4, "memory_amount": 32768,
      |   "storage_size": 100, "storage_tier": "maxiops", "public_traffic_out": 4096,
      |   "gpu_amount": 0, "gpu_model": null},
      |  {"name": "GPU-8xCPU-64GB-1xL40S", "core_number": 8, "memory_amount": 65536,
      |   "storage_size": 200, "storage_tier": "maxiops", "public_traffic_out": 8192,
      |   "gpu_amount": 1, "gpu_model": "NVIDIA L40S"},
      |  {"name": "DEV-2xCPU-4GB-10GB", "core_number": 2, "memory_amount": 4096,
      |   "storage_size": 10, "storage_tier": "standard", "public_traffic_out": 1024,
      |   "gpu_amount": 0, "gpu_model": null},
      |  {"name": "CLOUDNATIVE-2xCPU-4GB", "core_number": 2, "memory_amount": 4096,
      |   "storage_size": 0, "storage_tier": null, "public_traffic_out": 2048,
      |   "gpu_amount": 0, "gpu_model": null},
      |  {"name": "DEV-SPOT-2xCPU-4GB", "core_number": 2, "memory_amount": 4096,
      |   "storage_size": 50, "storage_tier": "maxiops", "public_traffic_out": 1024,
      |   "gpu_amount": 0, "gpu_model": null}
      |]}}""".stripMargin

  /** Per-zone price list (`get_prices()` shape) — DYNAMIC keys. Quotes are
    * cents per hour. us-chi1 lists the GPU plan (gated out: no devices)
    * and a spot GPU plan (gated out: availability is keyed by the full
    * name, which never matches); de-fra1 lists an unknown `storage_backup`
    * key that the storage catalog filter must drop. */
  private[ingest] val pricesPayload: String =
    """{"prices": {"zone": [
      |  {"name": "de-fra1",
      |   "server_plan_1xCPU-2GB": {"amount": 1, "price": 1.488},
      |   "server_plan_HICPU-8xCPU-12GB": {"amount": 1, "price": 8.93},
      |   "server_plan_GPU-8xCPU-64GB-1xL40S": {"amount": 1, "price": 290.0},
      |   "server_plan_SPOT-2xCPU-4GB": {"amount": 1, "price": 0.893},
      |   "storage_maxiops": {"amount": 1, "price": 0.031},
      |   "storage_hdd": {"amount": 1, "price": 0.0078},
      |   "storage_backup": {"amount": 1, "price": 0.009},
      |   "public_ipv4_bandwidth_out": {"amount": 1, "price": 0.0007},
      |   "ipv4_address": {"amount": 1, "price": 0.7}},
      |  {"name": "us-chi1",
      |   "server_plan_1xCPU-2GB": {"amount": 1, "price": 1.61},
      |   "server_plan_HIMEM-4xCPU-32GB": {"amount": 1, "price": 26.0},
      |   "server_plan_GPU-8xCPU-64GB-1xL40S": {"amount": 1, "price": 290.0},
      |   "server_plan_GPU-SPOT-8xCPU-64GB-1xL40S": {"amount": 1, "price": 100.0},
      |   "storage_maxiops": {"amount": 1, "price": 0.034},
      |   "storage_standard": {"amount": 1, "price": 0.014},
      |   "ipv4_address": {"amount": 1, "price": 0.76}},
      |  {"name": "fi-hel2",
      |   "server_plan_1xCPU-2GB": {"amount": 1, "price": 1.488},
      |   "server_plan_DEV-2xCPU-4GB-10GB": {"amount": 1, "price": 0.45},
      |   "server_plan_CLOUDNATIVE-2xCPU-4GB": {"amount": 1, "price": 1.0},
      |   "storage_hdd": {"amount": 1, "price": 0.0066},
      |   "public_ipv4_bandwidth_out": {"amount": 1, "price": 0.0005},
      |   "ipv4_address": {"amount": 1, "price": 0.7}}
      |]}}""".stripMargin

  /** Manual region metadata (the reference hard-codes this per zone id and
    * RAISES when a public zone is missing — `_upcloud.py:190-364`). */
  private[ingest] val regionMeta: Seq[(String, String, String, Double, Double, Int, Boolean)] =
    Seq(
      ("de-fra1", "DE", "Frankfurt", 8.6821, 50.1109, 2017, true),
      ("us-chi1", "US", "Chicago", -87.6298, 41.8781, 2014, false),
      ("fi-hel2", "FI", "Helsinki", 24.9384, 60.1699, 2015, true))

  /** Device-availability endpoint (`_upcloud.py:42-53`): GPU plans exist
    * only where amount > 0; keyed by the ondemand plan name, so spot GPU
    * keys never match and are always gated out. */
  private[ingest] val gpuAvailability: Seq[(String, String, Int)] = Seq(
    ("de-fra1", "GPU-8xCPU-64GB-1xL40S", 2),
    ("us-chi1", "GPU-8xCPU-64GB-1xL40S", 0))

  /** Static storage-billing catalog (`UPCLOUD_STORAGES`,
    * `_upcloud.py:61-90`): the separate catalog that storage price keys
    * must resolve against. */
  private[ingest] val storageCatalog: Seq[(String, String, String, String, Long, Long, Long)] =
    Seq(
      ("hdd", "Archive", "High-capacity data storage", "hdd", 600L, 1L, 4096L),
      ("standard", "Standard", "General purpose data storage", "ssd", 10000L, 1L, 4096L),
      ("maxiops", "MaxIOPS", "High-performance web servers and applications", "ssd", 100000L, 1L, 4096L))

  /** model → (memory MiB, family): the reference's GPU metadata tables
    * (`_upcloud.py:128-141`). */
  private[ingest] val gpuModels: Seq[(String, Long, String)] = Seq(
    ("L4", 24L * 1024, "Ada Lovelace"), ("L40S", 48L * 1024, "Ada Lovelace"),
    ("H100", 80L * 1024, "Hopper"), ("B200", 192L * 1024, "Blackwell"))

  /** Family-prefix display names (`_parse_server_name`'s mapping). */
  private[ingest] val familyNames: Seq[(String, String)] = Seq(
    ("", "General Purpose"), ("DEV", "Developer"), ("HICPU", "High CPU"),
    ("HIMEM", "High Memory"), ("GPU", "GPU"), ("STARTER", "Starter"),
    ("CLOUDNATIVE", "Cloud Native"), ("PREMIUM", "Premium"))

  // ----------------------------------------------------------- raw parses

  private val zonesSchema = new StructType()
    .add("zones", new StructType().add("zone", ArrayType(new StructType()
      .add("id", StringType).add("description", StringType).add("public", StringType))))

  private val plansSchema = new StructType()
    .add("plans", new StructType().add("plan", ArrayType(new StructType()
      .add("name", StringType).add("core_number", IntegerType)
      .add("memory_amount", LongType).add("storage_size", LongType)
      .add("storage_tier", StringType).add("public_traffic_out", LongType)
      .add("gpu_amount", IntegerType).add("gpu_model", StringType))))

  private def zoneRows(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(zonesPayload).toDF("payload")
      .select(explode(from_json(col("payload"), zonesSchema)
        .getField("zones").getField("zone")).as("z"))
      .select(col("z.id").as("region_id"), col("z.description").as("name"),
        (col("z.public") === "yes").as("is_public"))
  }

  private def planRows(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(plansPayload).toDF("payload")
      .select(explode(from_json(col("payload"), plansSchema)
        .getField("plans").getField("plan")).as("p"))
  }

  /** The key-as-data pivot: one row per (zone, dynamic key) with the cent
    * quote. `json_object_keys` enumerates whatever keys the vendor ships
    * today; nothing in the plan hard-codes the key set. */
  private[ingest] def priceKeyRows(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val pages = Seq(pricesPayload).toDF("payload")
    val zoneArr = get_json_object(col("payload"), "$.prices.zone")
    val zoneTexts = pages
      .select(col("payload"),
        explode(sequence(lit(0), json_array_length(zoneArr) - 1)).as("i"))
      // the functions-API get_json_object only takes literal paths; the
      // underlying expression accepts any path, so build it in SQL
      .select(expr("get_json_object(payload, concat('$.prices.zone[', i, ']'))").as("zj"))
    zoneTexts
      .select(col("zj"), explode(json_object_keys(col("zj"))).as("k"))
      .filter(col("k") =!= "name")
      .select(
        get_json_object(col("zj"), "$.name").as("region_id"),
        col("k").as("key"),
        expr("get_json_object(zj, concat('$[\\'', k, '\\'].price'))")
          .cast("double").as("cents"))
  }

  /** `_parse_server_name`'s regex, verbatim semantics: optional family,
    * optional SPOT marker, vcpus, memory GB, optional GPU spec, optional
    * storage-size suffix. */
  private val nameRe =
    "^(?:([A-Z]+)-)?(?:(SPOT)-)?([0-9]+)xCPU-([0-9]+)GB(?:-([0-9]+)x([A-Z][A-Z0-9]*))?(?:-([0-9]+)GB)?$"

  private def parsedName(name: org.apache.spark.sql.Column) = struct(
    regexp_extract(name, nameRe, 1).as("family_raw"),
    (regexp_extract(name, nameRe, 2) === "SPOT").as("is_spot"),
    regexp_extract(name, nameRe, 3).cast("int").as("vcpus"),
    regexp_extract(name, nameRe, 4).cast("int").as("memory_gb"),
    nullif(regexp_extract(name, nameRe, 5), lit("")).cast("int").as("gpu_count"),
    nullif(regexp_extract(name, nameRe, 6), lit("")).as("gpu_model_short"))

  // ---------------------------------------------------------- inventories

  def inventoryComplianceFrameworks(spark: SparkSession): DataFrame =
    SeedTables.complianceFrameworks(spark)

  def inventoryCountries(spark: SparkSession): DataFrame =
    SeedTables.countries(spark)

  /** Public zones joined to the manual metadata table; a public zone with
    * no metadata row is a CRAWL BUG, not a row to drop — fail loudly like
    * the reference's `raise ValueError` (`_upcloud.py:338-340`). */
  def inventoryRegions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val meta = broadcast(regionMeta.toDF(
      "region_id", "country_id", "city", "lon", "lat", "founding_year", "green_energy"))
    val pub = zoneRows(spark).filter(col("is_public")).drop("is_public")
    val joined = pub.join(meta, Seq("region_id"), "left")
    val missing = joined.filter(col("country_id").isNull)
      .select("region_id").collect().map(_.getString(0))
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"missing manual region metadata for public zones: ${missing.mkString(",")}")
    withVendor(joined
      .withColumn("api_reference", col("region_id"))
      .withColumn("display_name", concat(col("name"), lit(" ("), col("country_id"), lit(")")))
      .withColumn("aliases", array().cast("array<string>")))
  }

  /** No real zones: 1-1 dummy zones mirroring regions (`_upcloud.py:366-386`). */
  def inventoryZones(spark: SparkSession): DataFrame =
    withVendor(zoneRows(spark).filter(col("is_public"))
      .select(col("region_id"), col("region_id").as("zone_id"),
        col("name"), col("region_id").as("api_reference"), col("name").as("display_name")))

  def inventoryServers(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val fam = broadcast(familyNames.toDF("family_raw", "family"))
    val gpus = broadcast(gpuModels.toDF("gpu_model_short", "gpu_memory_min", "gpu_family"))
    val base = planRows(spark)
      .withColumn("n", parsedName(col("p.name")))
      .filter(!col("n.is_spot")) // spot plans are a price variant, not servers
      .withColumn("family_raw", coalesce(col("n.family_raw"), lit("")))
    withVendor(base.join(fam, Seq("family_raw"), "left")
      .join(gpus,
        // plan-catalog gpu_model arrives as "NVIDIA L40S"; standardize by
        // stripping the manufacturer prefix before the metadata lookup
        trim(regexp_replace(col("p.gpu_model"), "^NVIDIA\\s+", "")) === gpus("gpu_model_short"),
        "left")
      .select(
        col("p.name").as("server_id"), col("p.name").as("name"),
        col("p.name").as("api_reference"), col("p.name").as("display_name"),
        concat(col("family"), lit(" ("), col("n.vcpus"), lit(" vCPUs, "),
          col("n.memory_gb"), lit(" GiB RAM"),
          when(col("n.gpu_count").isNotNull,
            concat(lit(", "), col("n.gpu_count"), lit("x "), col("n.gpu_model_short")))
            .otherwise(lit("")), lit(")")).as("description"),
        col("family"),
        col("p.core_number").as("vcpus"),
        lit("KVM").as("hypervisor"),
        lit("shared").as("cpu_allocation"), // no dedicated vCPUs in the public offerings
        lit("x86_64").as("cpu_architecture"),
        col("p.memory_amount").as("memory_amount"),
        coalesce(col("p.gpu_amount"), lit(0)).as("gpu_count"),
        col("gpu_memory_min"),
        (col("gpu_memory_min") * col("p.gpu_amount")).as("gpu_memory_total"),
        when(col("p.gpu_model").startsWith("NVIDIA"), "NVIDIA").as("gpu_manufacturer"),
        col("gpu_family"),
        trim(regexp_replace(col("p.gpu_model"), "^NVIDIA\\s+", "")).as("gpu_model"),
        col("p.storage_size").as("storage_size"),
        when(col("p.storage_tier").isNotNull, "ssd").as("storage_type"),
        lit(0L).as("inbound_traffic"),
        col("p.public_traffic_out").as("outbound_traffic"),
        when(col("family_raw") === "CLOUDNATIVE", 0).otherwise(1).as("ipv4")))
  }

  /** Shared plumbing for ondemand + spot price rows: route `server_plan_*`
    * keys, gate GPU plans on device availability (matched on the FULL key
    * name — spot GPU keys therefore never match), divide cents. */
  private def serverPlanPrices(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val avail = broadcast(gpuAvailability.toDF("region_id", "plan", "amount"))
    priceKeyRows(spark)
      .filter(col("key").startsWith("server_plan_"))
      .withColumn("plan", expr("substring(key, 13)"))
      .join(avail, Seq("region_id", "plan"), "left")
      .filter(!col("plan").startsWith("GPU") || coalesce(col("amount"), lit(0)) > 0)
      .withColumn("price", round(col("cents") / 100, 4))
  }

  /** Hourly billing up to the constant 672-hour monthly cap, free beyond —
    * billing policy as a tier pair (`_upcloud.py:474-481`). */
  def inventoryServerPrices(spark: SparkSession): DataFrame =
    withVendor(serverPlanPrices(spark)
      .filter(!col("plan").contains("SPOT"))
      .select(col("plan").as("server_id"), col("region_id"),
        col("region_id").as("zone_id"),
        lit("linux").as("operating_system"),
        lit("ondemand").as("allocation"),
        lit("hour").as("unit"),
        col("price"),
        lit(0.0).as("price_upfront"),
        array(
          struct(lit(0.0).as("lower"), lit(672.0).as("upper"), col("price").as("price")),
          struct(lit(673.0).as("lower"), lit(Double.PositiveInfinity).as("upper"),
            lit(0.0).as("price"))).as("price_tiered"),
        lit("EUR").as("currency")))

  def inventoryServerPricesSpot(spark: SparkSession): DataFrame =
    withVendor(serverPlanPrices(spark)
      .filter(col("plan").contains("SPOT"))
      .select(regexp_replace(col("plan"), "SPOT-", "").as("server_id"),
        col("region_id"), col("region_id").as("zone_id"),
        lit("linux").as("operating_system"),
        lit("spot").as("allocation"),
        lit("hour").as("unit"),
        col("price"),
        lit(0.0).as("price_upfront"),
        lit("EUR").as("currency")))

  def inventoryStorages(spark: SparkSession): DataFrame = {
    import spark.implicits._
    withVendor(storageCatalog.toDF("storage_id", "name", "description",
      "storage_type", "max_iops", "min_size", "max_size"))
  }

  /** Storage price keys resolve against the catalog (unknown ids like
    * `storage_backup` drop out); hourly cents convert to gb_month. */
  def inventoryStoragePrices(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val catalog = broadcast(storageCatalog.map(_._1).toDF("storage_id"))
    withVendor(priceKeyRows(spark)
      .filter(col("key").startsWith("storage_"))
      .withColumn("storage_id", expr("substring(key, 9)"))
      .join(catalog, Seq("storage_id")) // the catalog IS the filter
      .select(col("region_id"), col("storage_id"),
        lit("gb_month").as("unit"),
        round(col("cents") / 100 * 24 * 30, 4).as("price"),
        lit("EUR").as("currency")))
  }

  def inventoryDatabases(spark: SparkSession): DataFrame =
    VendorInventory.empty(spark, "database")

  def inventoryDatabasePrices(spark: SparkSession): DataFrame =
    VendorInventory.empty(spark, "database_price")

  /** One bandwidth key prices the OUT direction; IN is free. */
  def inventoryTrafficPrices(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val directions = Seq("in", "out").toDF("direction")
    withVendor(priceKeyRows(spark)
      .filter(col("key") === "public_ipv4_bandwidth_out")
      .crossJoin(directions)
      .select(col("region_id"), col("direction"),
        when(col("direction") === "out", round(col("cents") / 100, 4))
          .otherwise(0.0).as("price"),
        lit("gb_month").as("unit"),
        lit("EUR").as("currency")))
  }

  def inventoryIpv4Prices(spark: SparkSession): DataFrame =
    withVendor(priceKeyRows(spark)
      .filter(col("key") === "ipv4_address")
      .select(col("region_id"), round(col("cents") / 100, 4).as("price"),
        lit("hour").as("unit"), lit("EUR").as("currency")))

  def inventoryBenchmarkScores(spark: SparkSession): DataFrame =
    VendorInventory.empty(spark, "benchmark_score")

  override def inventoryVendors(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((vendorId, "Zonal Cloud", "FI", 2026))
      .toDF("vendor_id", "name", "country_id", "founding_year")
  }
}

object ZonalVendor {
  private def esc(s: String) = s.replace("'", "''")

  /** (zone, key, cents) fixture rows as SQL VALUES — the external oracle
    * rebuilds the key pivot from the same literals; drift against the JSON
    * payload shows up as a red gate row, so the duplication self-checks. */
  def priceKeyValuesSql: String = Seq(
    ("de-fra1", "server_plan_1xCPU-2GB", "1.488"),
    ("de-fra1", "server_plan_HICPU-8xCPU-12GB", "8.93"),
    ("de-fra1", "server_plan_GPU-8xCPU-64GB-1xL40S", "290.0"),
    ("de-fra1", "server_plan_SPOT-2xCPU-4GB", "0.893"),
    ("de-fra1", "storage_maxiops", "0.031"),
    ("de-fra1", "storage_hdd", "0.0078"),
    ("de-fra1", "storage_backup", "0.009"),
    ("de-fra1", "public_ipv4_bandwidth_out", "0.0007"),
    ("de-fra1", "ipv4_address", "0.7"),
    ("us-chi1", "server_plan_1xCPU-2GB", "1.61"),
    ("us-chi1", "server_plan_HIMEM-4xCPU-32GB", "26.0"),
    ("us-chi1", "server_plan_GPU-8xCPU-64GB-1xL40S", "290.0"),
    ("us-chi1", "server_plan_GPU-SPOT-8xCPU-64GB-1xL40S", "100.0"),
    ("us-chi1", "storage_maxiops", "0.034"),
    ("us-chi1", "storage_standard", "0.014"),
    ("us-chi1", "ipv4_address", "0.76"),
    ("fi-hel2", "server_plan_1xCPU-2GB", "1.488"),
    ("fi-hel2", "server_plan_DEV-2xCPU-4GB-10GB", "0.45"),
    ("fi-hel2", "server_plan_CLOUDNATIVE-2xCPU-4GB", "1.0"),
    ("fi-hel2", "storage_hdd", "0.0066"),
    ("fi-hel2", "public_ipv4_bandwidth_out", "0.0005"),
    ("fi-hel2", "ipv4_address", "0.7"))
    .map { case (z, k, c) => s"('${esc(z)}', '${esc(k)}', $c)" }.mkString(", ")

  /** (zone, plan, amount) device-availability rows as SQL VALUES. */
  def gpuAvailabilityValuesSql: String =
    new ZonalVendor().gpuAvailability
      .map { case (z, p, a) => s"('${esc(z)}', '${esc(p)}', $a)" }.mkString(", ")

  /** (storage_id, max_iops) catalog rows as SQL VALUES. */
  def storageCatalogValuesSql: String =
    new ZonalVendor().storageCatalog
      .map { case (id, _, _, tpe, iops, _, _) => s"('${esc(id)}', '${esc(tpe)}', $iops)" }
      .mkString(", ")
}
