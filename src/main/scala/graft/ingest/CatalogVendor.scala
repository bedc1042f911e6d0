package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sixth concrete [[VendorInventory]]: a vendor whose whole offering is ONE
  * commerce catalog — an `addons` array where each plan carries nested
  * `commercial`/`technical` blobs — plus a thin per-project offer list that
  * links regions to plan codes. This is the shape of the reference's OVH
  * module (`vendors/_ovh.py`) and covers the ingest traits the other five
  * adapters don't:
  *
  *  - **catalog addon filtering** (`_ovh.py:585-600`): plans qualify by
  *    product type, blob presence, OS family and a `.consumption` plan-code
  *    suffix; qualifying rows then dedupe keep-LAST by invoice name
  *    (`servers[invoiceName] = plan` — dict insert order);
  *  - **name-driven GPU spec inference** (`_ovh.py:163-335`): the GPU
  *    count/memory/architecture derive from the FLAVOR NAME via a rule
  *    table (`h100-760` → 760/380 = 2 GPUs × 80 GiB Hopper), with the
  *    technical blob's `gpu` object as the fallback when no rule matches —
  *    a broadcast rule join on the regex-extracted name prefix, not a UDF;
  *  - **two differently-shaped disk arrays** (`_ovh.py:637-668`): `nvme`
  *    disks replicate by a `number` field; `storage` disks classify by
  *    `technology`/`interface` substring — both fold into one size/type
  *    summary with array HOFs (`aggregate`/`filter`), no explode needed;
  *  - **microcent prices** (`utils.py:25`): every quote divides by 10^8;
  *  - **computed storage-addon key** (`_ovh.py:808-831`): the storage
  *    price plan code is BUILT from the storage id plus a `.3AZ` suffix
  *    exactly when the region has more than one zone — a computed join key
  *    whose value depends on an aggregate of another table (J5 meets A5);
  *  - **zone-count-dependent region model** (`_ovh.py:547-577`): regions
  *    with no listed availability zones get a synthetic `<region>-a` zone;
  *  - **location-conditional traffic tiers** (`_ovh.py:837-897`): outbound
  *    traffic is free except in APAC datacenters, where a free-quota tier
  *    chain applies.
  *
  * Fixtures are original, shaped after the reference's API responses.
  * Scale note: catalogs are control-plane small (hundreds of addons), so
  * every lookup side here broadcasts; the only fan-out is offers × zones,
  * which shuffles nothing (broadcast joins end-to-end).
  */
class CatalogVendor extends VendorInventory {
  val vendorId = "catalog"

  private def withVendor(df: DataFrame): DataFrame =
    df.withColumn("vendor_id", lit(vendorId))

  // ------------------------------------------------------------- payloads

  /** The commerce catalog (`/order/catalog/public/cloud` shape): compute
    * addons with nested blobs, volume addons for storage billing, plus the
    * decoys the filter must drop — a `.monthly` plan code, a windows OS
    * family, a blob-less legacy row — and the `b3-8` plan listed TWICE
    * (catalogs re-list revised plans under the same code); the later row
    * (revised bandwidth) must win the keep-last dedupe. */
  private[ingest] val catalogPayload: String =
    """{"locale": {"currencyCode": "EUR"}, "addons": [
      |  {"planCode": "b3-8.consumption", "invoiceName": "b3-8",
      |   "product": "compute-instance", "pricings": [{"price": 16300000}],
      |   "blobs": {"commercial": {"name": "B3-8"}, "tags": ["active"],
      |     "technical": {"os": {"family": "linux"},
      |       "cpu": {"cores": 8, "frequency": 2.3}, "memory": {"size": 32},
      |       "nvme": {"disks": [{"capacity": 200, "number": 1}]},
      |       "bandwidth": {"level": 1000}, "vrack": {"level": 2000}}}},
      |  {"planCode": "c3-32.consumption", "invoiceName": "c3-32",
      |   "product": "compute-instance", "pricings": [{"price": 70000000}],
      |   "blobs": {"commercial": {"name": "C3-32"}, "tags": ["active"],
      |     "technical": {"os": {"family": "linux"},
      |       "cpu": {"cores": 32, "frequency": 3.1}, "memory": {"size": 64},
      |       "storage": {"disks": [{"capacity": 400, "technology": "NVMe"}]},
      |       "bandwidth": {"level": 4000}, "vrack": {"level": 8000}}}},
      |  {"planCode": "a10-45.consumption", "invoiceName": "a10-45",
      |   "product": "compute-instance", "pricings": [{"price": 75000000}],
      |   "blobs": {"commercial": {"name": "A10-45"}, "tags": ["active"],
      |     "technical": {"os": {"family": "linux"},
      |       "cpu": {"cores": 30, "frequency": 3.3}, "memory": {"size": 45},
      |       "storage": {"disks": [{"capacity": 400, "technology": "SSD"}]},
      |       "bandwidth": {"level": 8000}}}},
      |  {"planCode": "h100-760.consumption", "invoiceName": "h100-760",
      |   "product": "compute-instance", "pricings": [{"price": 560000000}],
      |   "blobs": {"commercial": {"name": "H100-760"}, "tags": ["active"],
      |     "technical": {"os": {"family": "linux"},
      |       "cpu": {"cores": 60, "frequency": 3.0}, "memory": {"size": 760},
      |       "nvme": {"disks": [{"capacity": 3840, "number": 2}]},
      |       "storage": {"disks": [{"capacity": 200, "interface": "nvme"}]},
      |       "bandwidth": {"level": 16000}}}},
      |  {"planCode": "gpu-custom-1.consumption", "invoiceName": "gpu-custom-1",
      |   "product": "compute-instance", "pricings": [{"price": 30000000}],
      |   "blobs": {"commercial": {"name": "GPU Custom 1"}, "tags": ["active"],
      |     "technical": {"os": {"family": "linux"},
      |       "cpu": {"cores": 16, "frequency": 2.8}, "memory": {"size": 96},
      |       "gpu": {"number": 1, "memory": {"size": 16}, "model": "RTX 4000"},
      |       "storage": {"disks": [{"capacity": 800, "technology": "SSD"}]},
      |       "bandwidth": {"level": 4000}}}},
      |  {"planCode": "d2-4.consumption", "invoiceName": "d2-4",
      |   "product": "compute-instance", "pricings": [{"price": 800000}],
      |   "blobs": {"commercial": {"name": "D2-4", "brickSubtype": "discovery"},
      |     "tags": ["active"],
      |     "technical": {"os": {"family": "linux"},
      |       "cpu": {"cores": 4, "frequency": 2.0}, "memory": {"size": 8},
      |       "storage": {"disks": [{"capacity": 50, "technology": "SSD"}]},
      |       "bandwidth": {"level": 500}}}},
      |  {"planCode": "i1-180.consumption", "invoiceName": "i1-180",
      |   "product": "compute-instance", "pricings": [{"price": 90000000}],
      |   "blobs": {"commercial": {"name": "I1-180"}, "tags": [],
      |     "technical": {"os": {"family": "linux"},
      |       "cpu": {"cores": 32, "frequency": 2.9}, "memory": {"size": 180},
      |       "nvme": {"disks": [{"capacity": 1920, "number": 4}]},
      |       "bandwidth": {"level": 8000}}}},
      |  {"planCode": "b3-8.consumption", "invoiceName": "b3-8",
      |   "product": "compute-instance", "pricings": [{"price": 16300000}],
      |   "blobs": {"commercial": {"name": "B3-8"}, "tags": ["active"],
      |     "technical": {"os": {"family": "linux"},
      |       "cpu": {"cores": 8, "frequency": 2.3}, "memory": {"size": 32},
      |       "nvme": {"disks": [{"capacity": 200, "number": 1}]},
      |       "bandwidth": {"level": 2000}, "vrack": {"level": 4000}}}},
      |  {"planCode": "r3-16.monthly", "invoiceName": "r3-16",
      |   "product": "compute-instance", "pricings": [{"price": 9000000000}],
      |   "blobs": {"commercial": {"name": "R3-16"}, "tags": ["active"],
      |     "technical": {"os": {"family": "linux"},
      |       "cpu": {"cores": 16, "frequency": 2.9}, "memory": {"size": 128},
      |       "bandwidth": {"level": 4000}}}},
      |  {"planCode": "win-b3-8.consumption", "invoiceName": "win-b3-8",
      |   "product": "compute-instance", "pricings": [{"price": 26300000}],
      |   "blobs": {"commercial": {"name": "B3-8 Windows"}, "tags": ["active"],
      |     "technical": {"os": {"family": "windows"},
      |       "cpu": {"cores": 8, "frequency": 2.3}, "memory": {"size": 32},
      |       "bandwidth": {"level": 2000}}}},
      |  {"planCode": "legacy-c2.consumption", "invoiceName": "legacy-c2",
      |   "product": "compute-instance", "pricings": [{"price": 5000000}]},
      |  {"planCode": "volume.classic.consumption", "invoiceName": "vol-classic",
      |   "product": "block-volume", "pricings": [{"price": 5480}]},
      |  {"planCode": "volume.classic.consumption.3AZ", "invoiceName": "vol-classic-3az",
      |   "product": "block-volume", "pricings": [{"price": 8220}]},
      |  {"planCode": "volume.high-speed.consumption", "invoiceName": "vol-hs",
      |   "product": "block-volume", "pricings": [{"price": 10960}]},
      |  {"planCode": "volume.high-speed.consumption.3AZ", "invoiceName": "vol-hs-3az",
      |   "product": "block-volume", "pricings": [{"price": 16440}]},
      |  {"planCode": "volume.high-speed-gen2.consumption", "invoiceName": "vol-hs2",
      |   "product": "block-volume", "pricings": [{"price": 24660}]},
      |  {"planCode": "volume.high-speed-gen2.consumption.3AZ", "invoiceName": "vol-hs2-3az",
      |   "product": "block-volume", "pricings": [{"price": 32880}]}
      |]}""".stripMargin

  /** Region listing (`/cloud/project/{id}/region` + per-region detail):
    * a 3AZ region, two 1AZ regions (no listed zones → synthetic `-a`
    * zone), one of them in an APAC datacenter (tiered outbound traffic). */
  private[ingest] val regionsPayload: String =
    """{"regions": [
      |  {"id": "EU-WEST-PAR", "datacenterLocation": "PAR",
      |   "availabilityZones": ["eu-west-par-a", "eu-west-par-b", "eu-west-par-c"]},
      |  {"id": "NA-EAST-BHS", "datacenterLocation": "BHS", "availabilityZones": []},
      |  {"id": "AP-SGP", "datacenterLocation": "SGP", "availabilityZones": []}
      |]}""".stripMargin

  /** Offer list (`/cloud/project/{id}/flavor` shape): region × plan code
    * links. Includes a windows offer (filtered on osType) and an offer in
    * a region the region inventory doesn't know (logged + excluded, F6). */
  private[ingest] val offersPayload: String =
    """{"offers": [
      |  {"region": "EU-WEST-PAR", "osType": "linux", "planCodes": {"hourly": "b3-8.consumption"}},
      |  {"region": "EU-WEST-PAR", "osType": "linux", "planCodes": {"hourly": "c3-32.consumption"}},
      |  {"region": "EU-WEST-PAR", "osType": "linux", "planCodes": {"hourly": "a10-45.consumption"}},
      |  {"region": "EU-WEST-PAR", "osType": "linux", "planCodes": {"hourly": "gpu-custom-1.consumption"}},
      |  {"region": "EU-WEST-PAR", "osType": "linux", "planCodes": {"hourly": "d2-4.consumption"}},
      |  {"region": "EU-WEST-PAR", "osType": "windows", "planCodes": {"hourly": "win-b3-8.consumption"}},
      |  {"region": "NA-EAST-BHS", "osType": "linux", "planCodes": {"hourly": "b3-8.consumption"}},
      |  {"region": "NA-EAST-BHS", "osType": "linux", "planCodes": {"hourly": "h100-760.consumption"}},
      |  {"region": "AP-SGP", "osType": "linux", "planCodes": {"hourly": "b3-8.consumption"}},
      |  {"region": "EU-CENTRAL-XX", "osType": "linux", "planCodes": {"hourly": "c3-32.consumption"}}
      |]}""".stripMargin

  /** Datacenter location metadata (`_ovh.py:389-510`'s manual table). */
  private[ingest] val datacenterMeta: Seq[(String, String, String, Double, Double)] =
    Seq(
      ("PAR", "FR", "Paris", 2.3756, 48.8885),
      ("BHS", "CA", "Beauharnois", -73.8966, 45.3093),
      ("SGP", "SG", "Singapore", 103.8939, 1.3177))

  /** GPU name-rule table (`_ovh.py:163-335`): flavor-name prefix →
    * (size divisor, GiB per GPU, architecture family, model). The rule
    * list IS the operator's spec — count = size ÷ divisor. */
  private[ingest] val gpuNameRules: Seq[(String, Int, Long, String, String)] = Seq(
    ("h100", 380, 80L, "Hopper", "H100"),
    ("a100", 180, 80L, "Ampere", "A100"),
    ("a10", 45, 24L, "Ampere", "A10"),
    ("l40s", 90, 48L, "Ada Lovelace", "L40S"),
    ("l4", 90, 24L, "Ada Lovelace", "L4"),
    ("t2", 45, 32L, "Volta", "V100S"),
    ("t1", 45, 16L, "Volta", "V100"),
    ("rtx5000", 28, 16L, "Turing", "Quadro RTX 5000"))

  /** Family rule table (`_ovh.py:115-160`): name prefix → display family. */
  private[ingest] val familyRules: Seq[(String, String)] = Seq(
    ("t1", "Cloud GPU"), ("t2", "Cloud GPU"), ("a10", "Cloud GPU"),
    ("a100", "Cloud GPU"), ("l4", "Cloud GPU"), ("l40s", "Cloud GPU"),
    ("h100", "Cloud GPU"), ("rtx5000", "Cloud GPU"), ("bm", "Metal"),
    ("b2", "General Purpose"), ("b3", "General Purpose"),
    ("c2", "Compute Optimized"), ("c3", "Compute Optimized"),
    ("r2", "Memory Optimized"), ("r3", "Memory Optimized"),
    ("d2", "Discovery"), ("i1", "Storage Optimized"))

  /** Static block-storage catalog (`_ovh.py:766-806`-shaped, original). */
  private[ingest] val storageCatalog: Seq[(String, String, Long, Long, Long, Long)] =
    Seq(
      ("classic", "Classic Volume", 500L, 64L, 10L, 12000L),
      ("high-speed", "High Speed Volume Gen 1", 3000L, 128L, 10L, 12000L),
      ("high-speed-gen2", "High Speed Volume Gen 2", 20000L, 320L, 10L, 12000L))

  // ----------------------------------------------------------- raw parses

  private val diskNvme = ArrayType(new StructType()
    .add("capacity", LongType).add("number", IntegerType))
  private val diskStorage = ArrayType(new StructType()
    .add("capacity", LongType).add("technology", StringType).add("interface", StringType))
  private val technicalSchema = new StructType()
    .add("os", new StructType().add("family", StringType))
    .add("cpu", new StructType().add("cores", IntegerType).add("frequency", DoubleType))
    .add("memory", new StructType().add("size", IntegerType))
    .add("gpu", new StructType()
      .add("number", IntegerType)
      .add("memory", new StructType().add("size", IntegerType))
      .add("model", StringType))
    .add("nvme", new StructType().add("disks", diskNvme))
    .add("storage", new StructType().add("disks", diskStorage))
    .add("bandwidth", new StructType().add("level", IntegerType))
    .add("vrack", new StructType().add("level", IntegerType))
  private val addonSchema = new StructType()
    .add("planCode", StringType).add("invoiceName", StringType)
    .add("product", StringType)
    .add("pricings", ArrayType(new StructType().add("price", LongType)))
    .add("blobs", new StructType()
      .add("commercial", new StructType()
        .add("name", StringType).add("brickSubtype", StringType))
      .add("tags", ArrayType(StringType))
      .add("technical", technicalSchema))
  private val catalogSchema = new StructType()
    .add("locale", new StructType().add("currencyCode", StringType))
    .add("addons", ArrayType(addonSchema))

  /** One row per catalog addon, with the original array POSITION — the
    * keep-last dedupe needs insert order (`servers[invoiceName] = plan`). */
  private[ingest] def addonRows(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(catalogPayload).toDF("payload")
      .select(posexplode(from_json(col("payload"), catalogSchema)
        .getField("addons")).as(Seq("pos", "a")))
  }

  private def regionRows(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val schema = new StructType().add("regions", ArrayType(new StructType()
      .add("id", StringType).add("datacenterLocation", StringType)
      .add("availabilityZones", ArrayType(StringType))))
    Seq(regionsPayload).toDF("payload")
      .select(explode(from_json(col("payload"), schema).getField("regions")).as("r"))
      .select(col("r.id").as("region_id"),
        col("r.datacenterLocation").as("datacenter"),
        col("r.availabilityZones").as("azs"))
  }

  private def offerRows(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val schema = new StructType().add("offers", ArrayType(new StructType()
      .add("region", StringType).add("osType", StringType)
      .add("planCodes", new StructType().add("hourly", StringType))))
    Seq(offersPayload).toDF("payload")
      .select(explode(from_json(col("payload"), schema).getField("offers")).as("o"))
      .select(col("o.region").as("region_id"), col("o.osType").as("os_type"),
        col("o.planCodes.hourly").as("plan_code"))
  }

  /** The qualifying compute plans, deduped keep-last by invoice name
    * (`_ovh.py:585-600`). */
  private[ingest] def serverAddons(spark: SparkSession): DataFrame = {
    val qualified = addonRows(spark)
      .filter(col("a.product") === "compute-instance" &&
        col("a.blobs").isNotNull && col("a.blobs.technical").isNotNull &&
        col("a.blobs.technical.os.family") === "linux" &&
        col("a.planCode").endsWith(".consumption"))
    graft.ops.Dedup.keepLast(qualified, Seq("a.invoiceName"), Seq(col("pos")))
  }

  private def prefixOf(name: Column): Column =
    regexp_extract(name, "^([a-z0-9]+)", 1)
  private def sizeOf(name: Column): Column =
    nullif(regexp_extract(name, "([0-9]+)$", 1), lit("")).cast("int")

  // ---------------------------------------------------------- inventories

  def inventoryComplianceFrameworks(spark: SparkSession): DataFrame =
    SeedTables.complianceFrameworks(spark)

  def inventoryCountries(spark: SparkSession): DataFrame =
    SeedTables.countries(spark)

  def inventoryRegions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val meta = broadcast(datacenterMeta.toDF("datacenter", "country_id", "city", "lon", "lat"))
    withVendor(regionRows(spark).join(meta, Seq("datacenter"))
      .select(col("region_id"), col("region_id").as("name"),
        col("region_id").as("api_reference"),
        concat(col("region_id"), lit(" ("), col("country_id"), lit(")")).as("display_name"),
        array().cast("array<string>").as("aliases"),
        col("country_id"), col("city"), col("lon"), col("lat")))
  }

  /** Listed AZs, or the synthetic `<region lower>-a` zone when the region
    * reports none (`_ovh.py:558-563`). */
  def inventoryZones(spark: SparkSession): DataFrame =
    withVendor(regionRows(spark)
      .select(col("region_id"), explode(when(size(col("azs")) > 0, col("azs"))
        .otherwise(array(concat(lower(col("region_id")), lit("-a"))))).as("zone_id"))
      .select(col("region_id"), col("zone_id"), col("zone_id").as("name"),
        col("zone_id").as("api_reference"), col("zone_id").as("display_name")))

  def inventoryServers(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val gpuRules = broadcast(gpuNameRules.toDF(
      "prefix", "divisor", "gib_per_gpu", "rule_gpu_family", "rule_gpu_model"))
    val famRules = broadcast(familyRules.toDF("prefix", "family"))
    val t = col("a.blobs.technical")
    val base = serverAddons(spark)
      .withColumn("prefix", prefixOf(col("a.invoiceName")))
      .withColumn("name_size", sizeOf(col("a.invoiceName")))
    // disk summary from the two differently-shaped arrays: nvme disks
    // replicate by `number`; storage disks classify by technology/interface
    val nvmeBlobGb = coalesce(aggregate(t.getField("nvme").getField("disks"),
      lit(0L), (acc, d) => acc +
        d.getField("capacity") * coalesce(d.getField("number"), lit(1))), lit(0L))
    val isNvmeDisk = (d: Column) => lower(concat(
      coalesce(d.getField("technology"), lit("")),
      coalesce(d.getField("interface"), lit("")))).contains("nvme")
    val storDisks = coalesce(t.getField("storage").getField("disks"),
      array().cast(diskStorage))
    val sumCap = (ds: Column) => coalesce(
      aggregate(ds, lit(0L), (acc, d) => acc + d.getField("capacity")), lit(0L))
    val nvmeGb = nvmeBlobGb + sumCap(filter(storDisks, isNvmeDisk))
    val ssdGb = sumCap(filter(storDisks, d => !isNvmeDisk(d)))
    // first-disk type (`storages[0].storage_type`): nvme disks are
    // appended before storage disks, so any nvme blob wins; otherwise the
    // first storage disk's classification decides
    val storageType = when(nvmeBlobGb > 0, "nvme_ssd")
      .when(size(storDisks) > 0,
        when(isNvmeDisk(element_at(storDisks, 1)), "nvme_ssd").otherwise("ssd"))
    // name rule first, technical blob fallback (`_gpu_count or gpu.number`)
    val joined = base
      .join(gpuRules, Seq("prefix"), "left")
      .join(famRules, Seq("prefix"), "left")
    val ruleCount = when(col("divisor").isNotNull && col("name_size").isNotNull,
      floor(col("name_size") / col("divisor")).cast("int"))
    val gpuCount = coalesce(ruleCount, t.getField("gpu").getField("number"), lit(0))
    val gpuMemEach = coalesce(col("gib_per_gpu") * 1024,
      t.getField("gpu").getField("memory").getField("size").cast("long") * 1024)
    withVendor(joined.select(
      col("a.invoiceName").as("server_id"),
      col("a.invoiceName").as("name"),
      col("a.invoiceName").as("api_reference"),
      col("a.blobs.commercial.name").as("display_name"),
      concat_ws(", ",
        concat(t.getField("cpu").getField("cores"), lit(" vCPUs")),
        concat(t.getField("memory").getField("size"), lit(" GiB RAM"))).as("description"),
      col("family"),
      t.getField("cpu").getField("cores").as("vcpus"),
      lit("KVM").as("hypervisor"),
      // dedicated except the Discovery commercial subtype (`_ovh.py:611-616`)
      when(col("a.blobs.commercial.brickSubtype") === "discovery", "shared")
        .otherwise("dedicated").as("cpu_allocation"),
      t.getField("cpu").getField("frequency").as("cpu_speed"),
      lit("x86_64").as("cpu_architecture"),
      (t.getField("memory").getField("size").cast("long") * 1024).as("memory_amount"),
      gpuCount.as("gpu_count"),
      when(gpuCount > 0, gpuMemEach).as("gpu_memory_min"),
      when(gpuCount > 0, gpuMemEach * gpuCount).as("gpu_memory_total"),
      when(gpuCount > 0, "NVIDIA").as("gpu_manufacturer"),
      when(gpuCount > 0,
        coalesce(col("rule_gpu_family"), lit(null))).as("gpu_family"),
      when(gpuCount > 0,
        coalesce(col("rule_gpu_model"), t.getField("gpu").getField("model"))).as("gpu_model"),
      (nvmeGb + ssdGb).as("storage_size"),
      storageType.as("storage_type"),
      (t.getField("bandwidth").getField("level") / 1000.0).as("network_speed"),
      // vrack (private-network) level: outside the registry schema, kept
      // on the raw inventory for the gated query and specs
      (t.getField("vrack").getField("level") / 1000.0).as("network_speed_max"),
      // all public traffic unmetered (`_ovh.py:738-741`)
      lit(0L).as("inbound_traffic"), lit(0L).as("outbound_traffic"),
      lit(1).as("ipv4"),
      when(array_contains(coalesce(col("a.blobs.tags"), array().cast(ArrayType(StringType))),
        "active"), "active").otherwise("inactive").as("status")))
  }

  /** Offers link a region to an addon's hourly plan code; each offer fans
    * out across the region's zones; microcent prices divide by 10^8.
    * Offers in regions the region inventory doesn't know are excluded
    * (the reference logs each, `_ovh.py:776-780`). */
  def inventoryServerPrices(spark: SparkSession): DataFrame = {
    val addons = serverAddons(spark)
      .select(col("a.planCode").as("plan_code"),
        col("a.invoiceName").as("server_id"),
        col("a.blobs.technical.os.family").as("operating_system"),
        element_at(col("a.pricings"), 1).getField("price").as("microcents"))
    val zones = inventoryZones(spark).select("region_id", "zone_id")
    withVendor(offerRows(spark)
      .filter(col("os_type") === "linux")
      .join(broadcast(addons), Seq("plan_code"))
      .join(broadcast(zones), Seq("region_id")) // inner: unknown regions drop
      .select(col("region_id"), col("zone_id"), col("server_id"),
        col("operating_system"),
        lit("ondemand").as("allocation"),
        lit("hour").as("unit"),
        round(col("microcents") / 1e8, 4).as("price"),
        lit(0.0).as("price_upfront"),
        lit("EUR").as("currency")))
  }

  /** Offers referencing unknown regions — surfaced for logging/specs. */
  private[ingest] def unknownRegionOffers(spark: SparkSession): DataFrame =
    offerRows(spark).filter(col("os_type") === "linux")
      .join(inventoryZones(spark).select("region_id").distinct(),
        Seq("region_id"), "left_anti")

  def inventoryServerPricesSpot(spark: SparkSession): DataFrame =
    VendorInventory.empty(spark, "server_price") // no spot market (`_ovh.py:806`)

  def inventoryStorages(spark: SparkSession): DataFrame = {
    import spark.implicits._
    withVendor(storageCatalog
      .toDF("storage_id", "name", "max_iops", "max_throughput", "min_size", "max_size")
      .withColumn("storage_type", lit("network")))
  }

  /** The computed-key join (`_ovh.py:808-831`): plan code =
    * `volume.<id>.consumption` + `.3AZ` iff the region has >1 zone; the
    * hourly microcent quote converts to gb_month via ×730. */
  def inventoryStoragePrices(spark: SparkSession): DataFrame = {
    val volumes = addonRows(spark)
      .filter(col("a.product") === "block-volume")
      .select(col("a.planCode").as("plan_code"),
        element_at(col("a.pricings"), 1).getField("price").as("microcents"))
    val zoneCounts = inventoryZones(spark)
      .groupBy("region_id").agg(count(lit(1)).as("n_zones"))
    val keyed = inventoryStorages(spark).select("storage_id")
      .crossJoin(zoneCounts) // 3 storages × 3 regions: control-plane tiny
      .withColumn("plan_code", concat(
        lit("volume."), col("storage_id"), lit(".consumption"),
        when(col("n_zones") > 1, ".3AZ").otherwise("")))
    withVendor(keyed.join(broadcast(volumes), Seq("plan_code"))
      .select(col("region_id"), col("storage_id"),
        lit("gb_month").as("unit"),
        round(col("microcents") / 1e8 * 730, 4).as("price"),
        lit("EUR").as("currency")))
  }

  def inventoryDatabases(spark: SparkSession): DataFrame =
    VendorInventory.empty(spark, "database")

  def inventoryDatabasePrices(spark: SparkSession): DataFrame =
    VendorInventory.empty(spark, "database_price")

  /** Inbound free everywhere; outbound free except APAC datacenters,
    * which carry a 1 TiB free quota then a flat overage tier
    * (`_ovh.py:837-897`). */
  def inventoryTrafficPrices(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val directions = Seq("in", "out").toDF("direction")
    val apac = col("datacenter").isin("SGP", "SYD", "YNM")
    val tiered = col("direction") === "out" && apac
    withVendor(regionRows(spark).crossJoin(directions)
      .select(col("region_id"), col("direction"),
        when(tiered, 0.01).otherwise(0.0).as("price"),
        when(tiered, array(
          struct(lit(1.0).as("lower"), lit(1024.0).as("upper"), lit(0.0).as("price")),
          struct(lit(1025.0).as("lower"), lit(Double.PositiveInfinity).as("upper"),
            lit(0.01).as("price"))))
          .otherwise(array().cast("array<struct<lower:double,upper:double,price:double>>"))
          .as("price_tiered"),
        lit("gb_month").as("unit"), lit("EUR").as("currency")))
  }

  /** Flat monthly IPv4 price in every region (`_ovh.py:900-925`). */
  def inventoryIpv4Prices(spark: SparkSession): DataFrame =
    withVendor(regionRows(spark)
      .select(col("region_id"), lit(1.5).as("price"),
        lit("month").as("unit"), lit("EUR").as("currency")))

  def inventoryBenchmarkScores(spark: SparkSession): DataFrame =
    VendorInventory.empty(spark, "benchmark_score")

  override def inventoryVendors(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((vendorId, "Catalog Cloud", "FR", 1999))
      .toDF("vendor_id", "name", "country_id", "founding_year")
  }
}

object CatalogVendor {
  private def esc(s: String) = s.replace("'", "''")

  /** Qualifying compute addons as VALUES — (invoice_name, plan_code, pos,
    * vcpus, mem_gb, subtype, gpu_blob_n, gpu_blob_gib, gpu_blob_model,
    * nvme_gb, ssd_gb, active, microcents, bw_level, vrack_level). Zero in
    * the gpu/vrack slots encodes "absent in the blob" (the oracle NULLIFs).
    * The oracle rebuilds the filter/dedupe/name-rule pipeline from these
    * literals; drift against the JSON payload turns the gate row red
    * (self-checking duplication, like ZonalVendor's). Decoy addons
    * (monthly/windows/blob-less) are OMITTED here because the oracle
    * applies the qualification filter on plan_code/os up front — they
    * appear only in the JSON, where the Spark side must drop them to stay
    * hash-equal. */
  def serverAddonValuesSql: String = Seq(
    ("b3-8", "b3-8.consumption", 0, 8, 32, "", 0, 0, "", 200, 0, 1, 16300000L, 1000, 2000),
    ("c3-32", "c3-32.consumption", 1, 32, 64, "", 0, 0, "", 400, 0, 1, 70000000L, 4000, 8000),
    ("a10-45", "a10-45.consumption", 2, 30, 45, "", 0, 0, "", 0, 400, 1, 75000000L, 8000, 0),
    ("h100-760", "h100-760.consumption", 3, 60, 760, "", 0, 0, "", 7880, 0, 1, 560000000L, 16000, 0),
    ("gpu-custom-1", "gpu-custom-1.consumption", 4, 16, 96, "", 1, 16, "RTX 4000", 0, 800, 1, 30000000L, 4000, 0),
    ("d2-4", "d2-4.consumption", 5, 4, 8, "discovery", 0, 0, "", 0, 50, 1, 800000L, 500, 0),
    ("i1-180", "i1-180.consumption", 6, 32, 180, "", 0, 0, "", 7680, 0, 0, 90000000L, 8000, 0),
    ("b3-8", "b3-8.consumption", 7, 8, 32, "", 0, 0, "", 200, 0, 1, 16300000L, 2000, 4000))
    .map { case (inv, pc, pos, v, m, st, gn, gg, gm, nv, ssd, act, mc, bw, vr) =>
      s"('${esc(inv)}', '${esc(pc)}', $pos, $v, $m, '${esc(st)}', $gn, $gg, '${esc(gm)}', $nv, $ssd, $act, $mc, $bw, $vr)"
    }.mkString(", ")

  /** Region offers as VALUES — (region_id, os_type, plan_code); includes
    * the windows decoy and the unknown-region decoy the join must drop. */
  def offerValuesSql: String = Seq(
    ("EU-WEST-PAR", "linux", "b3-8.consumption"),
    ("EU-WEST-PAR", "linux", "c3-32.consumption"),
    ("EU-WEST-PAR", "linux", "a10-45.consumption"),
    ("EU-WEST-PAR", "linux", "gpu-custom-1.consumption"),
    ("EU-WEST-PAR", "linux", "d2-4.consumption"),
    ("EU-WEST-PAR", "windows", "win-b3-8.consumption"),
    ("NA-EAST-BHS", "linux", "b3-8.consumption"),
    ("NA-EAST-BHS", "linux", "h100-760.consumption"),
    ("AP-SGP", "linux", "b3-8.consumption"),
    ("EU-CENTRAL-XX", "linux", "c3-32.consumption"))
    .map { case (r, os, pc) => s"('${esc(r)}', '${esc(os)}', '${esc(pc)}')" }
    .mkString(", ")

  /** Resolved zones as VALUES — (region_id, zone_id); the two zone-less
    * regions carry their synthetic `<region lower>-a` zone. */
  def zoneValuesSql: String = Seq(
    ("EU-WEST-PAR", "eu-west-par-a"), ("EU-WEST-PAR", "eu-west-par-b"),
    ("EU-WEST-PAR", "eu-west-par-c"), ("NA-EAST-BHS", "na-east-bhs-a"),
    ("AP-SGP", "ap-sgp-a"))
    .map { case (r, z) => s"('${esc(r)}', '${esc(z)}')" }.mkString(", ")

  /** GPU name rules as VALUES — (prefix, divisor, gib_per_gpu, model). */
  def gpuRuleValuesSql: String =
    new CatalogVendor().gpuNameRules
      .map { case (p, d, g, _, m) => s"('${esc(p)}', $d, $g, '${esc(m)}')" }
      .mkString(", ")

  /** Family rules as VALUES. */
  def familyRuleValuesSql: String =
    new CatalogVendor().familyRules
      .map { case (p, f) => s"('${esc(p)}', '${esc(f)}')" }.mkString(", ")

  /** Volume addons as VALUES — (plan_code, microcents). */
  def volumeValuesSql: String = Seq(
    ("volume.classic.consumption", 5480L),
    ("volume.classic.consumption.3AZ", 8220L),
    ("volume.high-speed.consumption", 10960L),
    ("volume.high-speed.consumption.3AZ", 16440L),
    ("volume.high-speed-gen2.consumption", 24660L),
    ("volume.high-speed-gen2.consumption.3AZ", 32880L))
    .map { case (pc, mc) => s"('${esc(pc)}', $mc)" }.mkString(", ")

  /** Region → zone count as VALUES. */
  def regionZoneValuesSql: String = Seq(
    ("EU-WEST-PAR", 3), ("NA-EAST-BHS", 1), ("AP-SGP", 1))
    .map { case (r, n) => s"('${esc(r)}', $n)" }.mkString(", ")

  /** Storage catalog ids as VALUES. */
  def storageIdValuesSql: String =
    new CatalogVendor().storageCatalog
      .map { case (id, _, _, _, _, _) => s"('${esc(id)}')" }.mkString(", ")
}
