package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Eighth concrete [[VendorInventory]]: a vendor whose pricing comes from a
  * paginated SKU PRICE LIST keyed by INTERNAL region ids, with a separate
  * resource-AVAILABILITY feed that annotates (rather than filters) status —
  * the shape of the reference's Alibaba Cloud module
  * (`vendors/_alicloud.py`). Distinct ingest traits the other seven
  * adapters don't exercise:
  *
  *  - **availability-status ANNOTATION** (`_alicloud.py:252-317,1071-1078`):
  *    a nested DescribeAvailableResource tree (region → zone → resource →
  *    StatusCategory) marks each fanned-out (region, zone, server) price
  *    row `active` only where the category is exactly `WithStock` — rows
  *    are KEPT either way (contrast ZonalVendor, which gates rows out),
  *    and a server is `active` if WithStock ANYWHERE (`:986-1000`);
  *  - **internal region ids resolved through alias lists**
  *    (`_alicloud.py:449-558,1060-1065`): SKU rows quote
  *    `vm_region_no = "hz-north-na61-a01"`-style ids that resolve to
  *    canonical regions via per-region alias arrays; unknown ids are
  *    skipped and counted (F6 inside the price ingest);
  *  - **one price per REGION fanned out to its zones** (`:1066-1093`) —
  *    the inverse of OverrideVendor's per-location overrides;
  *  - **burstable CPU allocation** (`_determine_cpu_allocation_type`,
  *    `:433-446`): `BaselineCredit > 0` beats the Shared category check —
  *    a third allocation value the other adapters never produce;
  *  - **GPU-memory semantics switch on the count** (`:936-941`):
  *    `GPUMemorySize` is the TOTAL for fractional/single GPUs but PER-GPU
  *    for multiples (`total = count >= 1 ? count*per : per`), with
  *    `GPUSpec` suffix parsing (`"A10*1/12"` → 0.0833) and internal
  *    model-name rules (`G49` → Ada Lovelace family, model dropped);
  *  - **bandwidth-weighting network speeds** (`_parse_network_fields`,
  *    `:866-915`): max over Vpc Kbit values, min/max over EBS Bps values,
  *    each with its own unit conversion;
  *  - **storage SKUs filtered by performance level** (`:1343-1387`):
  *    flat products keep only PL1, ESSD keeps PL0-PL3 with an id suffix,
  *    and `hourPrice` rows convert to gb_month via ×730;
  *  - **first-positive tier pick** for traffic (`:1404`).
  *
  * Fixtures are original, shaped after the reference's API responses.
  * Scale note: all control-plane feeds (SKUs, availability, aliases) are
  * thousands of rows at most — every join side broadcasts; the only
  * fan-out is SKU × zones-of-region, which shuffles nothing.
  */
class SkuVendor extends VendorInventory {
  val vendorId = "sku"

  private def withVendor(df: DataFrame): DataFrame =
    df.withColumn("vendor_id", lit(vendorId))

  // ------------------------------------------------------------- fixtures

  /** DescribeRegions-shaped catalog. */
  private[ingest] val regionsPayload: String =
    """{"Regions": {"Region": [
      |  {"RegionId": "hz-north", "LocalName": "North China"},
      |  {"RegionId": "us-east", "LocalName": "US East"},
      |  {"RegionId": "eu-central", "LocalName": "EU Central"}
      |]}}""".stripMargin

  /** Static location metadata incl. the internal-id alias lists
    * (`locations`, `_alicloud.py:449-558`). */
  private[ingest] val regionMeta: Seq[(String, String, String, Double, Double, Int, Seq[String])] =
    Seq(
      ("hz-north", "Northtown", "CN", 120.1551, 30.2741, 2012,
        Seq("hz-north-na61-a01")),
      ("us-east", "Ashville", "US", -77.4874, 39.0438, 2015,
        Seq("us-east-us44-a01", "us-east-legacy")),
      ("eu-central", "Frankfurt", "DE", 8.6821, 50.1109, 2016,
        Seq("eu-central-de46-a01")))

  /** (region, zone, local name) — used to build the DescribeZones payloads
    * and the fan-out side. */
  private[ingest] val zoneRowsData: Seq[(String, String, String)] = Seq(
    ("hz-north", "hz-north-a", "North Zone A"),
    ("hz-north", "hz-north-b", "North Zone B"),
    ("us-east", "us-east-a", "East Zone A"),
    ("us-east", "us-east-b", "East Zone B"),
    ("eu-central", "eu-central-a", "Central Zone A"))

  /** Per-region DescribeZones payloads, generated from [[zoneRowsData]]. */
  private[ingest] def zonesPayloads: Seq[(String, String)] =
    zoneRowsData.groupBy(_._1).toSeq.map { case (region, zs) =>
      region -> zs.map { case (_, id, name) =>
        s"""{"ZoneId": "$id", "LocalName": "$name"}"""
      }.mkString("""{"Zones": {"Zone": [""", ", ", "]}}")
    }

  /** Flat truth for the availability tree — (region, zone, server,
    * StatusCategory). The nested payloads are GENERATED from this list, so
    * the companion's oracle VALUES cannot drift from what the engine
    * parses. Only `WithStock` counts as available (`_alicloud.py:305-317`). */
  private[ingest] val availabilityData: Seq[(String, String, String, String)] = Seq(
    ("hz-north", "hz-north-a", "ecs.g7.large", "WithStock"),
    ("hz-north", "hz-north-a", "ecs.t6.large", "ClosedWithStock"),
    ("hz-north", "hz-north-a", "ecs.s6.small", "WithStock"),
    ("hz-north", "hz-north-b", "ecs.gn7i.8xlarge", "WithStock"),
    ("hz-north", "hz-north-b", "ecs.sgn7i.2xlarge", "WithoutStock"),
    ("us-east", "us-east-a", "ecs.g7.large", "WithStock"),
    ("us-east", "us-east-a", "ecs.gi7s.16xlarge", "WithStock"),
    ("us-east", "us-east-b", "ecs.gn8v.48xlarge", "WithStock"),
    ("us-east", "us-east-b", "ecs.t6.large", "WithoutStock"),
    ("eu-central", "eu-central-a", "ecs.s6.small", "ClosedWithStock"))

  /** Per-region DescribeAvailableResource payloads (nested zone →
    * AvailableResource → SupportedResource tree), generated from
    * [[availabilityData]]. */
  private[ingest] def availabilityPayloads: Seq[(String, String)] =
    availabilityData.groupBy(_._1).toSeq.map { case (region, rows) =>
      val zones = rows.groupBy(_._2).toSeq.map { case (zone, zrows) =>
        val supported = zrows.map { case (_, _, server, cat) =>
          s"""{"Value": "$server", "Status": "Available", "StatusCategory": "$cat"}"""
        }.mkString(", ")
        s"""{"ZoneId": "$zone", "AvailableResources": {"AvailableResource": [
           |  {"Type": "InstanceType",
           |   "SupportedResources": {"SupportedResource": [$supported]}}]}}""".stripMargin
      }.mkString(", ")
      region -> s"""{"AvailableZones": {"AvailableZone": [$zones]}}"""
    }

  /** Server-price SKU rows — (vm_region_no INTERNAL id, instance_type,
    * hourly price). One row quotes a region the catalog doesn't know
    * (skip + count). Pages are generated from this list. */
  private[ingest] val serverSkuData: Seq[(String, String, Double)] = Seq(
    ("hz-north-na61-a01", "ecs.g7.large", 0.152),
    ("hz-north-na61-a01", "ecs.t6.large", 0.068),
    ("us-east-us44-a01", "ecs.g7.large", 0.171),
    ("us-east-us44-a01", "ecs.gn8v.48xlarge", 12.708),
    ("eu-central-de46-a01", "ecs.s6.small", 0.027),
    ("ap-south-in73-a01", "ecs.g7.large", 0.144))

  /** Storage-price SKU rows — (vm_region_no, datadisk_category,
    * performance level, price, PriceType). Covers every filter rule:
    * non-PL1 flat products and unknown levels drop, `hourPrice` converts. */
  private[ingest] val storageSkuData: Seq[(String, String, String, Double, String)] = Seq(
    ("hz-north-na61-a01", "cloud_essd", "PL0", 0.0001, "hourPrice"),
    ("hz-north-na61-a01", "cloud_essd", "PL1", 0.0739, "monthPrice"),
    ("hz-north-na61-a01", "cloud_essd", "PL2", 0.1132, "monthPrice"),
    ("hz-north-na61-a01", "cloud_essd", "PL3", 0.1956, "monthPrice"),
    ("hz-north-na61-a01", "cloud_essd", "PLX", 0.3, "monthPrice"),
    ("us-east-us44-a01", "cloud_ssd", "PL1", 0.0953, "monthPrice"),
    ("us-east-us44-a01", "cloud_ssd", "PL0", 0.08, "monthPrice"),
    ("eu-central-de46-a01", "cloud_efficiency", "PL1", 0.05, "monthPrice"),
    ("eu-central-de46-a01", "cloud", "PL1", 0.04, "monthPrice"),
    ("ap-south-in73-a01", "cloud_ssd", "PL1", 0.09, "monthPrice"))

  /** Traffic SKU rows — (vm_region_no, tier prices). The first POSITIVE
    * tier is the outbound rate (`_alicloud.py:1404`); inbound is free. */
  private[ingest] val trafficSkuData: Seq[(String, Seq[Double])] = Seq(
    ("hz-north-na61-a01", Seq(0.0, 0.076)),
    ("us-east-us44-a01", Seq(0.0, 0.078)),
    ("eu-central-de46-a01", Seq(0.0, 0.07)))

  /** Build QuerySkuPriceList pages (size 2, chained by NextPageToken) from
    * a row list and a per-row SkuFactorMap/CskuPriceList renderer. */
  private def skuPages[T](rows: Seq[T])(render: T => String): Seq[String] = {
    val groups = rows.grouped(2).toSeq
    groups.zipWithIndex.map { case (g, i) =>
      val token = if (i == groups.size - 1) "" else s"page-${i + 2}"
      s"""{"Data": {"SkuPricePage": {
         |  "TotalCount": ${rows.size}, "NextPageToken": "$token",
         |  "SkuPriceList": [${g.map(render).mkString(", ")}]}}}""".stripMargin
    }
  }

  private[ingest] def serverSkuPages: Seq[String] =
    skuPages(serverSkuData) { case (rno, it, p) =>
      s"""{"SkuFactorMap": {"vm_region_no": "$rno", "instance_type": "$it",
         |  "vm_os_kind": "linux"},
         | "CskuPriceList": [{"Price": "$p", "Currency": "USD",
         |  "PriceType": "hourPrice"}]}""".stripMargin
    }

  private[ingest] def storageSkuPages: Seq[String] =
    skuPages(storageSkuData) { case (rno, cat, pl, p, pt) =>
      s"""{"SkuFactorMap": {"vm_region_no": "$rno", "datadisk_category": "$cat",
         |  "datadisk_performance_level": "$pl"},
         | "CskuPriceList": [{"Price": "$p", "Currency": "USD",
         |  "PriceType": "$pt"}]}""".stripMargin
    }

  private[ingest] def trafficSkuPages: Seq[String] =
    skuPages(trafficSkuData) { case (rno, tiers) =>
      val priceList = tiers.map(p =>
        s"""{"Price": "$p", "Currency": "USD", "PriceType": "hourPrice"}""").mkString(", ")
      s"""{"SkuFactorMap": {"vm_region_no": "$rno"},
         | "CskuPriceList": [$priceList]}""".stripMargin
    }

  /** DescribeInstanceTypes pages (NextToken-chained). Hand-written JSON;
    * the companion mirrors the literals as VALUES — self-checking
    * duplication, drift turns the gate rows red. */
  private[ingest] val instanceTypePages: Seq[String] = Seq(
    """{"NextToken": "page-2", "InstanceTypes": {"InstanceType": [
      |  {"InstanceTypeId": "ecs.g7.large", "InstanceTypeFamily": "ecs.g7",
      |   "CpuCoreCount": 2, "MemorySize": 8.0,
      |   "PhysicalProcessorModel": "Intel Xeon(Ice Lake) Platinum 8369B",
      |   "CpuSpeedFrequency": 2.7, "CpuArchitecture": "X86",
      |   "InstanceCategory": "General-purpose", "BaselineCredit": 0,
      |   "GPUSpec": "", "GPUAmount": 0, "GPUMemorySize": 0,
      |   "LocalStorageAmount": 0, "LocalStorageCapacity": 0,
      |   "LocalStorageCategory": "", "InstanceBandwidthRx": 1228800,
      |   "NetworkInfo": {"BandwidthWeighting": {"WeightingInfos": {"WeightingInfo": [
      |     {"VpcBandwidth": 2560000, "EbsBandwidth": 250000000},
      |     {"VpcBurstBandwidth": 5120000, "EbsBurstBandwidth": 500000000}]}}}},
      |  {"InstanceTypeId": "ecs.t6.large", "InstanceTypeFamily": "ecs.t6",
      |   "CpuCoreCount": 2, "MemorySize": 8.0,
      |   "PhysicalProcessorModel": "Intel Xeon(Skylake) Platinum 8163",
      |   "CpuSpeedFrequency": 2.5, "CpuArchitecture": "X86",
      |   "InstanceCategory": "General-purpose", "BaselineCredit": 40,
      |   "GPUSpec": "", "GPUAmount": 0, "GPUMemorySize": 0,
      |   "LocalStorageAmount": 0, "LocalStorageCapacity": 0,
      |   "LocalStorageCategory": "", "InstanceBandwidthRx": 81920},
      |  {"InstanceTypeId": "ecs.s6.small", "InstanceTypeFamily": "ecs.s6",
      |   "CpuCoreCount": 1, "MemorySize": 2.0,
      |   "PhysicalProcessorModel": "Intel Xeon(Cascade Lake) Platinum 8269CY",
      |   "CpuSpeedFrequency": 2.5, "CpuArchitecture": "X86",
      |   "InstanceCategory": "Shared", "BaselineCredit": 0,
      |   "GPUSpec": "", "GPUAmount": 0, "GPUMemorySize": 0,
      |   "LocalStorageAmount": 0, "LocalStorageCapacity": 0,
      |   "LocalStorageCategory": "", "InstanceBandwidthRx": 102400},
      |  {"InstanceTypeId": "ecs.gn7i.8xlarge", "InstanceTypeFamily": "ecs.gn7i",
      |   "CpuCoreCount": 32, "MemorySize": 188.0,
      |   "PhysicalProcessorModel": "Intel Xeon(Ice Lake) Platinum 8369B",
      |   "CpuSpeedFrequency": 2.9, "CpuArchitecture": "X86",
      |   "InstanceCategory": "GPU-accelerated", "BaselineCredit": 0,
      |   "GPUSpec": "NVIDIA A10", "GPUAmount": 1, "GPUMemorySize": 24,
      |   "LocalStorageAmount": 0, "LocalStorageCapacity": 0,
      |   "LocalStorageCategory": "", "InstanceBandwidthRx": 16384000},
      |  {"InstanceTypeId": "ecs.gn8v.48xlarge", "InstanceTypeFamily": "ecs.gn8v",
      |   "CpuCoreCount": 192, "MemorySize": 1024.0,
      |   "PhysicalProcessorModel": "Intel Xeon(Sapphire Rapids) Platinum 8475B",
      |   "CpuSpeedFrequency": 2.7, "CpuArchitecture": "X86",
      |   "InstanceCategory": "GPU-accelerated", "BaselineCredit": 0,
      |   "GPUSpec": "NVIDIA L20", "GPUAmount": 8, "GPUMemorySize": 48,
      |   "LocalStorageAmount": 0, "LocalStorageCapacity": 0,
      |   "LocalStorageCategory": "", "InstanceBandwidthRx": 102400000}
      |]}}""".stripMargin,
    """{"NextToken": "", "InstanceTypes": {"InstanceType": [
      |  {"InstanceTypeId": "ecs.sgn7i.2xlarge", "InstanceTypeFamily": "ecs.sgn7i",
      |   "CpuCoreCount": 8, "MemorySize": 31.0,
      |   "PhysicalProcessorModel": "Intel Xeon(Ice Lake) Platinum 8369B",
      |   "CpuSpeedFrequency": 2.9, "CpuArchitecture": "X86",
      |   "InstanceCategory": "GPU-accelerated", "BaselineCredit": 0,
      |   "GPUSpec": "NVIDIA A10*1/12", "GPUAmount": 1, "GPUMemorySize": 2,
      |   "LocalStorageAmount": 0, "LocalStorageCapacity": 0,
      |   "LocalStorageCategory": "", "InstanceBandwidthRx": 4096000},
      |  {"InstanceTypeId": "ecs.gi7s.16xlarge", "InstanceTypeFamily": "ecs.gi7s",
      |   "CpuCoreCount": 64, "MemorySize": 256.0,
      |   "PhysicalProcessorModel": "Intel Xeon(Sapphire Rapids) Platinum 8475B",
      |   "CpuSpeedFrequency": 2.7, "CpuArchitecture": "X86",
      |   "InstanceCategory": "GPU-accelerated", "BaselineCredit": 0,
      |   "GPUSpec": "G49", "GPUAmount": 4, "GPUMemorySize": 48,
      |   "LocalStorageAmount": 0, "LocalStorageCapacity": 0,
      |   "LocalStorageCategory": "", "InstanceBandwidthRx": 32768000},
      |  {"InstanceTypeId": "ecs.i4.4xlarge", "InstanceTypeFamily": "ecs.i4",
      |   "CpuCoreCount": 16, "MemorySize": 128.0,
      |   "PhysicalProcessorModel": "YiTian 710",
      |   "CpuSpeedFrequency": 2.75, "CpuArchitecture": "ARM",
      |   "InstanceCategory": "Storage-optimized", "BaselineCredit": 0,
      |   "GPUSpec": "", "GPUAmount": 0, "GPUMemorySize": 0,
      |   "LocalStorageAmount": 2, "LocalStorageCapacity": 1788,
      |   "LocalStorageCategory": "local_ssd_pro", "InstanceBandwidthRx": 8192000}
      |]}}""".stripMargin)

  /** DescribePrice-shaped spot quotes — (region, zone, server, has the
    * "Preemptible Instance discount" rule, instanceType trade price).
    * Quotes WITHOUT the discount rule are regular prices and drop
    * (`_alicloud.py:1170-1180`). */
  private[ingest] val spotQuoteData: Seq[(String, String, String, Boolean, Double)] = Seq(
    ("us-east", "us-east-b", "ecs.gn8v.48xlarge", true, 3.812),
    ("hz-north", "hz-north-a", "ecs.g7.large", false, 0.031),
    ("us-east", "us-east-a", "ecs.g7.large", true, 0.049))

  private[ingest] def spotQuotePayloads: Seq[(String, String, String, String)] =
    spotQuoteData.map { case (region, zone, server, discounted, price) =>
      val rule = if (discounted) "Preemptible Instance discount" else "Standard price"
      (region, zone, server,
        s"""{"PriceInfo": {
           |  "Rules": {"Rule": [{"Description": "$rule"}]},
           |  "Price": {"Currency": "USD", "DetailInfos": {"DetailInfo": [
           |    {"Resource": "instanceType", "TradePrice": $price},
           |    {"Resource": "systemDisk", "TradePrice": 0.012}]}}}}""".stripMargin)
    }

  /** Block-storage catalog (`disk_info`, `_alicloud.py:1249-1341`):
    * (name, min GiB, max GiB, max iops, max throughput, description). */
  private[ingest] val diskInfo: Seq[(String, Long, Long, Long, Long, String)] = Seq(
    ("cloud_essd-pl0", 1L, 65536L, 10000L, 180L, "Enterprise SSD with performance level 0."),
    ("cloud_essd-pl1", 20L, 65536L, 50000L, 350L, "Enterprise SSD with performance level 1."),
    ("cloud_essd-pl2", 461L, 65536L, 100000L, 750L, "Enterprise SSD with performance level 2."),
    ("cloud_essd-pl3", 1261L, 65536L, 1000000L, 4000L, "Enterprise SSD with performance level 3."),
    ("cloud_ssd", 20L, 32768L, 25000L, 300L, "Standard SSD."),
    ("cloud_efficiency", 20L, 32768L, 5000L, 140L, "Ultra Disk, older generation."),
    ("cloud", 5L, 2000L, 300L, 40L, "Lowest cost HDD."))

  // ----------------------------------------------------------- raw parses

  private val cskuType = ArrayType(new StructType()
    .add("Price", StringType).add("Currency", StringType).add("PriceType", StringType))

  private def skuSchema(factors: (String, DataType)*): StructType = {
    val fm = factors.foldLeft(new StructType()) { case (st, (n, t)) => st.add(n, t) }
    new StructType().add("Data", new StructType().add("SkuPricePage", new StructType()
      .add("TotalCount", IntegerType).add("NextPageToken", StringType)
      .add("SkuPriceList", ArrayType(new StructType()
        .add("SkuFactorMap", fm).add("CskuPriceList", cskuType)))))
  }

  /** Parse + validate a page chain: every page must parse, and the union's
    * row count must equal each page's declared TotalCount — the batch
    * analogue of following NextPageToken to exhaustion. */
  private def skuRows(spark: SparkSession, pages: Seq[String], schema: StructType,
                      factorCols: Seq[String]): DataFrame = {
    import spark.implicits._
    val parsed = pages.toDF("payload")
      .select(from_json(col("payload"), schema).getField("Data")
        .getField("SkuPricePage").as("pg"))
    val exploded = parsed
      .select(col("pg.TotalCount").as("total"),
        explode(col("pg.SkuPriceList")).as("sku"))
    val selected = exploded.select(
      col("total") +:
      factorCols.map(f => col(s"sku.SkuFactorMap.$f").as(f)) :+
      col("sku.CskuPriceList").as("prices"): _*)
    val declared = selected.agg(max("total"), count(lit(1))).head()
    require(declared.getInt(0) == declared.getLong(1),
      s"SKU page chain incomplete: declared ${declared.getInt(0)} rows, " +
        s"parsed ${declared.getLong(1)}")
    selected.drop("total")
  }

  /** (alias_id → region_id) lookup, including the identity mapping —
    * `get_region_by_id` accepts both (`_alicloud.py` via utils). */
  private[ingest] def aliasRows(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val pairs = regionMeta.flatMap { case (id, _, _, _, _, _, aliases) =>
      (id +: aliases).map(_ -> id)
    }
    pairs.toDF("alias_id", "region_id")
  }

  private[ingest] def zoneRows(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val schema = new StructType().add("Zones", new StructType()
      .add("Zone", ArrayType(new StructType()
        .add("ZoneId", StringType).add("LocalName", StringType))))
    zonesPayloads.toDF("region_id", "payload")
      .select(col("region_id"),
        explode(from_json(col("payload"), schema).getField("Zones").getField("Zone")).as("z"))
      .select(col("region_id"), col("z.ZoneId").as("zone_id"),
        col("z.LocalName").as("zone_name"))
  }

  /** Flatten the nested availability tree back to (region, zone, server,
    * status_category) — only the InstanceType resource branch, mirroring
    * `_is_resource_available`'s path. */
  private[ingest] def availabilityRows(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val schema = new StructType().add("AvailableZones", new StructType()
      .add("AvailableZone", ArrayType(new StructType()
        .add("ZoneId", StringType)
        .add("AvailableResources", new StructType()
          .add("AvailableResource", ArrayType(new StructType()
            .add("Type", StringType)
            .add("SupportedResources", new StructType()
              .add("SupportedResource", ArrayType(new StructType()
                .add("Value", StringType).add("Status", StringType)
                .add("StatusCategory", StringType))))))))))
    availabilityPayloads.toDF("region_id", "payload")
      .select(col("region_id"),
        explode(from_json(col("payload"), schema)
          .getField("AvailableZones").getField("AvailableZone")).as("z"))
      .select(col("region_id"), col("z.ZoneId").as("zone_id"),
        explode(col("z.AvailableResources.AvailableResource")).as("r"))
      .filter(col("r.Type") === "InstanceType")
      .select(col("region_id"), col("zone_id"),
        explode(col("r.SupportedResources.SupportedResource")).as("s"))
      .select(col("region_id"), col("zone_id"),
        col("s.Value").as("server_id"),
        col("s.StatusCategory").as("status_category"))
  }

  private val weightingType = new StructType().add("BandwidthWeighting",
    new StructType().add("WeightingInfos", new StructType()
      .add("WeightingInfo", ArrayType(new StructType()
        .add("VpcBandwidth", LongType).add("VpcBurstBandwidth", LongType)
        .add("EbsBandwidth", LongType).add("EbsBurstBandwidth", LongType)))))

  private val instanceTypeSchema = new StructType()
    .add("NextToken", StringType)
    .add("InstanceTypes", new StructType().add("InstanceType", ArrayType(new StructType()
      .add("InstanceTypeId", StringType).add("InstanceTypeFamily", StringType)
      .add("CpuCoreCount", IntegerType).add("MemorySize", DoubleType)
      .add("PhysicalProcessorModel", StringType)
      .add("CpuSpeedFrequency", DoubleType).add("CpuArchitecture", StringType)
      .add("InstanceCategory", StringType).add("BaselineCredit", IntegerType)
      .add("GPUSpec", StringType).add("GPUAmount", IntegerType)
      .add("GPUMemorySize", IntegerType)
      .add("LocalStorageAmount", IntegerType).add("LocalStorageCapacity", LongType)
      .add("LocalStorageCategory", StringType)
      .add("InstanceBandwidthRx", LongType)
      .add("NetworkInfo", weightingType))))

  private[ingest] def instanceTypeRows(spark: SparkSession): DataFrame = {
    import spark.implicits._
    instanceTypePages.toDF("payload")
      .select(explode(from_json(col("payload"), instanceTypeSchema)
        .getField("InstanceTypes").getField("InstanceType")).as("it"))
      .select(col("it.*"))
  }

  // --------------------------------------------------- GPU spec standardize

  /** GPU count from model-name suffixes (`_standardize_gpu_count`,
    * `inspector.py:907-947`): `"*1/12"` → 0.0833, `"/4"` → 0.25,
    * `"*2"` → 2, no suffix → the API's count field. */
  private[ingest] def gpuCountCol(spec: Column, amount: Column): Column = {
    val s = trim(spec)
    val den = nullif(regexp_extract(s, "/(\\d+)$", 1), lit(""))
    val num = coalesce(nullif(regexp_extract(s, "\\*(\\d+)/\\d+$", 1), lit("")), lit("1"))
    val mult = nullif(regexp_extract(s, "\\*(\\d+)$", 1), lit(""))
    when(s.isNull || s === "", amount.cast("double"))
      .when(den.isNotNull, round(num.cast("double") / den.cast("double"), 4))
      .when(mult.isNotNull, mult.cast("double"))
      .otherwise(amount.cast("double"))
  }

  /** Vendor-prefix and fraction-suffix strip (`_standardize_gpu_model`,
    * `inspector.py:950-995`, the subset these fixtures reach). */
  private[ingest] def gpuBaseModelCol(spec: Column): Column = {
    val t = trim(spec)
    val stripped = regexp_replace(t,
      "^(NVIDIA |Tesla |Nvidia Tesla |Radeon Pro |AMD |Quadro |Gaudi |GeeForce )", "")
    when(t.isNull || t.isin("", "0", "NULL", "NA", "N/A"), lit(null).cast(StringType))
      .otherwise(regexp_replace(regexp_replace(stripped, "(\\*1)?/\\d+$", ""), "\\*1$", ""))
  }

  // ---------------------------------------------------------- inventories

  def inventoryComplianceFrameworks(spark: SparkSession): DataFrame =
    SeedTables.complianceFrameworks(spark)

  def inventoryCountries(spark: SparkSession): DataFrame =
    SeedTables.countries(spark)

  def inventoryRegions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val schema = new StructType().add("Regions", new StructType()
      .add("Region", ArrayType(new StructType()
        .add("RegionId", StringType).add("LocalName", StringType))))
    val api = Seq(regionsPayload).toDF("payload")
      .select(explode(from_json(col("payload"), schema)
        .getField("Regions").getField("Region")).as("r"))
      .select(col("r.RegionId").as("region_id"), col("r.LocalName").as("name"))
    val meta = broadcast(regionMeta
      .map { case (id, city, cc, lon, lat, fy, aliases) => (id, city, cc, lon, lat, fy, aliases) }
      .toDF("region_id", "city", "country_id", "lon", "lat", "founding_year", "aliases"))
    withVendor(api.join(meta, Seq("region_id"))
      .select(col("region_id"), col("name"),
        col("region_id").as("api_reference"),
        concat(col("city"), lit(" ("), col("country_id"), lit(")")).as("display_name"),
        col("aliases"), col("country_id"), col("city"),
        col("lon"), col("lat"), col("founding_year")))
  }

  def inventoryZones(spark: SparkSession): DataFrame =
    withVendor(zoneRows(spark)
      .select(col("region_id"), col("zone_id"),
        col("zone_name").as("name"), col("zone_id").as("api_reference"),
        col("zone_name").as("display_name")))

  def inventoryServers(spark: SparkSession): DataFrame = {
    val wi = col("NetworkInfo.BandwidthWeighting.WeightingInfos.WeightingInfo")
    // every non-null Vpc[Burst]Bandwidth across weighting rows, Kbit → Gbps
    val vpcSpeeds = flatten(transform(wi, w =>
      filter(array(w.getField("VpcBandwidth"), w.getField("VpcBurstBandwidth")),
        v => v.isNotNull)))
    // every non-null Ebs[Burst]Bandwidth, Bps → Gbps per the reference's
    // formula (`_alicloud.py:893-903`)
    val ebsSpeeds = transform(
      flatten(transform(wi, w =>
        filter(array(w.getField("EbsBandwidth"), w.getField("EbsBurstBandwidth")),
          v => v.isNotNull))),
      v => round(v * 8 / 1000000.0).cast("long"))
    // a server is active if WithStock ANYWHERE (`_alicloud.py:986-1000`)
    val activeServers = broadcast(availabilityRows(spark)
      .filter(col("status_category") === "WithStock")
      .select(col("server_id").as("InstanceTypeId")).distinct()
      .withColumn("__avail", lit(1)))
    val base = instanceTypeRows(spark)
      .join(activeServers, Seq("InstanceTypeId"), "left")
      .withColumn("m0", gpuBaseModelCol(col("GPUSpec")))
      .withColumn("gpu_count_eff", gpuCountCol(col("GPUSpec"), col("GPUAmount")))
      // GiB → MiB; per-GPU for the min column
      .withColumn("per_gpu_mib", (col("GPUMemorySize") * 1024).cast("long"))
    withVendor(base.select(
      col("InstanceTypeId").as("server_id"),
      col("InstanceTypeId").as("name"),
      col("InstanceTypeId").as("api_reference"),
      col("InstanceTypeId").as("display_name"),
      col("InstanceTypeFamily").as("family"),
      col("CpuCoreCount").as("vcpus"),
      lit("KVM").as("hypervisor"),
      // BaselineCredit beats the Shared-category check (`:433-446`)
      when(col("BaselineCredit") > 0, "burstable")
        .when(col("InstanceCategory") === "Shared", "shared")
        .otherwise("dedicated").as("cpu_allocation"),
      col("CpuCoreCount").as("cpu_cores"),
      nullif(col("CpuSpeedFrequency"), lit(0.0)).as("cpu_speed"),
      when(col("CpuArchitecture") === "ARM", "arm64").otherwise("x86_64")
        .as("cpu_architecture"),
      VendorIngest.standardizeManufacturer(
        element_at(split(col("PhysicalProcessorModel"), " "), 1)).as("cpu_manufacturer"),
      VendorIngest.standardizeCpuModel(col("PhysicalProcessorModel")).as("cpu_model"),
      (col("MemorySize") * 1024).cast("long").as("memory_amount"),
      col("gpu_count_eff").as("gpu_count"),
      col("per_gpu_mib").as("gpu_memory_min"),
      // TOTAL for fractional/single GPUs, PER-GPU for multiples (`:936-941`)
      when(col("gpu_count_eff") >= 1,
        (col("gpu_count_eff") * col("per_gpu_mib")).cast("long"))
        .otherwise(col("per_gpu_mib")).as("gpu_memory_total"),
      // only the internal-name rules assign manufacturer/family (`:945-968`)
      when(col("m0").startsWith("G49") || col("m0").isin("L20", "L20N", "vGPU8"),
        "NVIDIA").as("gpu_manufacturer"),
      when(col("m0").startsWith("G49") || col("m0").isin("L20", "vGPU8"),
        "Ada Lovelace")
        .when(col("m0") === "L20N", "Blackwell").as("gpu_family"),
      when(col("m0").startsWith("G49") || col("m0").startsWith("GPU H") ||
        col("m0").isin("L20N", "vGPU8"), lit(null).cast(StringType))
        .otherwise(col("m0")).as("gpu_model"),
      // GiB → GB, truncated (`int(...)`, `:929-934`)
      floor(col("LocalStorageAmount") * col("LocalStorageCapacity") *
        1073741824.0 / 1000000000.0).cast("long").as("storage_size"),
      when(col("LocalStorageCategory") === "local_ssd_pro", "ssd")
        .when(col("LocalStorageCategory") === "local_hdd_pro", "hdd")
        .as("storage_type"),
      nullif(col("InstanceBandwidthRx") / 1024.0 / 1000, lit(0.0)).as("network_speed"),
      transform(vpcSpeeds, v => v / 1024.0 / 1000).as("__vpc"),
      ebsSpeeds.as("__ebs"),
      lit(0.0).as("inbound_traffic"), lit(0.0).as("outbound_traffic"),
      lit(0).as("ipv4"),
      when(col("__avail") === 1, "active").otherwise("inactive").as("status"))
      .withColumn("network_speed_max", array_max(col("__vpc")))
      .withColumn("network_storage_speed_baseline", array_min(col("__ebs")))
      .withColumn("network_storage_speed_max", array_max(col("__ebs")))
      .drop("__vpc", "__ebs"))
  }

  def inventoryServerPrices(spark: SparkSession): DataFrame =
    serverPricesFrame(spark)

  /** SKU × alias-resolve × zone fan-out × availability annotation. */
  private[ingest] def serverPricesFrame(spark: SparkSession): DataFrame = {
    val skus = skuRows(spark, serverSkuPages,
      skuSchema("vm_region_no" -> StringType, "instance_type" -> StringType,
        "vm_os_kind" -> StringType),
      Seq("vm_region_no", "instance_type", "vm_os_kind"))
    val resolved = skus
      .join(broadcast(aliasRows(spark)), col("vm_region_no") === col("alias_id"))
    val fanned = resolved
      .join(broadcast(zoneRows(spark)), Seq("region_id"))
    val avail = broadcast(availabilityRows(spark))
    withVendor(fanned
      .join(avail,
        fanned("region_id") === avail("region_id") &&
          fanned("zone_id") === avail("zone_id") &&
          fanned("instance_type") === avail("server_id"), "left")
      .select(fanned("region_id"), fanned("zone_id"),
        col("instance_type").as("server_id"),
        col("vm_os_kind").as("operating_system"),
        lit("ondemand").as("allocation"), lit("hour").as("unit"),
        element_at(col("prices"), 1).getField("Price").cast("double").as("price"),
        lit(0.0).as("price_upfront"),
        element_at(col("prices"), 1).getField("Currency").as("currency"),
        when(col("status_category") === "WithStock", "active")
          .otherwise("inactive").as("status")))
  }

  /** Spot quotes gated on the preemptible-discount rule; the price is the
    * instanceType detail line (`_alicloud.py:1170-1205`). */
  def inventoryServerPricesSpot(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val schema = new StructType().add("PriceInfo", new StructType()
      .add("Rules", new StructType().add("Rule", ArrayType(new StructType()
        .add("Description", StringType))))
      .add("Price", new StructType()
        .add("Currency", StringType)
        .add("DetailInfos", new StructType().add("DetailInfo", ArrayType(new StructType()
          .add("Resource", StringType).add("TradePrice", DoubleType))))))
    val parsed = spotQuotePayloads.toDF("region_id", "zone_id", "server_id", "payload")
      .withColumn("pi", from_json(col("payload"), schema).getField("PriceInfo"))
    withVendor(parsed
      .filter(exists(col("pi.Rules.Rule"),
        r => r.getField("Description") === "Preemptible Instance discount"))
      .withColumn("detail", element_at(
        filter(col("pi.Price.DetailInfos.DetailInfo"),
          d => d.getField("Resource") === "instanceType"), 1))
      .select(col("region_id"), col("zone_id"), col("server_id"),
        lit("linux").as("operating_system"), lit("spot").as("allocation"),
        lit("hour").as("unit"), col("detail.TradePrice").as("price"),
        lit(0.0).as("price_upfront"),
        col("pi.Price.Currency").as("currency"),
        lit("active").as("status")))
  }

  def inventoryStorages(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val gibToGb = 1073741824.0 / 1000000000.0
    withVendor(diskInfo
      .toDF("storage_id", "min_gib", "max_gib", "max_iops", "max_throughput", "description")
      .select(col("storage_id"), col("storage_id").as("name"), col("description"),
        when(col("storage_id") === "cloud", "hdd").otherwise("ssd").as("storage_type"),
        col("max_iops"), col("max_throughput"),
        round(col("min_gib") * gibToGb).cast("long").as("min_size"),
        round(col("max_gib") * gibToGb).cast("long").as("max_size")))
  }

  /** Storage SKUs: PL filter rules + per-row hourPrice → gb_month ×730
    * (`_alicloud.py:1343-1387`). */
  def inventoryStoragePrices(spark: SparkSession): DataFrame = {
    val flat = Seq("cloud", "cloud_ssd", "cloud_efficiency")
    val skus = skuRows(spark, storageSkuPages,
      skuSchema("vm_region_no" -> StringType, "datadisk_category" -> StringType,
        "datadisk_performance_level" -> StringType),
      Seq("vm_region_no", "datadisk_category", "datadisk_performance_level"))
    val kept = skus.filter(
      (col("datadisk_category").isin(flat: _*) &&
        col("datadisk_performance_level") === "PL1") ||
      (!col("datadisk_category").isin(flat: _*) &&
        col("datadisk_performance_level").isin("PL0", "PL1", "PL2", "PL3")))
    val priced = kept
      .withColumn("storage_id",
        when(col("datadisk_category").isin(flat: _*), col("datadisk_category"))
          .otherwise(concat(col("datadisk_category"), lit("-"),
            lower(col("datadisk_performance_level")))))
      .withColumn("raw_price",
        element_at(col("prices"), 1).getField("Price").cast("double"))
      .withColumn("price",
        when(element_at(col("prices"), 1).getField("PriceType") === "hourPrice",
          col("raw_price") * 730).otherwise(col("raw_price")))
    withVendor(priced
      .join(broadcast(aliasRows(spark)), col("vm_region_no") === col("alias_id"))
      .select(col("region_id"), col("storage_id"), lit("gb_month").as("unit"),
        col("price"),
        element_at(col("prices"), 1).getField("Currency").as("currency")))
  }

  def inventoryDatabases(spark: SparkSession): DataFrame =
    VendorInventory.empty(spark, "database")

  def inventoryDatabasePrices(spark: SparkSession): DataFrame =
    VendorInventory.empty(spark, "database_price")

  /** Outbound = first POSITIVE tier in the SKU's price list; inbound free
    * (`_alicloud.py:1389-1436`). */
  def inventoryTrafficPrices(spark: SparkSession): DataFrame = {
    val skus = skuRows(spark, trafficSkuPages,
      skuSchema("vm_region_no" -> StringType), Seq("vm_region_no"))
    val resolved = skus
      .join(broadcast(aliasRows(spark)), col("vm_region_no") === col("alias_id"))
      .withColumn("pick", element_at(
        filter(col("prices"), p => p.getField("Price").cast("double") > 0), 1))
    val out = resolved.select(col("region_id"), lit("out").as("direction"),
      col("pick.Price").cast("double").as("price"),
      col("pick.Currency").as("currency"))
    val in = resolved.select(col("region_id"), lit("in").as("direction"),
      lit(0.0).as("price"), col("pick.Currency").as("currency"))
    withVendor(out.unionByName(in)
      .withColumn("unit", lit("gb_month"))
      .withColumn("price_tiered",
        array().cast("array<struct<lower:double,upper:double,price:double>>")))
  }

  /** Static IPv4 addresses are free (`_alicloud.py:1439-1459`). */
  def inventoryIpv4Prices(spark: SparkSession): DataFrame =
    withVendor(aliasRows(spark).select(col("region_id")).distinct()
      .select(col("region_id"), lit(0.0).as("price"),
        lit("month").as("unit"), lit("USD").as("currency")))

  def inventoryBenchmarkScores(spark: SparkSession): DataFrame =
    VendorInventory.empty(spark, "benchmark_score")

  override def inventoryVendors(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((vendorId, "Sku Cloud", "CN", 2009))
      .toDF("vendor_id", "name", "country_id", "founding_year")
  }
}

object SkuVendor {
  private def esc(s: String) = s.replace("'", "''")
  private val inst = new SkuVendor()

  /** SKU price rows as VALUES — (vm_region_no, server_id, price). */
  def serverSkuValuesSql: String =
    inst.serverSkuData.map { case (rno, it, p) =>
      s"('${esc(rno)}', '${esc(it)}', $p)"
    }.mkString(", ")

  /** Alias → region rows (incl. identity) as VALUES. */
  def aliasValuesSql: String =
    inst.regionMeta.flatMap { case (id, _, _, _, _, _, aliases) =>
      (id +: aliases).map(a => s"('${esc(a)}', '${esc(id)}')")
    }.mkString(", ")

  /** (region_id, zone_id) as VALUES. */
  def zoneValuesSql: String =
    inst.zoneRowsData.map { case (r, z, _) => s"('${esc(r)}', '${esc(z)}')" }
      .mkString(", ")

  /** Availability triples as VALUES — (region_id, zone_id, server_id,
    * status_category); the SAME list the nested payloads are generated
    * from, so the oracle cannot drift from the parsed tree. */
  def availabilityValuesSql: String =
    inst.availabilityData.map { case (r, z, s, c) =>
      s"('${esc(r)}', '${esc(z)}', '${esc(s)}', '${esc(c)}')"
    }.mkString(", ")

  /** Instance-type fields as VALUES — (server_id, family, vcpus, mem_gib,
    * category, credit, arch, freq, gpu_spec, gpu_amount, gpu_mem_gib,
    * ls_amount, ls_capacity, ls_category, bw_rx). Hand-mirrored from the
    * JSON pages: drift turns the gate rows red. */
  def instanceTypeValuesSql: String = Seq(
    ("ecs.g7.large", "ecs.g7", 2, 8.0, "General-purpose", 0, "X86", 2.7,
      "", 0, 0, 0, 0L, "", 1228800L),
    ("ecs.t6.large", "ecs.t6", 2, 8.0, "General-purpose", 40, "X86", 2.5,
      "", 0, 0, 0, 0L, "", 81920L),
    ("ecs.s6.small", "ecs.s6", 1, 2.0, "Shared", 0, "X86", 2.5,
      "", 0, 0, 0, 0L, "", 102400L),
    ("ecs.gn7i.8xlarge", "ecs.gn7i", 32, 188.0, "GPU-accelerated", 0, "X86", 2.9,
      "NVIDIA A10", 1, 24, 0, 0L, "", 16384000L),
    ("ecs.gn8v.48xlarge", "ecs.gn8v", 192, 1024.0, "GPU-accelerated", 0, "X86", 2.7,
      "NVIDIA L20", 8, 48, 0, 0L, "", 102400000L),
    ("ecs.sgn7i.2xlarge", "ecs.sgn7i", 8, 31.0, "GPU-accelerated", 0, "X86", 2.9,
      "NVIDIA A10*1/12", 1, 2, 0, 0L, "", 4096000L),
    ("ecs.gi7s.16xlarge", "ecs.gi7s", 64, 256.0, "GPU-accelerated", 0, "X86", 2.7,
      "G49", 4, 48, 0, 0L, "", 32768000L),
    ("ecs.i4.4xlarge", "ecs.i4", 16, 128.0, "Storage-optimized", 0, "ARM", 2.75,
      "", 0, 0, 2, 1788L, "local_ssd_pro", 8192000L))
    .map { case (id, fam, cpu, mem, cat, credit, arch, freq,
                 spec, amt, gmem, lsa, lsc, lscat, rx) =>
      s"('${esc(id)}', '${esc(fam)}', $cpu, $mem, '${esc(cat)}', $credit, " +
        s"'$arch', $freq, '${esc(spec)}', $amt, $gmem, $lsa, $lsc, " +
        s"'${esc(lscat)}', $rx)"
    }.mkString(", ")

  /** Bandwidth-weighting rows as VALUES — (server_id, vpc_bw, vpc_burst,
    * ebs_bw, ebs_burst), one row per WeightingInfo entry. */
  def weightingValuesSql: String = Seq(
    ("ecs.g7.large", Some(2560000L), None, Some(250000000L), None),
    ("ecs.g7.large", None, Some(5120000L), None, Some(500000000L)))
    .map { case (id, a, b, c, d) =>
      def o(v: Option[Long]) = v.map(_.toString).getOrElse("NULL")
      s"('${esc(id)}', ${o(a)}, ${o(b)}, ${o(c)}, ${o(d)})"
    }.mkString(", ")

  /** Storage SKU rows as VALUES — (vm_region_no, category, pl, price,
    * price_type). */
  def storageSkuValuesSql: String =
    inst.storageSkuData.map { case (rno, cat, pl, p, pt) =>
      s"('${esc(rno)}', '${esc(cat)}', '${esc(pl)}', $p, '${esc(pt)}')"
    }.mkString(", ")
}
