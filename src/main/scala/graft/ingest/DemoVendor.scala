package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A self-contained [[VendorInventory]] implementation over in-code fixture
  * payloads (the unit-test role the reference fills with mocked SDK
  * responses). Demonstrates the transform chain a real vendor module uses:
  * terms-JSON price extraction, alias joins, zone fan-out, annotation. */
class DemoVendor extends VendorInventory {
  val vendorId = "demo"

  private def terms(p: String) =
    s"""{"OnDemand": {"t": {"priceDimensions": {"d": {"pricePerUnit": {"USD": "$p"}}}}}}"""

  private def withVendor(df: DataFrame): DataFrame =
    df.withColumn("vendor_id", lit(vendorId))

  def inventoryComplianceFrameworks(spark: SparkSession): DataFrame =
    SeedTables.complianceFrameworks(spark)

  def inventoryCountries(spark: SparkSession): DataFrame =
    SeedTables.countries(spark)

  def inventoryRegions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    withVendor(Seq(
      ("dc-east", "East", Seq("East Coast"), "US", true),
      ("dc-west", "West", Seq.empty[String], "US", false))
      .toDF("region_id", "name", "aliases", "country_id", "green_energy"))
  }

  def inventoryZones(spark: SparkSession): DataFrame = {
    import spark.implicits._
    withVendor(Seq(
      ("dc-east", "dc-east-a", "a"), ("dc-east", "dc-east-b", "b"),
      ("dc-west", "dc-west-a", "a"))
      .toDF("region_id", "zone_id", "name"))
  }

  def inventoryServers(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val raw = Seq(
      ("s1.large", 2, 8192L, "Intel(R) Xeon(R) CPU @ 2.50GHz", "intel corp"),
      ("s1g.large", 2, 8192L, "Neoverse N1", "Annapurna Labs"),
      ("s2.xlarge", 4, 16384L, "AMD EPYC 7571 Processor", "amd"))
      .toDF("server_id", "vcpus", "memory_mib", "cpu_model_raw", "cpu_mfr_raw")
    withVendor(raw
      .withColumn("memory_amount", (col("memory_mib") * lit(graft.ops.Cols.MibToMb)).cast("long"))
      .withColumn("cpu_model", VendorIngest.standardizeCpuModel(col("cpu_model_raw")))
      .withColumn("cpu_manufacturer", VendorIngest.standardizeManufacturer(col("cpu_mfr_raw")))
      .withColumn("description",
        VendorIngest.annotateInstanceType(col("server_id")).getField("description"))
      .drop("memory_mib", "cpu_model_raw", "cpu_mfr_raw"))
  }

  def inventoryServerPrices(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val products = Seq(
      ("s1.large", "East Coast", terms("0.10")), // resolves via alias
      ("s1g.large", "East", terms("0.08")), // resolves via name
      ("s2.xlarge", "West", terms("0.40")))
      .toDF("server_id", "location", "terms")
    val offerings = Seq(
      ("s1.large", "dc-east", "dc-east-a"), ("s1.large", "dc-east", "dc-east-b"),
      ("s1g.large", "dc-east", "dc-east-a"), ("s2.xlarge", "dc-west", "dc-west-a"))
      .toDF("server_id", "region_id", "zone_id")
    val priced = VendorIngest.joinRegionByAlias(products,
        inventoryRegions(spark).select(col("region_id"), col("name"), col("aliases")), "location")
      .withColumn("price", VendorIngest.extractOnDemandPrice(col("terms")))
      .withColumn("currency", VendorIngest.extractCurrency(col("terms")))
    withVendor(priced.join(offerings, Seq("server_id", "region_id"))
      .withColumn("operating_system", lit("linux"))
      .withColumn("allocation", lit("ondemand"))
      .withColumn("unit", lit("hour"))
      .select("server_id", "region_id", "zone_id", "operating_system",
        "allocation", "unit", "price", "currency"))
  }

  def inventoryServerPricesSpot(spark: SparkSession): DataFrame = {
    import spark.implicits._
    withVendor(Seq(
      ("s1.large", "dc-east", "dc-east-a", 0.031, "2026-01-01 00:00:00"),
      ("s1.large", "dc-east", "dc-east-a", 0.033, "2026-01-01 06:00:00"))
      .toDF("server_id", "region_id", "zone_id", "price", "ts")
      .withColumn("observed_at", col("ts").cast("timestamp")).drop("ts")
      .withColumn("operating_system", lit("linux"))
      .withColumn("allocation", lit("spot"))
      .withColumn("unit", lit("hour"))
      .withColumn("currency", lit("USD")))
  }

  def inventoryStorages(spark: SparkSession): DataFrame = {
    import spark.implicits._
    withVendor(Seq(
      ("ssd-std", "Standard SSD", "ssd", 16000L, 250L, 1L, 16384L),
      ("hdd-cold", "Cold HDD", "hdd", 500L, 60L, 125L, 16384L))
      .toDF("storage_id", "name", "storage_type", "max_iops", "max_throughput",
        "min_size", "max_size"))
  }

  def inventoryStoragePrices(spark: SparkSession): DataFrame = {
    import spark.implicits._
    withVendor(Seq(
      ("dc-east", "ssd-std", 0.08), ("dc-east", "hdd-cold", 0.015),
      ("dc-west", "ssd-std", 0.088))
      .toDF("region_id", "storage_id", "price")
      .withColumn("unit", lit("gb_month")).withColumn("currency", lit("USD")))
  }

  def inventoryDatabases(spark: SparkSession): DataFrame = {
    import spark.implicits._
    withVendor(Seq(
      ("pg-s1", "postgres", Seq("15", "16"), false),
      ("my-s1", "mysql", Seq("8.0"), true))
      .toDF("database_id", "engine", "engine_versions", "multi_az"))
  }

  def inventoryDatabasePrices(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // J5 computed-key join: db SKU "db.s1.large" resolves to server s1.large
    val dbSkus = Seq(("db.s1.large", "pg-s1", "dc-east", "dc-east-a", 0.145))
      .toDF("sku", "database_id", "region_id", "zone_id", "price")
    val servers = inventoryServers(spark).select(col("server_id"))
    withVendor(dbSkus
      .join(servers, regexp_replace(col("sku"), "^db\\.", "") === col("server_id"), "left")
      .withColumn("allocation", lit("ondemand"))
      .withColumn("unit", lit("hour")).withColumn("currency", lit("USD"))
      .drop("sku"))
  }

  def inventoryTrafficPrices(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // E2: per-direction runs appended
    val out = Seq(("dc-east", "out", 0.09), ("dc-west", "out", 0.09))
      .toDF("region_id", "direction", "price")
    val in = Seq(("dc-east", "in", 0.0), ("dc-west", "in", 0.0))
      .toDF("region_id", "direction", "price")
    withVendor(out.unionByName(in)
      .withColumn("unit", lit("gb")).withColumn("currency", lit("USD")))
  }

  def inventoryIpv4Prices(spark: SparkSession): DataFrame = {
    import spark.implicits._
    withVendor(Seq(("dc-east", 0.005), ("dc-west", 0.005))
      .toDF("region_id", "price")
      .withColumn("unit", lit("hour")).withColumn("currency", lit("USD")))
  }

  override def inventoryVendors(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((vendorId, "Demo Cloud", "US", 2026)).toDF("vendor_id", "name", "country_id", "founding_year")
  }

  override def inventoryVendorComplianceLinks(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((vendorId, "hipaa"), (vendorId, "soc2t2"))
      .toDF("vendor_id", "compliance_framework_id")
  }

  override def inventoryServerDescriptions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    withVendor(Seq(("s1.large",
      Seq("A balanced general-purpose instance for everyday workloads."),
      Seq("2 vCPUs", "8 GB memory", "up to 10 Gbps network"),
      Seq("processing")))
      .toDF("server_id", "page", "bullet_points", "categories"))
  }

  override def inventoryDatabaseStorages(spark: SparkSession): DataFrame = {
    import spark.implicits._
    withVendor(Seq(("db-ssd", "Database SSD", "ssd", 12000L, 500L, 20L, 4096L))
      .toDF("database_storage_id", "name", "storage_type", "max_iops",
        "max_throughput", "min_size", "max_size"))
  }

  override def inventoryDatabaseStoragePrices(spark: SparkSession): DataFrame = {
    import spark.implicits._
    withVendor(Seq(("dc-east", "db-ssd", 0.115))
      .toDF("region_id", "database_storage_id", "price")
      .withColumn("unit", lit("gb_month")).withColumn("currency", lit("USD")))
  }

  override def inventoryBenchmarks(spark: SparkSession): DataFrame =
    SeedTables.benchmarks(spark)

  def inventoryBenchmarkScores(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val raw = Seq(
      ("s1.large", "aws", "m5.large", "rd 64.00 13087.10\nwr 64.00 9500.25"))
      .toDF("server", "vendor", "api_ref", "content")
      .select(lit(vendorId).as("vendor_id"), col("server").as("server_id"), col("content"))
    InspectorParsers.parseBwMem(raw)
      .withColumn("config_json",
        graft.ops.CanonicalJson.canonical(Seq("config" -> col("config"))))
  }
}
