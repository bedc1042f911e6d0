package graft.ingest

import graft.SparkSpec
import graft.ops.TierOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

class VendorIngestSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column, v: String): Any = {
    val sp = spark; import sp.implicits._
    Seq(Tuple1(v)).toDF("x").select(c.as("v")).collect().head.get(0)
  }

  test("P6: ondemand price extraction prefers USD, rounds to 4") {
    val terms =
      """{"OnDemand": {"t1": {"priceDimensions": {"d1": {
        |"pricePerUnit": {"USD": "0.14500001"}, "beginRange": "0", "endRange": "Inf"}}}}}""".stripMargin
    assert(one(VendorIngest.extractOnDemandPrice(col("x")), terms) == 0.145)
    assert(one(VendorIngest.extractCurrency(col("x")), terms) == "USD")
    val eur = terms.replace("USD", "EUR")
    assert(one(VendorIngest.extractCurrency(col("x")), eur) == "EUR")
    assert(one(VendorIngest.extractOnDemandPrice(col("x")), "not json") == null)
  }

  test("J1: region alias join resolves by name or any alias") {
    val sp = spark; import sp.implicits._
    val regions = Seq(("us-east-1", Seq("N. Virginia", "US East")),
      ("eu-west-1", Seq.empty[String]))
      .toDF("name", "aliases").withColumn("region_pk", col("name"))
    val products = Seq("us-east-1", "US East", "eu-west-1", "nowhere").toDF("location")
    val out = VendorIngest.joinRegionByAlias(products, regions, "location")
      .select("location", "region_pk").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out == Map("us-east-1" -> Some("us-east-1"), "US East" -> Some("us-east-1"),
      "eu-west-1" -> Some("eu-west-1"), "nowhere" -> None))
  }

  test("J3: zone fan-out replicates rows per offering") {
    val sp = spark; import sp.implicits._
    val products = Seq(("m5.large", "us-east-1", 0.096)).toDF("instance_type", "region_id", "price")
    val offerings = Seq(("m5.large", "us-east-1", "use1-az1"),
      ("m5.large", "us-east-1", "use1-az2")).toDF("instance_type", "region_id", "zone_id")
    assert(VendorIngest.zoneFanout(products, offerings).count() == 2)
  }

  test("P3: instance annotation decodes family/gen/suffix/size") {
    val r = one(VendorIngest.annotateInstanceType(col("x")), "db.r6gd.2xlarge")
      .asInstanceOf[Row]
    assert(r.getAs[String]("family") == "r")
    assert(r.getAs[String]("generation") == "6")
    assert(r.getAs[String]("suffix") == "gd")
    assert(r.getAs[String]("size") == "2xlarge")
    assert(r.getAs[String]("description") == "Memory optimized gen6 ARM NVMe 2xlarge")
  }

  test("P4: cpu model and manufacturer standardization") {
    assert(one(VendorIngest.standardizeCpuModel(col("x")),
      "Intel(R) Xeon(R) Platinum 8175M CPU @ 2.50GHz") == "Intel Xeon Platinum 8175M")
    assert(one(VendorIngest.standardizeManufacturer(col("x")), "intel corp") == "Intel")
    assert(one(VendorIngest.standardizeManufacturer(col("x")), "Annapurna Labs") == "AWS")
    assert(one(VendorIngest.standardizeManufacturer(col("x")), "someone") == "Someone")
  }

  test("P7: inspector override precedence never writes null") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      ("gcp", "v1", "i1"), ("gcp", "v2", null), ("aws", null, "i3"), ("aws", "v4", "i4"))
      .toDF("vendor_id", "v", "i")
    val out = df.select(VendorIngest.preferInspector(col("v"), col("i"),
      col("vendor_id"), Seq("gcp")).as("r")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("i1", "v2", "i3", "v4"))
  }

  test("tier ops: sort, max headline price, cumulative bounds") {
    val sp = spark; import sp.implicits._
    val df = Seq(Tuple1(Seq((100.0, 0.2), (50.0, 0.3), (200.0, 0.1)))).toDF("raw")
      .select(transform(col("raw"), t =>
        struct(t.getField("_1").as("upper"), t.getField("_2").as("price"))).as("tiers"))
    assert(df.select(TierOps.maxTierPrice(col("tiers"))).collect().head.getDouble(0) == 0.3)
    val chained = df.select(TierOps.cumulativeBoundsArray(col("tiers")).as("t"))
      .select(explode(col("t")).as("tier")).select("tier.lower", "tier.upper")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(chained.toSeq == Seq((0.0, 50.0), (50.0, 100.0), (100.0, 200.0)))
    // row-wise variant (window lag)
    val rows = Seq(("k", 50.0), ("k", 100.0), ("k", 200.0)).toDF("k", "upper")
    val cb = TierOps.cumulativeBounds(rows, Seq("k"), "upper")
      .orderBy("upper").select("lower").collect().map(_.getDouble(0))
    assert(cb.toSeq == Seq(0.0, 50.0, 100.0))
  }

  test("disk expansion total without explode") {
    val sp = spark; import sp.implicits._
    val df = Seq(Tuple1(Seq((1425L, 2L), (300L, 1L)))).toDF("raw")
      .select(transform(col("raw"), d =>
        struct(d.getField("_1").as("size"), d.getField("_2").as("count"))).as("disks"))
    assert(df.select(VendorIngest.totalDiskSize(col("disks")))
      .collect().head.getLong(0) == 3150L)
  }
}
