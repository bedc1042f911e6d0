package graft.ingest

import graft.SparkSpec
import graft.schema.Schemas

import java.nio.file.Files

class PullSpec extends SparkSpec {

  test("pull conforms, dedups and sinks every record type") {
    val dir = Files.createTempDirectory("graft-pull").toString
    val counts = Pull.pull(spark, new DemoVendor, Pull.parquetSink(dir))
    // every registry table except the orchestrator-owned _metadata
    assert(counts.keySet == Schemas.tables.keySet - "_metadata")
    assert(counts("vendor") == 1 && counts("benchmark") == 14)
    assert(counts("server_price") == 4) // zone fan-out
    assert(counts("country") == 29)
    assert(counts("benchmark_score") == 2) // bw_mem rd + wr

    // written frames conform to registry schemas (names + order)
    val sp = spark
    val written = sp.read.parquet(s"$dir/server_price")
    assert(written.columns.toSeq == Schemas.serverPrice.fieldNames.toSeq)
    // prices extracted from terms JSON and rounded
    val prices = written.select("price").collect().map(_.getDouble(0)).toSet
    assert(prices == Set(0.10, 0.08, 0.40))
  }

  test("pull is idempotent per PK (keep-last dedup)") {
    val sp = spark; import sp.implicits._
    val v = new DemoVendor {
      override def inventoryIpv4Prices(spark: org.apache.spark.sql.SparkSession) = {
        import spark.implicits._
        // duplicate PK rows: last occurrence must win
        Seq(("dc-east", 0.004), ("dc-east", 0.006))
          .toDF("region_id", "price")
          .withColumn("vendor_id", org.apache.spark.sql.functions.lit("demo"))
          .withColumn("unit", org.apache.spark.sql.functions.lit("hour"))
          .withColumn("currency", org.apache.spark.sql.functions.lit("USD"))
      }
    }
    val dir = Files.createTempDirectory("graft-pull2").toString
    Pull.pull(spark, v, Pull.parquetSink(dir))
    val rows = spark.read.parquet(s"$dir/ipv4_price")
      .select("region_id", "price").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows("dc-east") == 0.006)
  }
}
