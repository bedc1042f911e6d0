package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VendorApiSourceSpec extends SparkSpec {

  private def read(regions: String, rows: Int = 50) =
    spark.read.format("graft.sources.VendorApiSource")
      .option("regions", regions).option("rowsPerRegion", rows.toString).load()

  test("one partition per region, deterministic rows") {
    val df = read("r1,r2,r3")
    assert(df.count() == 150)
    assert(df.rdd.getNumPartitions == 3)
    // deterministic across reads
    assert(read("r1").agg(sum("price")).head().getDouble(0) ==
      read("r1").agg(sum("price")).head().getDouble(0))
  }

  test("region equality filter prunes partitions at planning time") {
    val df = read("r1,r2,r3").filter(col("region") === "r2")
    assert(df.rdd.getNumPartitions == 1) // 2 of 3 regions never planned
    assert(df.count() == 50)
    assert(df.select("region").distinct().collect().map(_.getString(0)).toSeq == Seq("r2"))
  }

  test("IN-list filter prunes to the listed regions; other filters stay post-scan") {
    val df = read("r1,r2,r3,r4").filter(col("region").isin("r1", "r4") && col("price") > 0.5)
    assert(df.rdd.getNumPartitions == 2)
    assert(df.select("region").distinct().count() <= 2)
    // price predicate still applied (rejected from pushdown, evaluated by Spark)
    assert(df.filter(col("price") <= 0.5).count() == 0)
  }

  test("LIMIT pushes into each region's fetch; global limit still exact") {
    val df = read("r1,r2,r3").limit(7)
    val plan = df.queryExecution.executedPlan.toString()
    // the scan description carries the clamped per-region row count
    assert(plan.contains("rows=7"), s"limit not pushed into the scan:\n$plan")
    assert(df.count() == 7) // Spark's global limit still applies (partial push)
  }

  test("column pruning reaches the reader: scan schema holds only requested fields") {
    val df = read("r1,r2").select("instance_type")
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("cols=instance_type"), s"columns not pruned at the scan:\n$plan")
    assert(df.distinct().count() == 4) // families still read correctly
  }
}
