package graft.schema

import graft.SparkSpec
import graft.sinks.DdlGen
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema invariants mirroring the reference's `tests/test_schemas.py`:
  * table registry completeness, meta columns everywhere, PK shapes, SCD
  * twins, validation coercion. */
class SchemaSpec extends SparkSpec {

  test("all 19 core tables + _metadata are registered") {
    assert(Schemas.tables.size == 20)
    val expected = Set("country", "compliance_framework", "vendor",
      "vendor_compliance_link", "region", "zone", "storage", "server",
      "server_price", "server_description", "storage_price", "database",
      "database_price", "database_storage", "database_storage_price",
      "traffic_price", "ipv4_price", "benchmark", "benchmark_score", "_metadata")
    assert(Schemas.tables.keySet == expected)
  }

  test("every table has status + observed_at meta columns and PK columns exist") {
    Schemas.tables.foreach { case (name, (schema, pks)) =>
      assert(schema.fieldNames.contains("status"), name)
      assert(schema.fieldNames.contains("observed_at"), name)
      pks.foreach(pk => assert(schema.fieldNames.contains(pk), s"$name.$pk"))
    }
  }

  test("server_price PK matches the reference composite key") {
    assert(Schemas.tables("server_price")._2 ==
      Seq("vendor_id", "region_id", "zone_id", "server_id", "operating_system", "allocation"))
  }

  test("SCD twin key promotes observed_at") {
    assert(Schemas.scdKey("server") == Seq("vendor_id", "server_id", "observed_at"))
  }

  test("benchmark_score keys on canonical config_json, not MapType") {
    val (schema, pks) = Schemas.tables("benchmark_score")
    assert(pks.contains("config_json"))
    assert(schema("config").dataType.isInstanceOf[MapType])
  }

  test("conform adds missing columns, casts, and fills defaults") {
    val sp = spark; import sp.implicits._
    val raw = Seq(("US", 1)).toDF("country_id", "extraneous")
    val out = Validate.conform(raw, Schemas.country, Map("status" -> "active"))
    assert(out.columns.toSeq == Schemas.country.fieldNames.toSeq)
    val row = out.collect().head
    assert(row.getAs[String]("status") == "active")
    assert(row.getAs[String]("continent") == null)
  }

  test("violations flags nulls in non-nullable and domain breaches") {
    val sp = spark; import sp.implicits._
    val df = Seq(("a", "active"), (null, "active"), ("c", "bogus"))
      .toDF("country_id", "status")
    val schema = StructType(Seq(
      StructField("country_id", StringType, nullable = false),
      StructField("status", StringType)))
    val (ok, bad) = Validate.partition(df, schema, Map("status" -> Enums.Status))
    assert(ok.count() == 1)
    assert(bad.select("__violation").as[String].collect().toSet ==
      Set("null:country_id", "domain:status"))
  }

  test("DDL generation emits PK and dialect types") {
    val ddl = DdlGen.createTable("country", Schemas.country,
      Schemas.tables("country")._2, DdlGen.Sqlite)
    assert(ddl.contains("CREATE TABLE country"))
    assert(ddl.contains("country_id TEXT NOT NULL"))
    assert(ddl.contains("PRIMARY KEY (country_id)"))
    assert(DdlGen.allTables(DdlGen.Postgres).size == 20)
    // Derby identifiers are uppercase-quoted (reserved words, _metadata)
    assert(DdlGen.allTables(DdlGen.Derby, scd = true)
      .exists(_.contains("CREATE TABLE \"SERVER_SCD\"")))
  }

  test("seed tables conform to their schemas at reference literal parity") {
    import graft.ingest.SeedTables
    // lookup.py:18-58 — all 39 countries
    assert(SeedTables.countries(spark).count() == 39)
    assert(SeedTables.complianceFrameworks(spark).count() == 3)
    // lookup.py:213-766 — 24 direct + 17 geekbench + 16 passmark entries
    val bm = SeedTables.benchmarks(spark)
    assert(bm.count() == 57)
    assert(bm.filter(col("benchmark_id").startsWith("geekbench:")).count() == 17)
    assert(bm.filter(col("benchmark_id").startsWith("passmark:")).count() == 16)
    // lower-is-better: compression ratio, 3 latency benchmarks, passmark latency
    assert(bm.filter(!col("higher_is_better")).count() == 5)
    // workload_profiles.py:125-470 — 6 live profiles, 39 entries, weights
    // summing to 1 per profile, filters on the entries that carry them
    val wl = SeedTables.workloads(spark)
    assert(wl.select("workload").distinct().count() == 6)
    assert(wl.count() == 39)
    val sums = wl.groupBy(col("workload")).agg(sum(col("weight")).as("w"))
      .collect().map(_.getAs[Double]("w"))
    assert(sums.length == 6 && sums.forall(w => math.abs(w - 1.0) < 1e-9))
    val clang = wl.filter(col("workload") === "cicd" && col("entry_idx") === 0)
      .collect().head
    assert(clang.getAs[Map[String, String]]("config_filter") == Map("cores" -> "multi"))
  }
}
