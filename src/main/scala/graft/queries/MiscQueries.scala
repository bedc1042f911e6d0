package graft.queries

import graft.Tables
import graft.ingest.SeedTables
import graft.schema.{Schemas, Validate}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Remaining SURVEY §2 operators with SQL-expressible semantics: static
  * seed scan (S5), full-table scan (S6), schema conform/validate (P1),
  * membership check (E3), global top-k (O3/O4 at table scope). */
object MiscQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // ---- S5: compiled-in static seed table (countries)
    "s5_seed_countries" -> ((s, _) => {
      SeedTables.countries(s)
        .select(col("country_id"), col("continent"), col("status"))
        .orderBy(col("country_id"))
    }),

    // ---- S6: full-table scan (hash/copy/dump input shape)
    "s6_table_scan" -> ((s, dir) => {
      Tables.region(s, dir).orderBy(col("r_regionkey"))
    }),

    // ---- P1: validation conform — add missing cols, cast, fill defaults
    "p1_conform" -> ((s, dir) => {
      val target = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n_nationkey",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_name",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_comment",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("status",
          org.apache.spark.sql.types.StringType)))
      Validate.conform(Tables.nation(s, dir), target, Map("status" -> "active"))
        .orderBy(col("n_nationkey"))
    }),

    // ---- E3: membership check both directions (known-set reconciliation)
    "e3_membership" -> ((s, dir) => {
      val present = Tables.lineitem(s, dir).select(col("l_partkey").as("p_partkey")).distinct()
      val all = Tables.part(s, dir).select(col("p_partkey"))
      val unknown = present.join(all, Seq("p_partkey"), "left_anti")
        .withColumn("side", lit("unknown_key"))
      val unused = all.join(present, Seq("p_partkey"), "left_anti")
        .withColumn("side", lit("unused_part"))
      unknown.unionByName(unused).orderBy(col("side"), col("p_partkey"))
    }),

    // ---- P2/P5/A5: vendor-payload projection end to end — a nested
    //      EC2-shaped JSON payload is built from part rows, parsed with
    //      from_json, and flattened through the real unit-conversion and
    //      disk-expansion helpers; the oracle computes the same fields
    //      straight off the table
    "p2_payload_project" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val payloadSchema = new StructType()
        .add("instance_type", StringType)
        .add("cpu", new StructType().add("vcpus", LongType))
        .add("memory", new StructType().add("size_mib", LongType))
        .add("disks", ArrayType(new StructType()
          .add("size", LongType).add("count", LongType)))
      val raw = Tables.part(s, dir).select(col("p_partkey"),
        to_json(struct(
          col("p_name").as("instance_type"),
          struct(col("p_size").cast("long").as("vcpus")).as("cpu"),
          // floor() before the long cast: Spark truncates double→long,
          // DuckDB rounds — floor makes both sides explicit and equal
          struct(floor(col("p_retailprice") * 10).cast("long").as("size_mib")).as("memory"),
          array(
            struct(lit(100L).as("size"), col("p_size").cast("long").as("count")),
            struct(lit(50L).as("size"), lit(2L).as("count"))).as("disks")
        )).as("payload"))
      raw.select(col("p_partkey"),
          from_json(col("payload"), payloadSchema).as("p"))
        .select(col("p_partkey"),
          col("p.instance_type").as("instance_type"),
          col("p.cpu.vcpus").as("vcpus"),
          round(graft.ingest.VendorIngest.mibToMb(col("p.memory.size_mib")), 4)
            .as("memory_mb"),
          graft.ingest.VendorIngest.totalDiskSize(col("p.disks")).as("storage_gb"))
        .orderBy(col("p_partkey"))
    }),

    // ---- P7: override precedence — inspector beats vendor only for the
    //      designated vendors and never overrides with null
    "p7_override" -> ((s, dir) => {
      val n = Tables.nation(s, dir)
        .withColumn("vendor_id",
          when(col("n_nationkey") % 2 === 0, "gcp").otherwise("aws"))
        .withColumn("vendor_val", col("n_nationkey") * 10)
        .withColumn("inspector_val",
          when(col("n_nationkey") % 3 === 0, lit(null).cast("long"))
            .otherwise(col("n_nationkey") * 100))
      n.select(col("n_nationkey"), col("vendor_id"),
          graft.ingest.VendorIngest.preferInspector(col("vendor_val"),
            col("inspector_val"), col("vendor_id"), Seq("gcp")).as("effective"))
        .orderBy(col("n_nationkey"))
    }),

    // ---- O3: global top-k. orderBy().limit(k) compiles to
    //      TakeOrderedAndProject: each task keeps a k-row heap, the driver
    //      merges 32 heaps — no global sort, no single-task window. The
    //      rank window only ever sees the k surviving rows.
    "o3_global_topk" -> ((s, dir) => {
      val top = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
      val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      top.withColumn("rank", row_number().over(w))
        .select(col("rank"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("rank"))
    }))

  val oracle: Map[String, String] = Map(
    // seed VALUES generated from the same Scala rows the engine compiles
    // in (cannot drift)
    "s5_seed_countries" ->
      s"""SELECT country_id, continent, 'active' AS status
         |FROM (VALUES ${SeedTables.countryValuesSql}) t(country_id, continent)
         |ORDER BY country_id""".stripMargin,
    "s6_table_scan" -> "SELECT * FROM region ORDER BY r_regionkey",
    "p7_override" ->
      """SELECT n_nationkey,
        |  CASE WHEN n_nationkey % 2 = 0 THEN 'gcp' ELSE 'aws' END AS vendor_id,
        |  CASE WHEN n_nationkey % 2 = 0
        |    THEN COALESCE(CASE WHEN n_nationkey % 3 = 0 THEN NULL
        |                       ELSE n_nationkey * 100 END, n_nationkey * 10)
        |    ELSE COALESCE(n_nationkey * 10,
        |                  CASE WHEN n_nationkey % 3 = 0 THEN NULL
        |                       ELSE n_nationkey * 100 END)
        |  END AS effective
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "p2_payload_project" ->
      """SELECT p_partkey, p_name AS instance_type,
        |  CAST(p_size AS BIGINT) AS vcpus,
        |  ROUND(CAST(floor(p_retailprice * 10) AS BIGINT) * 1.048576, 4) AS memory_mb,
        |  100 * CAST(p_size AS BIGINT) + 100 AS storage_gb
        |FROM part ORDER BY p_partkey""".stripMargin,
    "p1_conform" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |  CAST(NULL AS VARCHAR) AS n_comment, 'active' AS status
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "e3_membership" ->
      """SELECT p_partkey, side FROM (
        |  SELECT DISTINCT l_partkey AS p_partkey, 'unknown_key' AS side FROM lineitem
        |  WHERE l_partkey NOT IN (SELECT p_partkey FROM part)
        |  UNION ALL
        |  SELECT p_partkey, 'unused_part' AS side FROM part
        |  WHERE p_partkey NOT IN (SELECT DISTINCT l_partkey FROM lineitem))
        |ORDER BY side, p_partkey""".stripMargin,
    "o3_global_topk" ->
      """SELECT rank, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderkey, o_totalprice,
        |    row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
        |  FROM orders)
        |WHERE rank <= 10 ORDER BY rank""".stripMargin)
}
