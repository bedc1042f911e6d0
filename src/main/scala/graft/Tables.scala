package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-harness table loader (TESTDATA.md): TPC-H-ish star schema plus
  * `events` (stream-shaped), `documents` / `embeddings` (training-data ops).
  *
  * At 100 TB these reads stay valid: parquet scans with pushed filters and
  * pruned columns (Catalyst does both as long as queries stay declarative);
  * the per-table helpers exist so every query funnels through one place
  * where bucketing / sorting metadata could be attached later.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  /** `events.parquet` stores TIMESTAMP(NANOS), which Spark 4 refuses by
    * default. Read nanos as long (legacy conf, runtime-settable) and convert
    * to a microsecond TimestampType column — the generator's values are
    * µs-grained, so the conversion is lossless.
    *
    * The frame is MEMOIZED per (session, dir) (round 15): 14 query paths
    * call this, and each un-memoized call re-ran the driver-side parquet
    * schema inference plus the nanos probe before rebuilding an identical
    * cast plan. The memo holds a logical plan only — no data is cached,
    * so bench/oracle runs still compute everything from the parquet. */
  private val eventsMemo =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())
  def events(spark: SparkSession, dir: String): DataFrame =
    eventsMemo.computeIfAbsent(spark,
        _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
      .computeIfAbsent(dir, { _ =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val df = apply(spark, dir, "events")
        if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          // integer DIV: `/` on longs promotes to double and loses µs precision
          df.withColumn("ts",
            org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
        else df
      })
  def documents(spark: SparkSession, dir: String): DataFrame =
    spread(apply(spark, dir, "documents"))
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spread(apply(spark, dir, "embeddings"))

  /** A small table arrives as ONE input split, so heavy per-row compute
    * downstream (shingling, per-shingle md5, dot products) runs in a single
    * task no matter how many cores exist — at sf0.1 that made every dedup
    * query pay ~7 s of single-threaded hashing. Spread the scan to
    * defaultParallelism when it has fewer partitions; at 100 TB inputs have
    * thousands of row groups and this is a no-op (no shuffle). Row order is
    * never load-bearing here: every oracle-gated query ends in a total
    * ORDER BY, and ordered dedup derives order from data columns. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
