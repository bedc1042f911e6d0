package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MisraGriesSpec extends SparkSpec {

  /** n items: key i repeated freq(i) times, as 64-bit "hashes" (the agg
    * is key-agnostic — any bigint works, so specs use readable ids). */
  private def skewed(freqs: Map[Long, Int]) = {
    val sp = spark; import sp.implicits._
    freqs.toSeq.flatMap { case (k, n) => Seq.fill(n)(k) }.toDF("h")
  }

  private def summary(df: org.apache.spark.sql.DataFrame, k: Int): Map[Long, Long] =
    df.agg(MisraGriesAgg.mgSummary(col("h"), k)).head.getSeq[Row](0)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("guarantee: every item above n/(k+1) is present, counters lower-bound truth") {
    // n = 1000: two heavy keys (400, 300) + 300 singletons
    val freqs = Map(1L -> 400, 2L -> 300) ++ (100L until 400L).map(_ -> 1).toMap
    val df = skewed(freqs).repartition(7) // exercise partial + merge paths
    val s = summary(df, 16)
    assert(s.contains(1L) && s.contains(2L), s"heavy keys missing: $s")
    assert(s(1L) <= 400 && s(2L) <= 300, s"counter exceeds true count: $s")
    // error bound: counter >= true - n/(k+1)
    assert(s(1L) >= 400 - 1000 / 17 && s(2L) >= 300 - 1000 / 17, s"bound violated: $s")
    assert(s.size <= 16)
  }

  test("no distinct-count blowup: state stays at k under uniform data") {
    val df = skewed((1L to 5000L).map(_ -> 1).toMap)
    assert(summary(df, 32).size <= 32)
  }

  test("exact when distinct keys fit in k") {
    val freqs = Map(1L -> 10, 2L -> 20, 3L -> 5)
    assert(summary(skewed(freqs).repartition(3), 8) ==
      freqs.map { case (k, v) => k -> v.toLong })
  }

  test("stored per-shard summaries union with the guarantee intact") {
    val freqs = Map(1L -> 400, 2L -> 300) ++ (100L until 400L).map(_ -> 1).toMap
    val df = skewed(freqs)
    // one stored summary per shard (pmod buckets), then mg_merge unions
    val merged = df.withColumn("shard", pmod(col("h"), lit(5)))
      .groupBy(col("shard"))
      .agg(MisraGriesAgg.mgSummary(col("h"), 16).as("s"))
      .agg(MisraGriesAgg.mgMerge(col("s"), 16))
      .head.getSeq[Row](0).map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged.contains(1L) && merged.contains(2L), s"heavy keys lost: $merged")
    assert(merged(1L) <= 400 && merged(2L) <= 300)
    assert(merged.size <= 16)
  }

  test("SQL surface: mg_summary registered and explodes to candidate rows") {
    GraftExtensions.register(spark)
    skewed(Map(7L -> 50, 8L -> 1)).createOrReplaceTempView("mg_in")
    val rows = spark.sql(
      """SELECT e.h, e.cnt_lb
        |FROM (SELECT explode(mg_summary(h, 4)) AS e FROM mg_in)""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(7L) == 50L)
  }
}
