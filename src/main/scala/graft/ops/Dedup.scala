package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered dedup (reference A11: `insert.py:36-72` keep-LAST by input order;
  * `vendor_helpers.py:55` keep-FIRST across regions).
  *
  * The reference relies on implicit Python list order; Spark requires an
  * explicit ordering column, so callers pass one (e.g. a sequence/
  * `observed_at` column materialized at source).
  *
  * Scale: one hash-partitioned window per call — a single shuffle on the key
  * columns, streaming rank within each partition, no driver materialization.
  * Skewed keys would be the only hazard; for PK-dedup keys are near-unique
  * so skew cannot arise.
  */
object Dedup {
  private def ranked(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Keep the last occurrence per key, "last" defined by `order` ascending. */
  def keepLast(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    ranked(df, keys, order.map(_.desc))

  /** Keep the first occurrence per key, "first" defined by `order` ascending. */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    ranked(df, keys, order.map(_.asc))

  /** Keep-last as an AGGREGATION instead of a window: max of a struct is
    * lexicographic over its fields, so `max(struct(orderCols ++ payload))`
    * picks the row that sorts last — with map-side combine and no per-key
    * sort, this beats the window form wherever the whole ordering chain is
    * descending and columns are non-null. Returns keys + the struct fields. */
  def keepLastByMax(df: DataFrame, keys: Seq[String], ordered: Seq[String]): DataFrame = {
    val m = df.groupBy(keys.map(col): _*)
      .agg(max(struct(ordered.map(col): _*)).as("__m"))
    m.select(keys.map(col) ++ ordered.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Count of surplus duplicate rows per the reference's logging
    * (A9, `insert.py:51-61`): total rows minus distinct keys. */
  def duplicateCount(df: DataFrame, keys: Seq[String]): Long = {
    val agg = df.groupBy(keys.map(col): _*).count()
      .filter(col("count") > 1)
      .agg(coalesce(sum(col("count") - 1), lit(0L)).as("dups"))
    agg.head().getLong(0)
  }
}
