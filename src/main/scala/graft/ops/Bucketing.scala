package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: the 100 TB path for repeated fact-fact joins.
  *
  * A join between two tables bucketed (and sorted) on the join key by the
  * same bucket count needs NO shuffle and NO sort at query time — the
  * exchange moves from every query to a one-time write. That is the
  * difference between re-shuffling 100 TB per query and never shuffling
  * it again. Works with the plain session catalog (parquet bucketing, no
  * Hive needed).
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** True when the physical plan of `df` contains a shuffle exchange —
    * what bucketed joins are meant to eliminate. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")

  /** Co-located equi-join of two bucketed tables. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
