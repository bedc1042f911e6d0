package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type 2 reads (reference `tables_scd.py:45-53` + the current-view
  * query implied by `cli.py:424-427`): the `_scd` twins are append-only
  * with `observed_at` in the key; these helpers recover point-in-time
  * views. Both are one window over the business key — at scale, partition
  * by the key columns, no global sort. */
object Scd {

  /** Latest version per business key. */
  def currentView(scd: DataFrame, pks: Seq[String],
                  observedCol: String = "observed_at"): DataFrame =
    Dedup.keepLast(scd, pks, Seq(col(observedCol)))

  /** State as of `ts`: the latest version observed at or before it. */
  def asOf(scd: DataFrame, pks: Seq[String], ts: Column,
           observedCol: String = "observed_at"): DataFrame =
    Dedup.keepLast(scd.filter(col(observedCol) <= ts), pks, Seq(col(observedCol)))

  /** Version history with validity intervals: each version's `valid_to` is
    * the next version's `observed_at` (null for the current one). */
  def withValidity(scd: DataFrame, pks: Seq[String],
                   observedCol: String = "observed_at"): DataFrame = {
    val w = Window.partitionBy(pks.map(col): _*).orderBy(col(observedCol))
    scd.withColumn("valid_from", col(observedCol))
      .withColumn("valid_to", lead(col(observedCol), 1).over(w))
  }
}
