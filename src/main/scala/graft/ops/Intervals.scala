package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Variable-length interval coalescing (gaps-and-islands): merge
  * overlapping [start, end] intervals per key into maximal windows —
  * the general form of the fixed-k span merge in [[graft.dedup.Spans]]
  * (dup spans, CUT) and the time twin of sessionization (w2 merges
  * points by gap; this merges ranges by overlap).
  *
  * Shape: one window pass partitioned BY KEY (running max of prior ends
  * flags island starts, a running sum numbers them) + one aggregate —
  * no global sort, no self-join; the classic O(n log n per key) plan
  * that survives any corpus size as long as single keys fit a
  * partition (skewed keys: pre-split by a salt, then re-coalesce —
  * islands are mergeable). */
object Intervals {

  /** Output: key columns + span_start, span_end, n_merged.
    *
    * `tieBreakCols` MUST make the per-key ordering TOTAL when interval
    * rows can repeat: the island result is mathematically tie-
    * insensitive, but window FRAMES over a non-total order are evaluated
    * nondeterministically by parallel engines (measured: DuckDB 8-thread
    * vs 1-thread disagreed on this very query until the order was made
    * total — SCALE.md), so a cross-engine gate needs the total order on
    * BOTH sides. */
  def coalesce(df: DataFrame, keyCols: Seq[String], startCol: String,
               endCol: String, tieBreakCols: Seq[String] = Nil): DataFrame = {
    val keys: Seq[Column] = keyCols.map(col)
    val w = Window.partitionBy(keys: _*)
      .orderBy(col(startCol) +: col(endCol) +: tieBreakCols.map(col): _*)
    val priorMax = max(col(endCol)).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    df.withColumn("__ng",
        when(priorMax.isNull || col(startCol) > priorMax, 1).otherwise(0))
      .withColumn("__grp", sum(col("__ng")).over(w))
      .groupBy(keys :+ col("__grp"): _*)
      .agg(min(col(startCol)).as("span_start"), max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_merged"))
      .drop("__grp")
  }
}
