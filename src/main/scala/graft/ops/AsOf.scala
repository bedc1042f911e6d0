package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the LATEST right row
  * with `rightTs <= leftTs` within the same key group — the lookup every
  * price/telemetry time-series needs ("the spot price in force when this
  * job started").
  *
  * Spark has no built-in as-of join; the naive range join
  * (`l.ts >= r.ts` + keep-max) explodes to O(|L|·|R|) per key before
  * pruning. This composition is the scalable shape: tag both sides, union
  * them, and run ONE `last(value, ignoreNulls)` window per key ordered by
  * (ts, side) — each key group is sorted once and scanned once,
  * O((|L|+|R|) log) total, no quadratic intermediate at any point. Right
  * rows sort before left rows at equal timestamps, so the match is
  * inclusive (`<=`), exactly DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`
  * semantics — which is what the oracle runs.
  *
  * At 100 TB both inputs shuffle once on the key columns and the window
  * is per-key (never unpartitioned); skewed keys take the same salting
  * escape hatch as any keyed window.
  */
object AsOf {

  /** Left as-of join. Right value columns (everything except `keys` and
    * `rightTs`) are appended to every left row; NULL when the key has no
    * right row at or before the left timestamp. Right frames with
    * duplicate (keys, ts) rows should be deduped first ([[Dedup]]) — the
    * reference point is otherwise ambiguous in ANY engine. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String): DataFrame = {
    val rightVals = right.columns.filterNot(c => keys.contains(c) || c == rightTs).toSeq
    val leftCols = left.columns.toSeq
    require(rightVals.intersect(leftCols).isEmpty,
      s"right value columns ${rightVals.mkString(",")} collide with left columns")

    val l = rightVals.foldLeft(
      left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))) {
      case (df, c) => df.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }
    val r = leftCols.filterNot(keys.contains).foldLeft(
      right.withColumn("__ts", col(rightTs)).withColumn("__side", lit(0))
        .drop(rightTs)) {
      case (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = l.unionByName(r.select(l.columns.toIndexedSeq.map(col): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightVals.foldLeft(unioned) { case (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__ts", "__side")
  }
}
