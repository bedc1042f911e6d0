package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tiered-price operators (reference O1/O2/O5: `vendors/_aws.py:445, 1297`,
  * `_azure.py:1390-1395`): price tiers are `array<struct<lower, upper,
  * price>>` columns; sorting, cumulative bound chaining, and headline-price
  * extraction are all array expressions or one small window — map-side
  * except the explicit per-key window in `cumulativeBounds`. */
object TierOps {

  /** Sort an array-of-tier-structs by a struct field (O1). Struct
    * comparison is lexicographic by field order, so re-struct with the sort
    * key first, sort, then restore field order. */
  def sortTiersBy(tiers: Column, byField: String): Column =
    transform(
      sort_array(transform(tiers, t =>
        struct(t.getField(byField).as("__k"), t.as("__t")))),
      s => s.getField("__t"))

  /** Headline price = max tier price (O5, `_aws.py:1297`). */
  def maxTierPrice(tiers: Column): Column =
    array_max(transform(tiers, t => t.getField("price")))

  /** Azure-style cumulative bounds (O2): given per-key tier ROWS with an
    * `upper` bound, each tier's `lower` becomes the previous tier's upper
    * (0 for the first). The reference's only lag/lead-shaped computation. */
  def cumulativeBounds(df: DataFrame, keys: Seq[String], upperCol: String,
                       tieBreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(upperCol).asc +: tieBreak: _*)
    df.withColumn("lower", lag(col(upperCol), 1, 0.0).over(w))
  }

  /** Inverse chain (O2, `_azure.py:1412-1431` `get_tiers`): per-key tier
    * ROWS carry a `lower` bound (Azure's tierMinimumUnits); each tier's
    * `upper` becomes the NEXT tier's lower, the last tier is unbounded. */
  def cumulativeUppers(df: DataFrame, keys: Seq[String], lowerCol: String,
                       tieBreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(lowerCol).asc +: tieBreak: _*)
    df.withColumn("upper",
      coalesce(lead(col(lowerCol), 1).over(w), lit(Double.PositiveInfinity)))
  }

  /** Same cumulative chain entirely inside an array column (no shuffle):
    * sort tiers by upper, then zip each with its predecessor's upper. */
  def cumulativeBoundsArray(tiers: Column): Column = {
    val sorted = sort_array(transform(tiers, t =>
      struct(t.getField("upper").as("upper"), t.getField("price").as("price"))))
    val uppers = transform(sorted, t => t.getField("upper"))
    // predecessors: [0.0] ++ uppers dropped-last (zip_with pads with null
    // when lengths differ, so trim explicitly)
    val prevs = concat(array(lit(0.0)),
      slice(uppers, lit(1), greatest(size(uppers) - 1, lit(0))))
    zip_with(
      sorted, prevs,
      (t, prevUpper) => struct(prevUpper.as("lower"),
        t.getField("upper").as("upper"), t.getField("price").as("price")))
  }
}
