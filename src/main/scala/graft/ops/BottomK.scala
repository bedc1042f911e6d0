package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bottom-k hash sampling — the quantile/data-card sketch that completes
  * the mergeable-sketch family (KMV = cardinality, Bloom = membership,
  * Misra-Gries = frequency; this = uniform sample → quantiles).
  *
  * The sample is the k rows with the SMALLEST salted-md5 id hash
  * (Cohen & Kaplan 2007, bottom-k sketches). Because min-k of a set is a
  * function of the SET, the sample is deterministic and merge-order
  * independent — any partitioning, any merge tree, any engine lands on
  * the same k rows (KMV is this same construction keeping only the
  * hashes). Rank error of a quantile read off the sample is the uniform
  * sampling bound O(1/√k): k = 1024 → ±~3 % ranks, 64 KB of state for a
  * corpus of any size.
  *
  * Scale shape: Spark executes orderBy+limit as TakeOrderedAndProject —
  * per-partition k-heaps merged at the driver, no global sort, no
  * shuffle of non-sample rows. */
object BottomK {

  val Salt = ":graft-bottomk-v1"

  /** The deterministic k-row uniform sample of `df` keyed on `idCol`.
    * `idCol` must be UNIQUE per row: duplicate ids hash identically, so
    * which of their rows survives the tie is plan-dependent (every
    * in-repo caller keys on a primary id). */
  def sample(df: DataFrame, idCol: String, k: Int): DataFrame =
    df.withColumn("__bk",
        graft.plans.Md5Long60Expr.md5Long60(concat(col(idCol).cast("string"), lit(Salt))))
      .orderBy(col("__bk")).limit(k)
      .drop("__bk")

  /** One-row quantile data card of `valueCol` estimated from the
    * bottom-k sample: n_sample plus p50/p90/p99 (4 dp, the a16
    * convention) and exact sample min/max. */
  def quantileEstimates(df: DataFrame, idCol: String, valueCol: String,
                        k: Int): DataFrame =
    sample(df, idCol, k).agg(
      count(lit(1)).as("n_sample"),
      round(expr(s"percentile($valueCol, 0.5)"), 4).as("p50"),
      round(expr(s"percentile($valueCol, 0.9)"), 4).as("p90"),
      round(expr(s"percentile($valueCol, 0.99)"), 4).as("p99"),
      min(col(valueCol)).as("vmin"),
      max(col(valueCol)).as("vmax"))
}
