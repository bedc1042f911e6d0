package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff / sync (reference E1 + §3.2: `cli.py:373-597`).
  *
  * Classifies rows of `source` vs `target` keyed by `keys` into
  * new / update / deleted / unchanged by comparing a content hash column.
  * The reference does this with two driver-side dicts of row hashes; here it
  * is one full-outer shuffle join on the key — linear, no driver state, and
  * at 100 TB the join partitions by key so each executor diffs its slice.
  */
object HashDiff {

  /** Full-outer diff. Input frames must carry `hashCol`; output has the key
    * columns plus `change` ∈ {new, update, deleted, unchanged}. Rows already
    * `inactive` in target are not re-marked deleted (reference
    * `cli.py:529-536`) when a `status` column is present. */
  def diff(source: DataFrame, target: DataFrame, keys: Seq[String],
           hashCol: String = "__hash"): DataFrame = {
    val s = source.select((keys.map(col) :+ col(hashCol).as("__src_hash")): _*)
    val withStatus = target.columns.contains("status")
    val tCols0 = keys.map(col) :+ col(hashCol).as("__tgt_hash")
    val tCols = if (withStatus) tCols0 :+ col("status").as("__tgt_status") else tCols0
    val t = target.select(tCols: _*)
    val joined = s.join(t, keys, "full_outer")
    val deleted: Column =
      if (withStatus) col("__src_hash").isNull && coalesce(col("__tgt_status") =!= "inactive", lit(true))
      else col("__src_hash").isNull
    joined.withColumn("change",
        when(col("__tgt_hash").isNull, lit("new"))
          .when(deleted, lit("deleted"))
          .when(col("__src_hash") =!= col("__tgt_hash"), lit("update"))
          .otherwise(lit("unchanged")))
      .select((keys.map(col) :+ col("change")): _*)
  }

  /** Soft-delete sweep (reference K3, `tables.py:224-254`): mark rows of
    * `current` whose key no longer appears in `incoming` as inactive instead
    * of removing them. Anti-join driven, no driver loop. */
  def softDeleteSweep(current: DataFrame, incoming: DataFrame, keys: Seq[String],
                      statusCol: String = "status"): DataFrame = {
    val liveKeys = incoming.select(keys.map(col): _*).distinct()
      .withColumn("__present", lit(1))
    current.join(liveKeys, keys, "left")
      .withColumn(statusCol, when(col("__present").isNull, lit("inactive")).otherwise(col(statusCol)))
      .drop("__present")
  }
}
