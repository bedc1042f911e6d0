package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The `sync` orchestrator (reference §3.2, `cli.py:373-597`): hash both
  * snapshots, classify rows, and produce the frames each write mode needs.
  * The reference's driver-side dict loops become one full-outer join. */
object Sync {

  case class SyncResult(stats: Map[String, Long], standard: DataFrame, scd: DataFrame)

  /** Compare source → target on `pks`.
    *  - `standard`: rows to upsert into the live table — new + updated
    *    source rows, plus target rows flipped inactive when deleted;
    *  - `scd`: the same rows for the `_scd` twin (append-only history;
    *    caller stamps/keeps `observed_at` in the key).
    */
  def sync(source: DataFrame, target: DataFrame, pks: Seq[String]): SyncResult = {
    val s = CanonicalJson.tableHash(source, pks)
    val t = CanonicalJson.tableHash(target, pks)
    val changes = HashDiff.diff(s, t, pks)
    val stats = changes.groupBy(col("change")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    val changedKeys = changes.filter(col("change").isin("new", "update"))
      .select(pks.map(col): _*)
    val upserts = source.join(changedKeys, pks, "left_semi")
    val deletedKeys = changes.filter(col("change") === "deleted").select(pks.map(col): _*)
    val deletions = target.join(deletedKeys, pks, "left_semi")
      .withColumn("status", lit("inactive"))
    val standard = upserts.unionByName(deletions)
    SyncResult(stats, standard, standard)
  }
}
