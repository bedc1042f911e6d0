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

  /** Table-level digest (reference A10 outer layer, `utils.py:29-42` +
    * `table_bases.py:169-216`): sha1 of the canonical JSON of the sorted
    * {row_key: row_hash} dict. Row hashing and sorting stay distributed;
    * the final chain is streamed through the driver's SHA-1 with
    * `toLocalIterator` — O(1) driver memory, matching the reference's
    * byte-exact dict-dump semantics. (A global ordered chain is inherently
    * sequential; pipelines that only need drift DETECTION at 100 TB should
    * diff per-row hashes instead — [[diff]] — and treat this digest as the
    * cheap database fingerprint it is in the reference.) */
  def tableDigest(df: DataFrame, pks: Seq[String]): String = {
    val it = CanonicalJson.tableHash(df, pks)
      .select(col("__key"), col("__hash")).orderBy(col("__key"))
      .toLocalIterator()
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.update("{".getBytes("UTF-8"))
    var first = true
    while (it.hasNext) {
      val r = it.next()
      val piece = (if (first) "" else ", ") +
        CanonicalJson.escapeString(r.getString(0)) + ": " +
        CanonicalJson.escapeString(r.getString(1))
      md.update(piece.getBytes("UTF-8"))
      first = false
    }
    md.update("}".getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Database-level digest over `tables − exclude` (reference E4 +
    * `utils.py:62-104`): sha1 of the sorted {table: table_digest} dict. */
  def databaseHash(tables: Map[String, (DataFrame, Seq[String])],
                   exclude: Set[String] = Set.empty): String = {
    val digests = tables.view.filterKeys(t => !exclude.contains(t)).toMap
      .map { case (name, (df, pks)) => name -> tableDigest(df, pks) }
    CanonicalJson.sha1Hex(CanonicalJson.serialize(digests))
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
