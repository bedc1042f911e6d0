package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K6: the release-metadata sink (reference `cli.py:242-319`,
  * `metadata set/get`): a 2-column key/value table written with merge
  * (upsert-on-key) semantics. Always records the crawler version and the
  * publication timestamp; `published_by` is added when a CI run URL is
  * known; arbitrary extra pairs ride along. */
object MetadataSink {

  val Table = "_metadata"

  /** The metadata frame for one release: version + published_at always,
    * published_by when provided, then extra pairs (later duplicates of a
    * key win, like the reference's sequential `session.merge`). */
  def rows(spark: SparkSession, version: String,
           publishedAt: java.sql.Timestamp,
           publishedBy: Option[String] = None,
           extra: Seq[(String, String)] = Seq.empty): DataFrame = {
    import spark.implicits._
    val base = Seq(
      "sc_version" -> version,
      "published_at" -> publishedAt.toString) ++
      publishedBy.map("published_by" -> _).toSeq ++ extra
    graft.ops.Dedup.keepLast(
      base.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
        .toDF("key", "value", "__seq"),
      Seq("key"), Seq(col("__seq"))).drop("__seq")
  }

  /** Upsert the pairs into the `_metadata` table (PK = key), conformed to
    * the registry schema (status/observed_at ride along like every other
    * sink). */
  def write(df: DataFrame, url: String, dialect: DdlGen.Dialect,
            observedAt: java.sql.Timestamp): Unit = {
    val conformed = graft.schema.Validate
      .conform(df, graft.schema.Schemas.tables(Table)._1, Map("status" -> "active"))
      .withColumn("observed_at", coalesce(col("observed_at"), lit(observedAt)))
    Upsert.writeJdbc(conformed, url, Table, Seq("key"), dialect)
  }
}
