package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are organized in [[graft.queries.QueryPack]]s; this object only
  * aggregates them. */
object SparkEntry {

  private[graft] val packs: Seq[QueryPack] =
    Seq(CoreQueries, ScoreQueries, TextQueries, SimilarityQueries,
      ReshapeQueries, MiscQueries, LifecycleQueries, MultimodalQueries)

  /** Flagship query on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * the workload-score composite — the reference's richest dataflow. */
  def entry(spark: SparkSession): DataFrame =
    ScoreQueries.queries("a3_weighted_geomean")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = packs.flatMap(_.oracle).toMap
}
