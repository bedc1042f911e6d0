package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-contract queries: Spark implementation plus the
  * equivalent ANSI SQL the DuckDB oracle runs on the same parquet tables.
  * Queries without SQL-expressible semantics appear only in `queries`
  * (driver falls back to a rows-only check). */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracle: Map[String, String]
}
