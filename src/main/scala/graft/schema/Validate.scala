package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema validation + default filling (reference P1, `insert.py:75-112`):
  * incoming loosely-typed rows are conformed to a declared StructType —
  * missing columns added as nulls, present columns cast, defaults filled,
  * domain/nullability violations surfaced. The pydantic runtime validator
  * becomes a wide `select` of casts, which Catalyst folds into the scan. */
object Validate {

  /** Conform `df` to `schema`: add missing columns as typed nulls, cast
    * existing ones, apply `defaults` for null values, order columns. */
  def conform(df: DataFrame, schema: StructType,
              defaults: Map[String, Any] = Map.empty): DataFrame = {
    val cols: Seq[Column] = schema.fields.toSeq.map { field =>
      val base =
        if (df.columns.contains(field.name)) col(field.name).cast(field.dataType)
        else lit(null).cast(field.dataType)
      val withDefault = defaults.get(field.name) match {
        case Some(d) => coalesce(base, lit(d).cast(field.dataType))
        case None => base
      }
      withDefault.as(field.name)
    }
    df.select(cols: _*)
  }

  /** Per-row violation report: null non-nullable columns and enum-domain
    * breaches. Returns (name of first violated check) or null — usable both
    * to fail fast and to route bad rows to a quarantine sink. */
  def violations(schema: StructType,
                 domains: Map[String, Seq[String]] = Map.empty): Column = {
    val nullChecks = schema.fields.toSeq.filterNot(_.nullable).map { field =>
      when(col(field.name).isNull, lit(s"null:${field.name}"))
    }
    val domainChecks = domains.toSeq.map { case (name, dom) =>
      when(col(name).isNotNull && !col(name).isin(dom: _*), lit(s"domain:$name"))
    }
    coalesce((nullChecks ++ domainChecks) :+ lit(null).cast(StringType): _*)
  }

  /** Split into (valid, invalid-with-reason). */
  def partition(df: DataFrame, schema: StructType,
                domains: Map[String, Seq[String]] = Map.empty): (DataFrame, DataFrame) = {
    val flagged = df.withColumn("__violation", violations(schema, domains))
    (flagged.filter(col("__violation").isNull).drop("__violation"),
      flagged.filter(col("__violation").isNotNull))
  }
}
