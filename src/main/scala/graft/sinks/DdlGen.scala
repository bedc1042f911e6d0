package graft.sinks

import graft.schema.Schemas
import org.apache.spark.sql.types._

/** DDL generation (reference K5, `cli.py:124-163`): emit CREATE TABLE for a
  * chosen SQL dialect from the schema registry. Nested/array/map columns
  * serialize as JSON text columns, matching the reference's
  * JSON-in-TEXT storage model. */
object DdlGen {

  sealed trait Dialect { def name: String }
  case object Sqlite extends Dialect { val name = "sqlite" }
  case object Postgres extends Dialect { val name = "postgres" }
  case object Derby extends Dialect { val name = "derby" }

  def sqlType(t: DataType, d: Dialect): String = t match {
    case StringType => d match {
      case Derby => "VARCHAR(4096)"
      case _ => "TEXT"
    }
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case DoubleType => d match {
      case Sqlite => "REAL"
      case _ => "DOUBLE PRECISION"
    }
    case BooleanType => d match {
      case Sqlite => "INTEGER"
      case _ => "BOOLEAN"
    }
    case TimestampType => "TIMESTAMP"
    case _: ArrayType | _: MapType | _: StructType => sqlType(StringType, d) // JSON text
    case DecimalType() => "DECIMAL(18,4)"
    case other => throw new IllegalArgumentException(s"no SQL mapping for $other")
  }

  /** Identifier quoting: Derby rejects reserved words (`key`, `value`) and
    * leading underscores (`_metadata`) unquoted; quoting the UPPERCASED
    * name is byte-equivalent to the unquoted form for ordinary names
    * (unquoted Derby identifiers fold to uppercase), so existing tables
    * are unaffected. sqlite/postgres accept these names bare. */
  def quote(id: String, d: Dialect): String = d match {
    case Derby => "\"" + id.toUpperCase + "\""
    case _ => id
  }

  def createTable(table: String, schema: StructType, pks: Seq[String], d: Dialect): String = {
    val cols = schema.fields.map { field =>
      val notNull = if (!field.nullable || pks.contains(field.name)) " NOT NULL" else ""
      s"  ${quote(field.name, d)} ${sqlType(field.dataType, d)}$notNull"
    }
    val pk =
      if (pks.nonEmpty) Seq(s"  PRIMARY KEY (${pks.map(quote(_, d)).mkString(", ")})")
      else Nil
    s"CREATE TABLE ${quote(table, d)} (\n${(cols ++ pk).mkString(",\n")}\n)"
  }

  /** DDL for every registered table (and optional `_scd` twins). */
  def allTables(d: Dialect, scd: Boolean = false): Seq[String] =
    Schemas.tables.toSeq.sortBy(_._1).map { case (name, (schema, pks)) =>
      if (scd) createTable(s"${name}_scd", schema, Schemas.scdKey(name), d)
      else createTable(name, schema, pks, d)
    }
}
