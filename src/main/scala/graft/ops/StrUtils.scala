package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** P8 string utilities (reference `str_utils.py:5-80`): CamelCase →
  * snake_case table naming, the (deliberately naive) pluralizer, wrapping
  * helpers, and last-number extraction. The reference uses these at
  * class-definition time to derive table names; here they exist both as
  * plain Scala (for the same compile-time naming role) and as Column
  * expressions (so frames can derive the identical names at scale,
  * map-side).
  *
  * Quirks are preserved on purpose — `plural("boy")` is "boies" in the
  * reference (its docstring facepalms at itself) and table names derived
  * here must match the reference's exactly.
  */
object StrUtils {

  /** Wrap between `before`/`after` unless empty. */
  def wrap(text: String, before: String = " ", after: String = " "): String =
    if (text.isEmpty) text else before + text + after

  /** Space after unless empty. */
  def spaceAfter(text: String): String = wrap(text, before = "")

  /** CamelCase → snake_case (`str_utils.py:22-35`): break before each
    * [A-Z][a-z]+ run, split on whitespace, join with underscores. */
  def snakeCase(text: String): String =
    text.replaceAll("([A-Z][a-z]+)", " $1").trim.split("\\s+")
      .filter(_.nonEmpty).mkString("_").toLowerCase

  /** Naive pluralization (`str_utils.py:38-61`), quirks included. */
  def plural(text: String): String =
    if (text.matches(".*[sxz]$") || text.matches(".*[^aeioudgkprt]h$")) text + "es"
    else if (text.matches(".*[aeiou]y$")) text.dropRight(1) + "ies"
    else text + "s"

  /** Model-class name → table name: `snake_case(cls.__name__)`
    * (`table_bases.py:134`); no pluralization in the reference. */
  def tableName(className: String): String = snakeCase(className)

  /** Last non-negative number in the string, if any
    * (`str_utils.py:64-80`). */
  def extractLastNumber(text: String): Option[Double] = {
    val m = java.util.regex.Pattern.compile("([\\d\\.]+)[^0-9]*$").matcher(text)
    if (m.find()) scala.util.Try(m.group(1).toDouble).toOption else None
  }

  // ------------------------------------------------- Column equivalents

  /** snake_case as a codegen'd column chain (same regex steps). */
  def snakeCaseCol(c: Column): Column =
    lower(concat_ws("_",
      split(trim(regexp_replace(c, "([A-Z][a-z]+)", " $1")), "\\s+")))

  /** plural as a column expression (same branch order as the reference). */
  def pluralCol(c: Column): Column =
    when(c.rlike("[sxz]$") || c.rlike("[^aeioudgkprt]h$"), concat(c, lit("es")))
      .when(c.rlike("[aeiou]y$"), regexp_replace(c, "y$", "ies"))
      .otherwise(concat(c, lit("s")))

  /** Last non-negative number as a column (null when absent). */
  def extractLastNumberCol(c: Column): Column =
    nullif(regexp_extract(c, "([\\d\\.]+)[^0-9]*$", 1), lit("")).cast("double")
}
