package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

/** Python-`json.dumps(sort_keys=True)`-compatible canonical JSON + row
  * hashing (reference A10: `table_bases.py:169-216`, `utils.py:29-104`,
  * `table_fields.py:12-41`).
  *
  * The reference keys every row by the sorted-key JSON of its PK columns and
  * hashes the sorted-key JSON of the remaining columns (minus `observed_at`)
  * with sha1; table/database hashes fold those row hashes again. Byte
  * compatibility with CPython's `json.dumps` matters because the reference's
  * sync diff compares hashes produced by independent runs:
  *  - separators `", "` and `": "` (dumps defaults)
  *  - keys sorted lexicographically (codepoint order)
  *  - `ensure_ascii=True`: non-ASCII escaped as `\uXXXX`
  *  - floats in CPython `repr` shortest form; integral floats as `x.0`
  *  - `inf`/`nan` as bare `Infinity`/`-Infinity`/`NaN` tokens
  *
  * Scale: serialization + sha1 is a per-row map-side operation (no shuffle);
  * it runs inside a deterministic Scala UDF so whole-stage codegen treats it
  * as a black box but never materializes rows on the driver.
  */
object CanonicalJson {

  /** CPython-`repr` compatible float rendering: shortest correctly-rounded
    * digits (computed directly — JDK 17's `Double.toString` is round-trip
    * safe but not minimal), then CPython's fixed-vs-scientific rules
    * (scientific iff decimal exponent ≥ 16 or < −4; `.0` suffix on
    * integral fixed values; two-digit signed exponents). Verified against
    * CPython fixture hashes in CanonicalJsonSpec. */
  def pyFloatRepr(d: Double): String = {
    if (d.isNaN) return "NaN"
    if (d.isPosInfinity) return "Infinity"
    if (d.isNegInfinity) return "-Infinity"
    if (d == 0.0) return if (1.0 / d < 0) "-0.0" else "0.0"
    // CPython repr = the SHORTEST correctly-rounded decimal that parses
    // back to the same double. JDK 17's Double.toString is round-trip-safe
    // but not minimal (fixed by JDK-4511638 only in 19+), so find the
    // smallest precision whose %.{p}e representation round-trips — Java's
    // %e is correctly rounded, matching David Gay's digit choice.
    // Locale.ROOT: on comma-decimal default locales (de_DE, fr_FR) "%e"
    // renders "1,5e+00", which parseDouble rejects — hashes must not depend
    // on the host JVM's locale.
    var p = 0
    var s = String.format(java.util.Locale.ROOT, "%.0e", Double.box(d))
    while (java.lang.Double.parseDouble(s) != d && p < 17) {
      p += 1
      s = String.format(java.util.Locale.ROOT, "%." + p + "e", Double.box(d))
    }
    val Array(mant0, expStr0) = s.split("e")
    val sign = if (mant0.startsWith("-")) "-" else ""
    val digits = {
      val raw = mant0.stripPrefix("-").replace(".", "")
      val trimmed = raw.reverse.dropWhile(_ == '0').reverse
      if (trimmed.isEmpty) "0" else trimmed
    }
    val exp = expStr0.toInt
    if (exp >= 16 || exp < -4) {
      // python scientific style: 1e+16, 1.5e+17, 5e-324
      val mant = if (digits.length == 1) digits else s"${digits.head}.${digits.tail}"
      val esign = if (exp < 0) "-" else "+"
      val ea = math.abs(exp)
      val eStr = if (ea < 10) s"0$ea" else ea.toString
      s"$sign${mant}e$esign$eStr"
    } else if (exp >= 0) {
      // fixed, integral part exists; integral doubles get a ".0" suffix
      if (digits.length <= exp + 1) s"$sign${digits.padTo(exp + 1, '0')}.0"
      else s"$sign${digits.take(exp + 1)}.${digits.drop(exp + 1)}"
    } else {
      s"${sign}0.${"0" * (-exp - 1)}$digits"
    }
  }

  def escapeString(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' || c > '~' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }

  /** Serialize a Scala value tree the way `json.dumps(v, sort_keys=True)`
    * would. Accepts Map/Seq/Row-free primitive trees. */
  def serialize(v: Any): String = v match {
    case null => "null"
    case None => "null"
    case Some(x) => serialize(x)
    case b: Boolean => if (b) "true" else "false"
    case s: String => escapeString(s)
    case d: Double => pyFloatRepr(d)
    case f: Float => pyFloatRepr(f.toDouble)
    case n: java.lang.Number => n.toString
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, vv) => (k.toString, vv) }
        .sortBy(_._1)
        .map { case (k, vv) => s"${escapeString(k)}: ${serialize(vv)}" }
        .mkString("{", ", ", "}")
    case s: Iterable[_] => s.map(serialize).mkString("[", ", ", "]")
    case a: Array[_] => a.map(serialize).mkString("[", ", ", "]")
    case ts: java.sql.Timestamp => escapeString(ts.toInstant.toString)
    case other => escapeString(other.toString)
  }

  /** A Spark Row (with schema) → sorted-key map tree. */
  def rowToMap(r: Row): ListMap[String, Any] = {
    val fields = r.schema.fieldNames.zipWithIndex.map { case (n, i) =>
      n -> (r.get(i) match {
        case nested: Row => rowToMap(nested)
        case seq: scala.collection.Seq[_] =>
          seq.map { case rr: Row => rowToMap(rr); case x => x }
        case x => x
      })
    }
    ListMap(fields.sortBy(_._1).toIndexedSeq: _*)
  }

  def sha1Hex(s: String): String =
    MessageDigest.getInstance("SHA-1").digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Canonical-JSON UDF over a struct column; deterministic so Catalyst may
    * still reorder surrounding operators freely. */
  private val canonDet = udf((r: Row) => serialize(rowToMap(r)))
  private val rowHashUdfImpl = udf((r: Row) => sha1Hex(serialize(rowToMap(r))))

  /** JSON of the given columns, keys sorted, python-dumps formatting. */
  def canonical(cols: Seq[(String, Column)]): Column =
    canonDet(struct(cols.sortBy(_._1).map { case (n, c) => c.as(n) }: _*))

  /** sha1 hex of the canonical JSON of the given columns. */
  def rowHash(cols: Seq[(String, Column)]): Column =
    rowHashUdfImpl(struct(cols.sortBy(_._1).map { case (n, c) => c.as(n) }: _*))

  /** Reference `ScModel.hash` (table_bases.py:169-216): returns the df with
    * `__key` = canonical JSON of PK columns and `__hash` = sha1 of canonical
    * JSON of all other columns except `observed_at`. */
  def tableHash(df: DataFrame, pks: Seq[String], exclude: Seq[String] = Seq("observed_at")): DataFrame = {
    val valueCols = df.columns.filterNot(c => pks.contains(c) || exclude.contains(c)).toSeq
    df.withColumn("__key", canonical(pks.map(n => n -> col(n))))
      .withColumn("__hash", rowHash(valueCols.map(n => n -> col(n))))
  }

  /** [[tableHash]] via the native Catalyst expression
    * ([[graft.plans.CanonicalJsonExpr]], registered by
    * [[graft.plans.GraftExtensions]]) — same bytes, no UDF row conversion.
    * Requires the functions to be registered on the session. */
  def tableHashNative(df: DataFrame, pks: Seq[String],
                      exclude: Seq[String] = Seq("observed_at")): DataFrame = {
    def structSql(cols: Seq[String]) =
      cols.map(c => s"`$c`").mkString("struct(", ", ", ")")
    val valueCols = df.columns.filterNot(c => pks.contains(c) || exclude.contains(c)).toSeq
    df.withColumn("__key", expr(s"canonical_json(${structSql(pks)})"))
      .withColumn("__hash", expr(s"canonical_row_hash(${structSql(valueCols)})"))
  }
}
