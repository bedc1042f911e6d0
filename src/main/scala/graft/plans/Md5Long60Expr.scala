package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit md5 key: the engine's ubiquitous
  * `conv(substring(md5(s), 1, 15), 16, 10) :: long` hashing chain as ONE
  * codegen'd expression, bit-identical by construction — the first 15 hex
  * nibbles of the digest ARE its first 8 bytes (big-endian) shifted right
  * a nibble, so the value is computed straight from the digest bytes with
  * no 32-char hex string, no substring copy, and no base-16 string parse
  * per call (optimization guide §1.2 "per-task work": the chain runs once
  * per SHINGLE in the dedup family — the single largest compute sink the
  * round-14 profile found, e.g. d10 ≈ 64 s and t25 ≈ 33 s of summed task
  * time at sf0.1, almost all of it in this chain).
  *
  * Identical null/unicode semantics: null in → null out; the digest runs
  * over the string's UTF-8 bytes exactly as Spark's `md5` (which hashes
  * the `cast(s as binary)` representation). `Md5Long60Spec` pins value
  * parity against the composed chain on ASCII/unicode/empty inputs, and
  * every md5-keyed oracle gate re-proves it end-to-end (the DuckDB side
  * recomputes the same chain from SQL). */
case class Md5Long60Expr(child: Expression, nibbles: Int = 15)
    extends UnaryExpression {

  require(nibbles >= 1 && nibbles <= 15,
    s"nibbles must be in 1..15 (a long holds 15 hex digits unsigned), got $nibbles")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_long60"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got ${other.simpleString}")
    }

  override protected def withNewChildInternal(newChild: Expression): Md5Long60Expr =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    Md5Long60Expr.hash(input.asInstanceOf[UTF8String], nibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Md5Long60Expr.hash($c, $nibbles);")
}

object Md5Long60Expr {
  // MessageDigest is stateful and not thread-safe; one per task thread,
  // reset per call — getInstance per call was ~30% of the chain's cost
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First `nibbles` hex digits of md5(utf8 bytes) as a long: big-endian
    * first 8 digest bytes, shifted right to keep the leading 4·nibbles
    * bits — exactly `parseLong(hex.substring(0, nibbles), 16)`. */
  def hash(s: UTF8String, nibbles: Int): Long = {
    val d = digests.get()
    d.reset()
    val out = d.digest(s.getBytes)
    val top =
      ((out(0) & 0xffL) << 56) | ((out(1) & 0xffL) << 48) |
      ((out(2) & 0xffL) << 40) | ((out(3) & 0xffL) << 32) |
      ((out(4) & 0xffL) << 24) | ((out(5) & 0xffL) << 16) |
      ((out(6) & 0xffL) << 8) | (out(7) & 0xffL)
    top >>> (64 - 4 * nibbles)
  }

  /** Column form — drop-in for the composed 15-nibble (60-bit) chain. */
  def md5Long60(c: Column): Column =
    Exprs.toColumn(Md5Long60Expr(Exprs.toExpression(c)))

  /** Column form at an explicit prefix width (SimHash uses 8 nibbles). */
  def md5Long(c: Column, nibbles: Int): Column =
    Exprs.toColumn(Md5Long60Expr(Exprs.toExpression(c), nibbles))
}
