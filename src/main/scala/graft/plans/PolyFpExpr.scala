package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** One-pass kernel for both polynomial document fingerprints (T4):
  * the full-document Rabin-Karp hash AND the winnowed min over all
  * w-token windows, from a single scan of the token-hash array.
  *
  * Replaces the declarative HOF form
  * ([[graft.text.TextAnalysis.rollingFingerprint]] /
  * [[graft.text.TextAnalysis.winnowedFingerprint]], kept as the
  * documented reference semantics and spec-pinned equal): higher-order
  * functions evaluate their lambda interpreted per element, and the
  * windowed variant recomputes each window from a fresh `slice` —
  * O(n·w) with an allocation per window. Here the window hash rolls
  * (subtract the leaving token's `x·b^(w-1)`, multiply, add the
  * entering token) — O(n), zero allocation, inside whole-stage codegen.
  *
  * All arithmetic stays exact in longs: values are < p ≈ 1e9, so the
  * largest intermediate (`x·b^(w-1) mod p` products ≈ 1e18) fits; the
  * recurrence is the same mod-p integer math as the HOF/oracle form,
  * so results are bit-identical.
  */
object PolyFp {
  def compute(arr: ArrayData, w: Int, b: Long, p: Long): InternalRow = {
    val n = arr.numElements()
    var poly = 0L
    var i = 0
    while (i < n) { poly = (poly * b + arr.getLong(i)) % p; i += 1 }
    var win = 0L
    if (n <= w) {
      // short doc: one truncated window = the whole-document hash
      win = poly
    } else {
      var h = 0L
      var j = 0
      while (j < w) { h = (h * b + arr.getLong(j)) % p; j += 1 }
      var min = h
      var bw = 1L
      var e = 0
      while (e < w - 1) { bw = bw * b % p; e += 1 }
      var s = 0
      while (s + w < n) {
        val drop = arr.getLong(s) * bw % p
        h = ((h - drop + p) % p * b + arr.getLong(s + w)) % p
        if (h < min) min = h
        s += 1
      }
      win = min
    }
    new GenericInternalRow(Array[Any](poly, win))
  }
}

/** `poly_fingerprints(token_hashes, w)` →
  * `struct<poly_fp:bigint, winnowed_fp:bigint>`. */
case class PolyFingerprintExpr(child: Expression, w: Int,
                               b: Long = 1009L, p: Long = 1000000007L)
    extends UnaryExpression with UnaryLike[Expression] {

  require(w >= 1, "window must be >= 1")

  override def dataType: DataType = StructType(Seq(
    StructField("poly_fp", LongType, nullable = false),
    StructField("winnowed_fp", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_fingerprints requires array<bigint> token hashes, got ${other.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    PolyFp.compute(v.asInstanceOf[ArrayData], w, b, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.PolyFp.compute($c, $w, ${b}L, ${p}L)")

  override def prettyName: String = "poly_fingerprints"
  override protected def withNewChildInternal(c: Expression): PolyFingerprintExpr =
    copy(child = c)
}

object PolyFingerprintExpr {
  import org.apache.spark.sql.Column

  def polyFingerprints(tokenHashes: Column, w: Int): Column =
    Exprs.toColumn(PolyFingerprintExpr(Exprs.toExpression(tokenHashes), w))
}
