package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions wiring: registers the engine's SQL surface —
  * `canonical_json(struct)` / `canonical_row_hash(struct)` (Python-parity
  * serialization), `dot_product(a, b)` (codegen'd vector kernel),
  * `simhash(token_hashes[, bits])` (one-pass fingerprint), and
  * `kmv_distinct(h, k)` (bounded-state cardinality sketch aggregate) — so
  * `spark.sql(...)` users get the same operators as the Column API.
  *
  * Use at session build time
  * (`.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`), or register into a live
  * session with [[GraftExtensions.register]].
  *
  * Deliberately NO custom optimizer Rule / SparkStrategy: every operator
  * in SURVEY §2 is expressible with built-in relational operators that
  * Catalyst already optimizes (§4); the custom surface stays limited to
  * scalar/aggregate functions whose semantics (byte-level Python parity,
  * bounded sketch state) genuinely cannot be expressed with built-ins.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {
  private def sha1Of(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Sha1(
      org.apache.spark.sql.catalyst.expressions.Cast(e,
        org.apache.spark.sql.types.BinaryType))

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("canonical_json"),
      new ExpressionInfo(classOf[CanonicalJsonExpr].getName, "canonical_json"),
      (children: Seq[Expression]) => CanonicalJsonExpr(children.head)),
    (FunctionIdentifier("canonical_row_hash"),
      new ExpressionInfo(classOf[CanonicalJsonExpr].getName, "canonical_row_hash"),
      (children: Seq[Expression]) => sha1Of(CanonicalJsonExpr(children.head))),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "dot_product"),
      (children: Seq[Expression]) => DotProductExpr(children(0), children(1))),
    (FunctionIdentifier("simhash"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "simhash"),
      (children: Seq[Expression]) => children match {
        case Seq(arr) => SimHashExpr(arr)
        case Seq(arr, bits) => SimHashExpr(arr, litInt(bits, "simhash bits"))
        case _ => throw new IllegalArgumentException(
          "simhash(token_hashes[, bits]) takes 1 or 2 arguments")
      }),
    // aggregate: the registry takes the bare AggregateFunction; the
    // analyzer wraps it in AggregateExpression at the use site (same as
    // built-in sum/avg)
    (FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[KmvSketchAgg].getName, "kmv_distinct"),
      (children: Seq[Expression]) => children match {
        case Seq(h, k) => KmvSketchAgg(h, litInt(k, "kmv_distinct k"))
        case _ => throw new IllegalArgumentException(
          "kmv_distinct(hash, k) takes exactly 2 arguments")
      }),
    (FunctionIdentifier("bottom_k_values"),
      new ExpressionInfo(classOf[BottomKAgg].getName, "bottom_k_values"),
      (children: Seq[Expression]) => children match {
        case Seq(h, v, k) => BottomKAgg(h, v, litInt(k, "bottom_k_values k"))
        case _ => throw new IllegalArgumentException(
          "bottom_k_values(hash, value, k) takes exactly 3 arguments")
      }),
    (FunctionIdentifier("bottom_k_state"),
      new ExpressionInfo(classOf[BottomKStateAgg].getName, "bottom_k_state"),
      (children: Seq[Expression]) => children match {
        case Seq(h, v, k) => BottomKStateAgg(h, v, litInt(k, "bottom_k_state k"))
        case _ => throw new IllegalArgumentException(
          "bottom_k_state(hash, value, k) takes exactly 3 arguments")
      }),
    (FunctionIdentifier("bottom_k_merge"),
      new ExpressionInfo(classOf[BottomKMergeAgg].getName, "bottom_k_merge"),
      (children: Seq[Expression]) => children match {
        case Seq(s, k) => BottomKMergeAgg(s, litInt(k, "bottom_k_merge k"))
        case _ => throw new IllegalArgumentException(
          "bottom_k_merge(state, k) takes exactly 2 arguments")
      }),
    (FunctionIdentifier("kmv_state"),
      new ExpressionInfo(classOf[KmvStateAgg].getName, "kmv_state"),
      (children: Seq[Expression]) => children match {
        case Seq(h, k) => KmvStateAgg(h, litInt(k, "kmv_state k"))
        case _ => throw new IllegalArgumentException(
          "kmv_state(hash, k) takes exactly 2 arguments")
      }),
    (FunctionIdentifier("kmv_merge"),
      new ExpressionInfo(classOf[KmvMergeAgg].getName, "kmv_merge"),
      (children: Seq[Expression]) => children match {
        case Seq(s, k) => KmvMergeAgg(s, litInt(k, "kmv_merge k"))
        case _ => throw new IllegalArgumentException(
          "kmv_merge(sketch, k) takes exactly 2 arguments")
      }),
    (FunctionIdentifier("bloom_state"),
      new ExpressionInfo(classOf[BloomStateAgg].getName, "bloom_state"),
      (children: Seq[Expression]) => children match {
        case Seq(h, m, j) => BloomStateAgg(h,
          litInt(m, "bloom_state numBits"), litInt(j, "bloom_state numHashes"))
        case _ => throw new IllegalArgumentException(
          "bloom_state(hash, numBits, numHashes) takes exactly 3 arguments")
      }),
    (FunctionIdentifier("bloom_merge"),
      new ExpressionInfo(classOf[BloomMergeAgg].getName, "bloom_merge"),
      (children: Seq[Expression]) => children match {
        case Seq(s) => BloomMergeAgg(s)
        case _ => throw new IllegalArgumentException(
          "bloom_merge(state) takes exactly 1 argument")
      }),
    (FunctionIdentifier("poly_fingerprints"),
      new ExpressionInfo(classOf[PolyFingerprintExpr].getName, "poly_fingerprints"),
      (children: Seq[Expression]) => children match {
        case Seq(arr, w) => PolyFingerprintExpr(arr, litInt(w, "poly_fingerprints w"))
        case _ => throw new IllegalArgumentException(
          "poly_fingerprints(token_hashes, w) takes exactly 2 arguments")
      }),
    (FunctionIdentifier("mg_summary"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "mg_summary"),
      (children: Seq[Expression]) => children match {
        case Seq(h, k) => MisraGriesAgg(h, litInt(k, "mg_summary k"))
        case _ => throw new IllegalArgumentException(
          "mg_summary(hash, k) takes exactly 2 arguments")
      }),
    (FunctionIdentifier("mg_merge"),
      new ExpressionInfo(classOf[MgMergeAgg].getName, "mg_merge"),
      (children: Seq[Expression]) => children match {
        case Seq(s, k) => MgMergeAgg(s, litInt(k, "mg_merge k"))
        case _ => throw new IllegalArgumentException(
          "mg_merge(summary, k) takes exactly 2 arguments")
      }),
    (FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(classOf[BloomContains].getName, "bloom_contains"),
      (children: Seq[Expression]) => children match {
        case Seq(s, h) => BloomContains(s, h)
        case _ => throw new IllegalArgumentException(
          "bloom_contains(state, hash) takes exactly 2 arguments")
      }))

  private def litInt(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
      org.apache.spark.sql.types.IntegerType) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long,
      org.apache.spark.sql.types.LongType)
      if v >= Int.MinValue && v <= Int.MaxValue => v.toInt
    case _ => throw new IllegalArgumentException(
      s"$what must be an int-range integer literal")
  }

  /** Register into an already-built session (idempotent — safe to call
    * from operator constructors). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(ident))
        spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
