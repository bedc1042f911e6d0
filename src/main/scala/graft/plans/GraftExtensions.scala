package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions wiring: registers the engine's SQL surface —
  * `canonical_json(struct)` (native expression) and
  * `canonical_row_hash(struct)` = sha1(canonical_json(...)).
  *
  * Use at session build time
  * (`.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`), or register into a live
  * session with [[GraftExtensions.register]].
  *
  * Deliberately NO custom optimizer Rule / SparkStrategy: every operator
  * in SURVEY §2 is expressible with built-in relational operators that
  * Catalyst already optimizes (§4); the custom surface stays limited to
  * scalar serialization, where byte-level Python parity genuinely cannot
  * be expressed with built-ins.
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
      (children: Seq[Expression]) => DotProductExpr(children(0), children(1))))

  /** Register into an already-built session (idempotent — safe to call
    * from operator constructors). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(ident))
        spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
