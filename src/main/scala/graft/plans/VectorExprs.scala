package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over `array<float>` / `array<double>`
  * columns — the hot scalar of every embedding-similarity operator.
  *
  * The composable form (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) is
  * correct but allocates an intermediate array per row pair and evaluates
  * the lambdas on Catalyst's higher-order-function path; inside an
  * all-pairs similarity join that is the entire inner loop. This
  * expression generates a tight primitive loop (no allocation, no boxing)
  * and stays inside whole-stage codegen.
  *
  * Accumulation is sequential left-to-right in double precision —
  * bit-identical to the fold form and to an external oracle computing
  * `SUM(a[i]*b[i])` in index order with doubles. Float inputs are widened
  * per element (exact) before multiplying. Null semantics match the
  * `aggregate(zip_with(...))` form exactly: a null vector, a length
  * mismatch (zip_with pads the shorter side with null), or any null
  * element yields NULL — a malformed embedding row surfaces as NULL, never
  * as a plausible-looking truncated similarity.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // Element-null checks are emitted only when the schema admits null
  // elements — dense embedding arrays (containsNull=false) keep a
  // branch-free inner loop.
  private def mayHaveNullElems(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = isFloat(left); val rf = isFloat(right)
    val checkNulls = mayHaveNullElems(left) || mayHaveNullElems(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val getA = if (isFloat(left)) "getFloat" else "getDouble"
      val getB = if (isFloat(right)) "getFloat" else "getDouble"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nullCheck =
        if (mayHaveNullElems(left) || mayHaveNullElems(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += ((double) $a.$getA($i)) * ((double) $b.$getB($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}
