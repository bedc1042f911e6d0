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
  * per element (exact) before multiplying. Null ELEMENTS are not supported
  * (embedding vectors are dense); null/length-mismatched VECTORS yield
  * null/truncated-to-shorter respectively, matching `zip_with`'s
  * truncation-free behavior only when lengths match — callers validate
  * dimension upstream.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
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
    val n = math.min(x.numElements(), y.numElements())
    val lf = isFloat(left); val rf = isFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val getA = if (isFloat(left)) "getFloat" else "getDouble"
      val getB = if (isFloat(right)) "getFloat" else "getDouble"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$getA($i)) * ((double) $b.$getB($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}
