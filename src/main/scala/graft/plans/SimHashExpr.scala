package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native one-pass SimHash kernel: given a document's token-hash array
  * (`array<long>`, values in the low `bits` bits), returns the SimHash
  * fingerprint — bit j of the result is set iff the (+1/−1) sum of bit j
  * across all token hashes is positive.
  *
  * Replaces the explode-based plan (token × 32 bit-rows → two shuffled
  * aggregations) with a map-side pass: no (doc, bit) shuffle at all, the
  * fingerprint column is computed inside whole-stage codegen during the
  * scan projection. At 100 TB this removes a 32×-token-count shuffle.
  *
  * Semantics match the composable form exactly: tokens keep their
  * multiplicity (frequency-weighted sum), a zero sum leaves the bit clear
  * (strict `> 0`), an empty array yields fingerprint 0.
  */
case class SimHashExpr(child: Expression, bits: Int = 32)
    extends UnaryExpression {

  require(bits > 0 && bits <= 63, "bits must be in 1..63")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint>, got ${other.simpleString}")
    }

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](bits)
    val n = xs.numElements()
    var e = 0
    while (e < n) {
      val x = xs.getLong(e)
      var j = 0
      while (j < bits) {
        if (((x >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      e += 1
    }
    var fp = 0L
    var j = 0
    while (j < bits) {
      if (counts(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val e = ctx.freshName("e")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val counts = ctx.freshName("counts")
      val fp = ctx.freshName("fp")
      s"""
         |final int $n = $c.numElements();
         |final int[] $counts = new int[$bits];
         |for (int $e = 0; $e < $n; $e++) {
         |  final long $x = $c.getLong($e);
         |  for (int $j = 0; $j < $bits; $j++) {
         |    if ((($x >> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
         |  }
         |}
         |long $fp = 0L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  if ($counts[$j] > 0) $fp |= (1L << $j);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })
}
