package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native one-pass MinHash signature kernel: given a document's hashed
  * shingle array (`array<long>`), returns the k-element signature
  * `sig[i] = min over shingles of (a_i·(x mod shingleMod) + b_i) mod p`.
  *
  * The composable form (`array_min(transform(...))` × k) walks the shingle
  * array k times through the higher-order-function evaluator, boxing every
  * element; this kernel is one primitive pass (shingles outer, hashes
  * inner) inside whole-stage codegen. Values are identical — the same
  * integer arithmetic in the same domain (products stay ≪ 2^63).
  *
  * An EMPTY shingle array yields Long.MaxValue sentinels (the upstream
  * shingler emits ≥ 1 shingle for any document, including the empty one,
  * so this case does not occur in the pipeline).
  */
case class MinHashSigExpr(child: Expression, a: Seq[Long], b: Seq[Long],
                          shingleMod: Long, p: Long)
    extends UnaryExpression {

  require(a.nonEmpty && a.length == b.length, "coefficient arrays must match")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint>, got ${other.simpleString}")
    }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)

  private lazy val aArr: Array[Long] = a.toArray
  private lazy val bArr: Array[Long] = b.toArray

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val k = aArr.length
    val mins = Array.fill(k)(Long.MaxValue)
    var e = 0
    val n = xs.numElements()
    while (e < n) {
      // floorMod: Java % is sign-preserving, so a negative input long would
      // produce negative signatures and diverge from the composable
      // `pmod`-based path — floorMod matches it for the full long domain
      val x = java.lang.Math.floorMod(xs.getLong(e), shingleMod)
      var h = 0
      while (h < k) {
        val v = (aArr(h) * x + bArr(h)) % p
        if (v < mins(h)) mins(h) = v
        h += 1
      }
      e += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
      val k = aArr.length
      val n = ctx.freshName("n")
      val e = ctx.freshName("e")
      val h = ctx.freshName("h")
      val x = ctx.freshName("x")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      s"""
         |final int $n = $c.numElements();
         |final long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $e = 0; $e < $n; $e++) {
         |  final long $x = java.lang.Math.floorMod($c.getLong($e), ${shingleMod}L);
         |  for (int $h = 0; $h < $k; $h++) {
         |    final long $v = ($aRef[$h] * $x + $bRef[$h]) % ${p}L;
         |    if ($v < $mins[$h]) $mins[$h] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
}
