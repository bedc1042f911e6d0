package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Second-moment accumulator for the prefix-rotation trainer
  * ([[graft.similarity.Cosine.moment2Rotation]]): sums N · E[xxᵀ] over a
  * corpus of dim-vectors into ONE dim²+1 double buffer per partition
  * (slot 0 = row count, slots 1.. = the flattened outer-product sum,
  * row-major), merged map-side. The declarative alternative — posexplode
  * of the per-row outer product — materializes dim²+1 Catalyst rows PER
  * DOCUMENT before the combine (~50× per-value overhead: at dim=512 that
  * is 262k exploded rows per vector for 2MB of useful sums); this
  * aggregate touches each product exactly once in a primitive-double
  * loop. The shuffle payload is identical either way (one combined
  * buffer per partition) — the win is map-side CPU and allocation.
  *
  * The buffer sizes itself from the first vector seen and requires every
  * later vector (and every merged partner) to agree — a mixed-width
  * corpus fails loudly rather than folding mismatched products. Null
  * vectors are skipped (a null ROW carries no moment); a null ELEMENT
  * inside a vector is an error, matching the trainer's contract that
  * embeddings are dense. Buffer is dim²+1 doubles, so callers gate dim
  * (the trainer caps at [[graft.similarity.Cosine.MaxRotationDim]] —
  * the driver-side Jacobi O(dim³) bound binds long before this buffer).
  *
  * Output: array<double> of length dim²+1 (empty array when no rows) —
  * the exact map the posexplode pass produced, one row instead of dim²+1.
  */
case class MomentSumAgg(vec: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]]
    with UnaryLike[Expression] {

  override def child: Expression = vec

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val raw = vec.eval(input)
    if (raw == null) return buffer
    val arr = raw.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val dim = arr.numElements()
    val buf =
      if (buffer.isEmpty) new Array[Double](dim * dim + 1)
      else {
        require(buffer.length == dim * dim + 1,
          s"moment_sum: mixed vector widths ($dim vs buffer for " +
            s"${math.sqrt((buffer.length - 1).toDouble).round} dims)")
        buffer
      }
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      require(!arr.isNullAt(i),
        s"moment_sum: null element at position $i — embeddings must be dense")
      x(i) = arr.getDouble(i)
      i += 1
    }
    buf(0) += 1.0
    i = 0
    while (i < dim) {
      val xi = x(i)
      val base = 1 + i * dim
      var j = 0
      while (j < dim) { buf(base + j) += xi * x(j); j += 1 }
      i += 1
    }
    buf
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] =
    if (other.isEmpty) buffer
    else if (buffer.isEmpty) other.clone()
    else {
      require(buffer.length == other.length,
        s"moment_sum: merging buffers of different widths " +
          s"(${buffer.length} vs ${other.length})")
      var i = 0
      while (i < buffer.length) { buffer(i) += other(i); i += 1 }
      buffer
    }

  override def eval(buffer: Array[Double]): Any = {
    val out = new Array[Any](buffer.length)
    var i = 0
    while (i < buffer.length) { out(i) = buffer(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    var i = 0
    while (i < buffer.length) { bb.putDouble(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble; i += 1 }
    out
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "moment_sum"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    vec.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double>, got ${other.simpleString}")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): MomentSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MomentSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MomentSumAgg =
    copy(vec = newChild)
}

object MomentSumAgg {
  import org.apache.spark.sql.Column

  /** Column API: the dim²+1 moment sums (count, then the flattened
    * outer-product sum) of an array<double> column. */
  def momentSum(vec: Column): Column =
    Exprs.toColumn(MomentSumAgg(Exprs.toExpression(vec)).toAggregateExpression())
}
