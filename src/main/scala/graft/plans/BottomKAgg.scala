package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** PER-GROUP bottom-k hash sample as a native Catalyst aggregate: keeps
  * the `k` (hash, value) pairs with the smallest hashes seen in the
  * group — [[graft.ops.BottomK]]'s deterministic uniform sample, but per
  * GROUP, which the declarative alternatives get wrong at 100 TB:
  *  - `Window.partitionBy(g).orderBy(h)` + `row_number <= k` SORTS every
  *    group's full row set (a corpus-wide sort for a k-row answer);
  *  - `sort_array(collect_list(...))` holds unbounded per-group state.
  * This aggregate's state is ≤ k (hash, value) pairs — 16k bytes —
  * map-side combined and MERGEABLE (min-k of a set is a function of the
  * set), so the per-group sample is identical under any partitioning.
  *
  * Output: the sampled VALUES ordered by hash ascending (array<bigint>) —
  * feed them to `percentile`/histograms for per-group data cards.
  * Duplicate hashes keep ONE entry, resolved to the smallest value — a
  * deterministic policy, so even colliding inputs stay a function of the
  * set (unreachable with the unique-id md5 keys the in-repo callers
  * use). */
case class BottomKAgg(hash: Expression, value: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Long]]
    with BinaryLike[Expression] {

  require(k >= 1, "k must be >= 1")

  override def left: Expression = hash
  override def right: Expression = value

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Long] =
    new java.util.TreeMap[java.lang.Long, java.lang.Long]()

  private def add(buffer: java.util.TreeMap[java.lang.Long, java.lang.Long],
                  h: Long, v: Long): Unit =
    if (buffer.size < k || h <= buffer.lastKey()) {
      // hash collision with a DIFFERENT value: keep the smaller value —
      // a deterministic merge policy, so the sample stays a function of
      // the input SET under any partition/merge order (first-write-wins
      // would be order-dependent). Unreachable with the md5-of-unique-id
      // keys the in-repo callers use; matters for arbitrary SQL inputs.
      val prev = buffer.get(h)
      if (prev == null || v < prev) buffer.put(h, v)
      if (buffer.size > k) buffer.pollLastEntry()
    }

  override def update(buffer: java.util.TreeMap[java.lang.Long, java.lang.Long],
                      input: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null)
      add(buffer, h.asInstanceOf[Long], v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: java.util.TreeMap[java.lang.Long, java.lang.Long],
                     other: java.util.TreeMap[java.lang.Long, java.lang.Long]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(buffer, e.getKey, e.getValue)
    }
    buffer
  }

  override def eval(buffer: java.util.TreeMap[java.lang.Long, java.lang.Long]): Any = {
    val out = new Array[Any](buffer.size)
    val it = buffer.values().iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.TreeMap[java.lang.Long, java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.size * 16)
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); bb.putLong(e.getKey); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val out = new java.util.TreeMap[java.lang.Long, java.lang.Long]()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 16) out.put(bb.getLong, bb.getLong)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k_values"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (hash.dataType, value.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (bigint hash, bigint value), got $other")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): BottomKAgg =
    copy(hash = newLeft, value = newRight)
}

/** The sample STATE as a storable value (binary (hash, value) pairs) —
  * store one per day/shard/source, merge later with [[BottomKMergeAgg]]:
  * incremental per-group quantile maintenance without re-reading old
  * data (the [[KmvStateAgg]]/[[KmvMergeAgg]] pattern for quantiles). */
case class BottomKStateAgg(hash: Expression, value: Expression, k: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Long]]
    with BinaryLike[Expression] {
  private val inner = BottomKAgg(hash, value, k)
  override def left: Expression = hash
  override def right: Expression = value
  override def createAggregationBuffer() = inner.createAggregationBuffer()
  override def update(b: java.util.TreeMap[java.lang.Long, java.lang.Long],
                      in: InternalRow) = inner.update(b, in)
  override def merge(b: java.util.TreeMap[java.lang.Long, java.lang.Long],
                     o: java.util.TreeMap[java.lang.Long, java.lang.Long]) =
    inner.merge(b, o)
  override def eval(b: java.util.TreeMap[java.lang.Long, java.lang.Long]): Any =
    serialize(b)
  override def serialize(b: java.util.TreeMap[java.lang.Long, java.lang.Long]) =
    inner.serialize(b)
  override def deserialize(bytes: Array[Byte]) = inner.deserialize(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k_state"
  override def checkInputDataTypes() = inner.checkInputDataTypes()
  override def withNewMutableAggBufferOffset(o: Int): BottomKStateAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKStateAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BottomKStateAgg =
    copy(hash = l, value = r)
}

/** Union of STORED samples: min-k of a union is exact (the k smallest
  * of A ∪ B are among the per-part k smallest), so
  * merge(sample(A), sample(B)) ≡ sample(A ∪ B) — the merged quantile
  * card equals the direct one bit-for-bit. */
case class BottomKMergeAgg(child: Expression, k: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Long]]
    with UnaryLike[Expression] {
  private val inner = BottomKAgg(child, child, k) // only (de)serialize/merge used
  override def createAggregationBuffer() = inner.createAggregationBuffer()
  override def update(b: java.util.TreeMap[java.lang.Long, java.lang.Long],
                      in: InternalRow) = child.eval(in) match {
    case null => b
    case bytes: Array[Byte] => inner.merge(b, inner.deserialize(bytes))
  }
  override def merge(b: java.util.TreeMap[java.lang.Long, java.lang.Long],
                     o: java.util.TreeMap[java.lang.Long, java.lang.Long]) =
    inner.merge(b, o)
  override def eval(b: java.util.TreeMap[java.lang.Long, java.lang.Long]): Any =
    inner.eval(b)
  override def serialize(b: java.util.TreeMap[java.lang.Long, java.lang.Long]) =
    inner.serialize(b)
  override def deserialize(bytes: Array[Byte]) = inner.deserialize(bytes)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k_merge"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires binary sample state, got ${other.simpleString}")
    }
  override def withNewMutableAggBufferOffset(o: Int): BottomKMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BottomKMergeAgg =
    copy(child = c)
}

object BottomKAgg {
  import org.apache.spark.sql.Column

  /** Column API: per-group sampled values ordered by hash. */
  def bottomKValues(hash: Column, value: Column, k: Int): Column =
    Exprs.toColumn(BottomKAgg(Exprs.toExpression(hash),
      Exprs.toExpression(value), k).toAggregateExpression())

  /** Storable sample state (binary). */
  def bottomKState(hash: Column, value: Column, k: Int): Column =
    Exprs.toColumn(BottomKStateAgg(Exprs.toExpression(hash),
      Exprs.toExpression(value), k).toAggregateExpression())

  /** Sampled values over a union of stored states. */
  def bottomKMerge(state: Column, k: Int): Column =
    Exprs.toColumn(BottomKMergeAgg(Exprs.toExpression(state), k)
      .toAggregateExpression())
}
