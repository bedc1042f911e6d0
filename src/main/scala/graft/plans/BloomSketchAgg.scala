package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/** Bit-level core of the Bloom membership sketch (Bloom 1970; probe
  * sequence per Kirsch & Mitzenmacher 2006, "Less hashing, same
  * performance": two 64-bit hashes generate all j probes as h1 + i·h2).
  *
  * The serialized state is self-describing — an 8-byte little-endian
  * header (numBits int, numHashes int) followed by the bit words in
  * little-endian byte order, so that global bit b lives at byte
  * `header + (b >>> 3)`, mask `1 << (b & 7)`. [[BloomContains]] probes
  * the byte array DIRECTLY (no deserialization, no allocation per row)
  * — the membership filter stays O(j) byte reads inside codegen.
  */
object BloomBits {
  final val HeaderBytes = 8

  /** Murmur3 64-bit finalizer (public domain constant mix). */
  def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33; x
  }

  def numWords(numBits: Int): Int = (numBits + 63) >>> 6

  def add(words: Array[Long], numBits: Int, numHashes: Int, v: Long): Unit = {
    val h1 = fmix64(v)
    val h2 = fmix64(v ^ 0x9E3779B97F4A7C15L) | 1L // odd → full-period probe
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Math.floorMod(h1 + i.toLong * h2, numBits.toLong).toInt
      words(bit >>> 6) |= 1L << (bit & 63)
      i += 1
    }
  }

  def serialize(words: Array[Long], numBits: Int, numHashes: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(HeaderBytes + words.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(numBits).putInt(numHashes)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }

  /** (numBits, numHashes, words) from a serialized state. */
  def deserialize(state: Array[Byte]): (Int, Int, Array[Long]) = {
    val bb = java.nio.ByteBuffer.wrap(state)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val numBits = bb.getInt(); val numHashes = bb.getInt()
    val words = new Array[Long](numWords(numBits))
    var i = 0
    while (i < words.length) { words(i) = bb.getLong(); i += 1 }
    (numBits, numHashes, words)
  }

  /** Probe a SERIALIZED state in place — called from both interpreted
    * eval and generated code. No false negatives by construction. */
  def contains(state: Array[Byte], v: Long): Boolean = {
    val numBits = (state(0) & 0xff) | (state(1) & 0xff) << 8 |
      (state(2) & 0xff) << 16 | (state(3) & 0xff) << 24
    val numHashes = (state(4) & 0xff) | (state(5) & 0xff) << 8 |
      (state(6) & 0xff) << 16 | (state(7) & 0xff) << 24
    val h1 = fmix64(v)
    val h2 = fmix64(v ^ 0x9E3779B97F4A7C15L) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Math.floorMod(h1 + i.toLong * h2, numBits.toLong).toInt
      if ((state(HeaderBytes + (bit >>> 3)) & (1 << (bit & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Cardinality estimate from the fill ratio: −(m/j)·ln(1 − X/m), the
    * standard Bloom occupancy inversion (Swamidass & Baldi 2007). */
  def estimate(state: Array[Byte]): Double = {
    val (numBits, numHashes, words) = deserialize(state)
    var set = 0L
    var i = 0
    while (i < words.length) { set += java.lang.Long.bitCount(words(i)); i += 1 }
    if (set >= numBits) Double.PositiveInfinity
    else -(numBits.toDouble / numHashes) *
      math.log1p(-(set.toDouble / numBits))
  }
}

/** Bloom membership sketch as a native Catalyst aggregate: absorbs a
  * 64-bit hash column into an m-bit filter; eval returns the serialized
  * state (binary, m/8 + 8 bytes).
  *
  * The 100 TB shape this enables: build the filter over the SMALL side
  * of a membership question (held-out split, revoked-id list, previous
  * snapshot) in one combine-enabled aggregate, broadcast the few hundred
  * KB of state, and pre-filter the LARGE side map-side with
  * [[BloomContains]] BEFORE its shuffle — the exact join that follows
  * only sees survivors (matches + the fp rate), so shuffle volume scales
  * with the answer, not the corpus. False positives are removed by the
  * exact join; false negatives cannot occur, so the composed result is
  * EXACT and oracle-gatable. State is mergeable (bitwise OR) across
  * partitions/shards/days via [[BloomMergeAgg]], same incremental story
  * as the KMV sketch ([[KmvStateAgg]]).
  */
case class BloomStateAgg(child: Expression, numBits: Int, numHashes: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(numBits >= 64, "numBits must be >= 64")
  require(numHashes >= 1 && numHashes <= 16, "numHashes must be in [1, 16]")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](BloomBits.numWords(numBits))

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomBits.add(buffer, numBits, numHashes, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    BloomBits.serialize(buffer, numBits, numHashes)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    BloomBits.serialize(buffer, numBits, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomBits.deserialize(bytes)._3

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_state"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint (a 64-bit hash), got ${other.simpleString}")
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomStateAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomStateAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BloomStateAgg =
    copy(child = c)
}

/** Union of STORED Bloom states (bitwise OR): input is the binary state
  * [[BloomStateAgg]] emits; all inputs must share (numBits, numHashes).
  * OR-union is exact: merge(bloom(A), bloom(B)) ≡ bloom(A ∪ B)
  * bit-for-bit, so shard-built filters compose without re-reading data. */
case class BloomMergeAgg(child: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] {

  // empty sentinel until the first state arrives (shape comes from input)
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  private def orInto(acc: Array[Byte], in: Array[Byte]): Array[Byte] =
    if (in.length == 0) acc
    else if (acc.length == 0) java.util.Arrays.copyOf(in, in.length)
    else {
      require(acc.length == in.length &&
        java.util.Arrays.equals(acc, 0, BloomBits.HeaderBytes, in, 0, BloomBits.HeaderBytes),
        "bloom_merge: mismatched sketch shapes (numBits/numHashes differ)")
      var i = BloomBits.HeaderBytes
      while (i < acc.length) { acc(i) = (acc(i) | in(i)).toByte; i += 1 }
      acc
    }

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] =
    child.eval(input) match {
      case null => buffer
      case bytes: Array[Byte] => orInto(buffer, bytes)
    }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    orInto(buffer, other)

  override def eval(buffer: Array[Byte]): Any = buffer
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_merge"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary sketch state, got ${other.simpleString}")
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BloomMergeAgg =
    copy(child = c)
}

/** `bloom_contains(state, hash)` — membership probe against a serialized
  * Bloom state. Codegen'd: the generated code calls the same static
  * byte-probe as interpreted eval ([[BloomBits.contains]]), no
  * per-row deserialization, so a broadcast state column keeps the
  * pre-filter inside whole-stage codegen. */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression with BinaryLike[Expression] {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains(state, hash) requires (binary, bigint), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(state: Any, v: Any): Any =
    BloomBits.contains(state.asInstanceOf[Array[Byte]], v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, v) => s"graft.plans.BloomBits.contains($s, $v)")

  override def prettyName: String = "bloom_contains"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomContains =
    copy(left = l, right = r)
}

object BloomSketchAgg {
  import org.apache.spark.sql.Column

  /** Build a filter over a 64-bit hash column: `bloomState($"h", 1 << 22, 7)`.
    * Size rule of thumb: m ≈ 10·n bits, j = 7 → ~0.8% fp rate. */
  def bloomState(c: Column, numBits: Int, numHashes: Int): Column =
    Exprs.toColumn(
      BloomStateAgg(Exprs.toExpression(c), numBits, numHashes).toAggregateExpression())

  /** Union stored states (bitwise OR; shapes must match). */
  def bloomMerge(c: Column): Column =
    Exprs.toColumn(BloomMergeAgg(Exprs.toExpression(c)).toAggregateExpression())

  /** Membership probe — true possibly, false definitely-not. */
  def bloomContains(state: Column, hash: Column): Column =
    Exprs.toColumn(
      BloomContains(Exprs.toExpression(state), Exprs.toExpression(hash)))
}
