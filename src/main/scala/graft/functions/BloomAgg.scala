package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** Distributive Bloom-filter build:
  * `graft_bloom_agg(h1, h2, mBits, k)` → the filter's bit array as
  * one BINARY value (big-endian longs), where each input row sets
  * the `k` Kirsch-Mitzenmacher double-hash positions
  * `(h1 + j·h2) mod mBits`.
  *
  * This is what makes Bloom decontamination benchmark-size-
  * independent end to end: partial filters build map-side inside
  * each task, merge by bitwise OR (set union — associative,
  * commutative, idempotent), and the driver receives ONE
  * mBits/8-byte row no matter how many grams the held-out suite
  * contains. The per-gram `collect()` it replaces was bounded by the
  * benchmark contract; this removes the contract.
  *
  * `mBits` (a positive multiple of 64) and `k` must be foldable —
  * they size the aggregation buffer, so they are filter parameters,
  * not per-row data.
  */
case class BloomAgg(
    h1: Expression,
    h2: Expression,
    mBitsExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private lazy val mBits: Int = mBitsExpr.eval().asInstanceOf[Number].intValue()
  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(h1, h2, mBitsExpr, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (h1.dataType != LongType || h2.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_agg hashes must be BIGINT, got " +
          s"${h1.dataType.sql}, ${h2.dataType.sql}")
    else if (!mBitsExpr.foldable || !kExpr.foldable ||
        mBitsExpr.dataType != IntegerType || kExpr.dataType != IntegerType ||
        mBitsExpr.eval() == null || kExpr.eval() == null)
      TypeCheckResult.TypeCheckFailure(
        "graft_bloom_agg mBits and k must be non-null INT literals")
    else if (mBits <= 0 || mBits % 64 != 0 || k <= 0)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_agg needs mBits a positive multiple of 64 and " +
          s"k > 0, got mBits=$mBits k=$k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits / 64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val a = h1.eval(input)
    val b = h2.eval(input)
    if (a != null && b != null) {
      val v1 = a.asInstanceOf[Long]
      val v2 = b.asInstanceOf[Long]
      // exact (h1 + j·h2) mod m for ARBITRARY longs: reduce each
      // operand first, then step the position incrementally — both
      // addends stay < m ≤ 2^31, so the sum can never wrap, unlike
      // floorMod(v1 + j*v2, m) whose wrapped sum silently disagrees
      // with the documented positions (and any exact-arithmetic
      // oracle) once v1 + j·v2 overflows. Identical positions to the
      // old form whenever no overflow occurred (all current callers
      // pass 32-bit hashes), so existing filters stay bit-compatible.
      val m = mBits.toLong
      val step = java.lang.Math.floorMod(v2, m)
      var p = java.lang.Math.floorMod(v1, m)
      var j = 0
      while (j < k) {
        val pi = p.toInt
        buffer(pi >> 6) |= (1L << (pi & 63))
        p += step
        if (p >= m) p -= m
        j += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = serialize(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(h1 = newChildren(0), h2 = newChildren(1),
      mBitsExpr = newChildren(2), kExpr = newChildren(3))
}

/** Static helpers shared by the engine path and specs. */
object BloomAgg {
  /** Decode the aggregate's BINARY result back to the word array. */
  def wordsOf(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }
}
