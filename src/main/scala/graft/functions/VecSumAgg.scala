package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Elementwise vector-sum aggregate: `graft_vec_sum(array<double>)`
  * → one `array<double>` of per-dimension sums per group.
  *
  * This replaces the per-dimension `sum(element_at(emb, i))` fan-out
  * (one Catalyst aggregate expression per dimension) that a naive
  * centroid computation declares. That shape generates O(dim)
  * aggregate buffer slots and a generated class whose size grows
  * linearly with dimension — at dim 64 it costs seconds of Janino
  * compilation per cold plan, and past a few hundred dimensions it
  * exceeds JVM method limits and falls back to interpreted mode.
  * Real embedding pipelines run dims 512–4096, so the per-dim-column
  * form is a dead end at exactly the scale that matters.
  *
  * This aggregate is ONE buffer holding a primitive double array,
  * updated with a fused loop and merged by elementwise addition —
  * cost is O(dim) per row with no codegen surface at all, and it is
  * map-side combinable (partial sums merge by addition), so the
  * shuffle carries groups × dim doubles regardless of corpus size.
  * Addition order matches any distributed sum (partition-partial,
  * then merge) — same IEEE caveats as Spark's own `sum`.
  *
  * The buffer is sized lazily from the first row (dim-agnostic);
  * null elements contribute 0 (the per-dim `sum` ignored nulls the
  * same way). Empty groups cannot occur under hash aggregation, but
  * `eval` of an untouched buffer returns an empty array rather than
  * throwing.
  */
case class VecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_vec_sum requires array<double>, got ${t.sql}")
  }

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val buf = if (buffer.length >= n) buffer
      else java.util.Arrays.copyOf(buffer, n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) buf(i) += arr.getDouble(i)
        i += 1
      }
      buf
    }
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    if (b2.length > b1.length) merge(b2, b1)
    else {
      var i = 0
      while (i < b2.length) { b1(i) += b2(i); i += 1 }
      b1
    }
  }

  override def eval(buffer: Array[Double]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    var i = 0
    while (i < buffer.length) { bb.putDouble(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_vec_sum"

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecSumAgg =
    copy(child = newChild)
}
