package graft.core

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mutable (sum[d], count) buffer for element-wise vector sums. */
final class VecSumBuf(var sum: Array[Double], var count: Long) {
  def add(a: ArrayData): Unit = {
    val n = a.numElements()
    if (sum == null) sum = new Array[Double](n)
    var i = 0
    while (i < n) { sum(i) += a.getFloat(i); i += 1 }
    count += 1L
  }
  def merge(o: VecSumBuf): Unit = {
    if (o.sum != null) {
      if (sum == null) { sum = o.sum.clone(); count = o.count }
      else {
        var i = 0
        while (i < sum.length) { sum(i) += o.sum(i); i += 1 }
        count += o.count
      }
    }
  }
}

/** Element-wise sum + count of float vectors — the distributed
  * `compute_centroids` kernel (faiss/Clustering.cpp:139-214): centroid
  * = sum/count per cluster after a groupBy on the assignment. Partial
  * aggregation makes it one double[d] per (group, partition) — the
  * map-side combine faiss gets from OpenMP-striped accumulation.
  *
  * Output: struct(sum: array<double>, cnt: long).
  */
case class VecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumBuf] with UnaryLike[Expression] {

  override def prettyName: String = "vec_sum"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("sum", ArrayType(DoubleType, containsNull = false), nullable = true),
    StructField("cnt", LongType, nullable = false)))

  override def createAggregationBuffer(): VecSumBuf = new VecSumBuf(null, 0L)

  override def update(buf: VecSumBuf, input: InternalRow): VecSumBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(buf: VecSumBuf, other: VecSumBuf): VecSumBuf = {
    buf.merge(other); buf
  }

  override def eval(buf: VecSumBuf): Any =
    InternalRow(
      if (buf.sum == null) null else new GenericArrayData(buf.sum),
      buf.count)

  override def serialize(buf: VecSumBuf): Array[Byte] = {
    val d = if (buf.sum == null) 0 else buf.sum.length
    val bb = ByteBuffer.allocate(12 + 8 * d)
    bb.putInt(d).putLong(buf.count)
    var i = 0
    while (i < d) { bb.putDouble(buf.sum(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt; val cnt = bb.getLong
    if (d == 0) new VecSumBuf(null, cnt)
    else {
      val s = new Array[Double](d)
      var i = 0
      while (i < d) { s(i) = bb.getDouble; i += 1 }
      new VecSumBuf(s, cnt)
    }
  }

  override def withNewMutableAggBufferOffset(offset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VecSumAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): VecSumAgg =
    copy(child = c)
}
