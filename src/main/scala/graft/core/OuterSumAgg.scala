package graft.core

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** (n, Σx, Σx·xᵀ) in one distributed pass — the covariance-train
  * aggregate behind PCAMatrix (faiss/VectorTransform.h:133 trains from
  * the same moments). Buffer is d + d² doubles; partial aggregation
  * ships one buffer per partition, so the full data never moves. */
final class OuterSumBuf(var n: Long, var sum: Array[Double], var outer: Array[Double]) {
  def add(a: ArrayData): Unit = {
    val d = a.numElements()
    if (sum == null) { sum = new Array[Double](d); outer = new Array[Double](d * d) }
    var i = 0
    while (i < d) {
      val xi = a.getFloat(i).toDouble
      sum(i) += xi
      var j = 0
      while (j < d) { outer(i * d + j) += xi * a.getFloat(j).toDouble; j += 1 }
      i += 1
    }
    n += 1
  }
  def merge(o: OuterSumBuf): Unit = if (o.sum != null) {
    if (sum == null) { n = o.n; sum = o.sum.clone(); outer = o.outer.clone() }
    else {
      n += o.n
      var i = 0
      while (i < sum.length) { sum(i) += o.sum(i); i += 1 }
      i = 0
      while (i < outer.length) { outer(i) += o.outer(i); i += 1 }
    }
  }
}

case class OuterSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[OuterSumBuf] with UnaryLike[Expression] {

  override def prettyName: String = "vec_outer_sum"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sum", ArrayType(DoubleType, containsNull = false)),
    StructField("outer", ArrayType(DoubleType, containsNull = false))))

  override def createAggregationBuffer(): OuterSumBuf = new OuterSumBuf(0L, null, null)
  override def update(b: OuterSumBuf, in: InternalRow): OuterSumBuf = {
    val v = child.eval(in)
    if (v != null) b.add(v.asInstanceOf[ArrayData]); b
  }
  override def merge(b: OuterSumBuf, o: OuterSumBuf): OuterSumBuf = { b.merge(o); b }
  override def eval(b: OuterSumBuf): Any =
    InternalRow(b.n,
      if (b.sum == null) null else new GenericArrayData(b.sum),
      if (b.outer == null) null else new GenericArrayData(b.outer))

  override def serialize(b: OuterSumBuf): Array[Byte] = {
    val d = if (b.sum == null) 0 else b.sum.length
    val bb = ByteBuffer.allocate(12 + 8 * d + 8 * d * d)
    bb.putInt(d).putLong(b.n)
    var i = 0
    while (i < d) { bb.putDouble(b.sum(i)); i += 1 }
    i = 0
    while (i < d * d) { bb.putDouble(b.outer(i)); i += 1 }
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): OuterSumBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt; val n = bb.getLong
    if (d == 0) new OuterSumBuf(n, null, null)
    else {
      val s = new Array[Double](d); val o = new Array[Double](d * d)
      var i = 0
      while (i < d) { s(i) = bb.getDouble; i += 1 }
      i = 0
      while (i < d * d) { o(i) = bb.getDouble; i += 1 }
      new OuterSumBuf(n, s, o)
    }
  }
  override def withNewMutableAggBufferOffset(o: Int): OuterSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): OuterSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): OuterSumAgg =
    copy(child = c)
}
