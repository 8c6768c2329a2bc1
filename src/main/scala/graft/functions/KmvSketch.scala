package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct sketch as a native Catalyst
  * aggregate: each partition keeps the k smallest DISTINCT hash values
  * in a bounded tree (partial), merge unions and re-truncates, and the
  * result is the ascending k-min array — `(k-1) * H / max` estimates
  * distinct count over a hash domain of size H (Bar-Yossef et al. 2002).
  *
  * The point at scale is the shuffle: a `distinct().orderBy.limit(k)`
  * formulation moves EVERY distinct hash of every partition through the
  * exchange; this aggregate moves at most k longs per partition —
  * partial aggregation exactly like the built-in sketches
  * (ApproximatePercentile/HyperLogLog++ are the same
  * TypedImperativeAggregate shape). Duplicates must be dropped BEFORE
  * the bound is applied (k duplicate minima would evict a value that
  * belongs in the global k-min), which is why a plain bounded top-k
  * operator cannot express this.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0, "kmv sketch size must be positive")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def trim(buf: java.util.TreeSet[java.lang.Long]): Unit =
    while (buf.size() > k) buf.pollLast()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // skip values already worse than the retained worst: no allocation
      if (buf.size() < k || h < buf.last()) {
        buf.add(h)
        trim(buf)
      }
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    buf.addAll(other)
    trim(buf)
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

object KmvSketch {

  /** Aggregate column: ascending array of the k smallest distinct values
    * of `col` (LongType input). */
  def kmvSketch(column: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketchAgg(ColumnBridge.expression(column), k)
        .toAggregateExpression())
}
