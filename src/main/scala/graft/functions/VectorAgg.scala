package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Growable primitive double buffer for [[CollectDoubleVector]] — no
  * boxing, amortized growth, compact binary serialization for partial
  * aggregation shuffles. */
final class DoubleVectorBuffer(initialCapacity: Int = 64) {
  private var data = new Array[Double](initialCapacity)
  private var count = 0

  def add(v: Double): Unit = {
    if (count == data.length) {
      val grown = new Array[Double](data.length * 2)
      System.arraycopy(data, 0, grown, 0, count)
      data = grown
    }
    data(count) = v
    count += 1
  }

  def merge(other: DoubleVectorBuffer): Unit = {
    var i = 0
    while (i < other.count) { add(other.data(i)); i += 1 }
  }

  def size: Int = count
  def toArray: Array[Double] = java.util.Arrays.copyOf(data, count)

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * count)
    bb.putInt(count)
    var i = 0
    while (i < count) { bb.putDouble(data(i)); i += 1 }
    bb.array()
  }
}

object DoubleVectorBuffer {
  def deserialize(bytes: Array[Byte]): DoubleVectorBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new DoubleVectorBuffer(math.max(n, 1))
    var i = 0
    while (i < n) { buf.add(bb.getDouble); i += 1 }
    buf
  }
}

/** `collect_vector(x)`: gather a double column into one array<double> via
  * a `TypedImperativeAggregate` (SURVEY.md §4.3) — the scale-path
  * replacement for `collect()`/`collect_list` when feeding the driver-side
  * numeric kernels (KDE clustering, knee detection): partial buffers are
  * primitive arrays merged up the aggregation tree, not boxed Rows
  * shipped to the driver. Null inputs are skipped (matching
  * `collect_list`); NaNs are kept (the kernels decide). */
final case class CollectDoubleVector(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DoubleVectorBuffer] with UnaryLike[Expression] {

  override def createAggregationBuffer(): DoubleVectorBuffer = new DoubleVectorBuffer()

  override def update(buffer: DoubleVectorBuffer, input: InternalRow): DoubleVectorBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: DoubleVectorBuffer, other: DoubleVectorBuffer): DoubleVectorBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: DoubleVectorBuffer): Any =
    new GenericArrayData(buffer.toArray)

  override def serialize(buffer: DoubleVectorBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(storageFormat: Array[Byte]): DoubleVectorBuffer =
    DoubleVectorBuffer.deserialize(storageFormat)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "collect_vector"

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectDoubleVector =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectDoubleVector =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CollectDoubleVector =
    copy(child = newChild)
}

object VectorAgg {
  /** Aggregate a double column into one array<double>. */
  def collectVector(c: Column): Column =
    ColumnBridge.column(
      CollectDoubleVector(ColumnBridge.expression(c)).toAggregateExpression())

  /** Convenience: run the aggregate and return the driver-side array. */
  def collectToDriver(df: org.apache.spark.sql.DataFrame, c: Column): Array[Double] =
    df.agg(collectVector(c).as("v")).collect()(0)
      .getSeq[Double](0).toArray
}
