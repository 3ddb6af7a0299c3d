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

/** Capped variant of [[DoubleVectorBuffer]]: always counts every update,
  * but keeps the values only while the count stays at or below `cap` —
  * past it the data is dropped and the buffer reports overflow. Lets a
  * caller fuse "count, then collect iff the count fits the driver cap"
  * into ONE aggregation pass for the common (fits) case; the rare
  * overflow case re-collects with deterministic thinning exactly as
  * before (round 13). */
final class CappedDoubleVectorBuffer(val cap: Long) {
  var inner: DoubleVectorBuffer = new DoubleVectorBuffer()
  var count: Long = 0L
  def overflowed: Boolean = inner == null

  private def drop(): Unit = inner = null

  def add(v: Double): Unit = {
    count += 1
    if (!overflowed) {
      if (count > cap) drop() else inner.add(v)
    }
  }

  def merge(other: CappedDoubleVectorBuffer): Unit = {
    count += other.count
    if (!overflowed) {
      if (other.overflowed || count > cap) drop()
      else inner.merge(other.inner)
    }
  }

  def serialize(): Array[Byte] = {
    val payload = if (overflowed) Array.empty[Byte] else inner.serialize()
    val bb = java.nio.ByteBuffer.allocate(8 + 1 + payload.length)
    bb.putLong(count)
    bb.put(if (overflowed) 1.toByte else 0.toByte)
    bb.put(payload)
    bb.array()
  }
}

object CappedDoubleVectorBuffer {
  def deserialize(bytes: Array[Byte], cap: Long): CappedDoubleVectorBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new CappedDoubleVectorBuffer(cap)
    buf.count = bb.getLong
    if (bb.get() == 1.toByte) buf.inner = null
    else {
      val rest = new Array[Byte](bb.remaining())
      bb.get(rest)
      buf.inner = DoubleVectorBuffer.deserialize(rest)
    }
    buf
  }
}

/** `collect_vector_capped(x, cap)`: one pass yielding
  * struct(n: count of non-null inputs, vs: the values iff n <= cap else
  * null). Null inputs are skipped like [[CollectDoubleVector]]. */
final case class CollectDoubleVectorCapped(
    child: Expression,
    cap: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CappedDoubleVectorBuffer] with UnaryLike[Expression] {

  override def createAggregationBuffer(): CappedDoubleVectorBuffer =
    new CappedDoubleVectorBuffer(cap)

  override def update(buffer: CappedDoubleVectorBuffer, input: InternalRow): CappedDoubleVectorBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: CappedDoubleVectorBuffer, other: CappedDoubleVectorBuffer): CappedDoubleVectorBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: CappedDoubleVectorBuffer): Any =
    InternalRow(buffer.count,
      if (buffer.overflowed) null else new GenericArrayData(buffer.inner.toArray))

  override def serialize(buffer: CappedDoubleVectorBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(storageFormat: Array[Byte]): CappedDoubleVectorBuffer =
    CappedDoubleVectorBuffer.deserialize(storageFormat, cap)

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("vs", ArrayType(DoubleType, containsNull = false), nullable = true)))
  override def nullable: Boolean = false
  override def prettyName: String = "collect_vector_capped"

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectDoubleVectorCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectDoubleVectorCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CollectDoubleVectorCapped =
    copy(child = newChild)
}

object VectorAgg {
  /** Aggregate a double column into one array<double>. */
  def collectVector(c: Column): Column =
    ColumnBridge.column(
      CollectDoubleVector(ColumnBridge.expression(c)).toAggregateExpression())

  /** One-pass count + bounded collect: struct(n, vs) with vs null when
    * n exceeds `cap` (see [[CollectDoubleVectorCapped]]). */
  def collectVectorCapped(c: Column, cap: Long): Column =
    ColumnBridge.column(
      CollectDoubleVectorCapped(ColumnBridge.expression(c), cap).toAggregateExpression())

  /** Convenience: run the aggregate and return the driver-side array. */
  def collectToDriver(df: org.apache.spark.sql.DataFrame, c: Column): Array[Double] =
    df.agg(collectVector(c).as("v")).collect()(0)
      .getSeq[Double](0).toArray
}
