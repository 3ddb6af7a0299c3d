package graft.functions

import graft.kernels.ExactSum
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** `exact_sum(x)`: sum a double column EXACTLY (order-independent,
  * correctly rounded — [[graft.kernels.ExactSum]]) and emit the
  * serialized superaccumulator as binary. Callers that need the double
  * round once via `ExactSum.valueOfBytes`; callers that combine partial
  * sums on the driver (cumulative partition prefixes, complement
  * subtractions) merge the accumulators exactly and round at the end.
  * The point is distributed reproducibility: the result is a function of
  * the value multiset alone, independent of partitioning, shuffle order,
  * and grouping key — which is what lets squeeze reproduce the
  * reference's exact score ties (see ExactSum's scaladoc). Nulls are
  * skipped like `sum`. */
final case class ExactSumAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = ExactSum.newAcc()

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) ExactSum.add(buffer, v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    ExactSum.merge(buffer, other)
    buffer
  }

  override def eval(buffer: Array[Long]): Any = ExactSum.serialize(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = ExactSum.serialize(buffer)
  override def deserialize(storageFormat: Array[Byte]): Array[Long] =
    ExactSum.deserialize(storageFormat)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "exact_sum"

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactSumAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExactSumAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ExactSumAggregate =
    copy(child = newChild)
}

object ExactSumAgg {
  /** Exact sum of a double column -> serialized accumulator (binary). */
  def exactSum(c: Column): Column =
    ColumnBridge.column(
      ExactSumAggregate(ColumnBridge.expression(c)).toAggregateExpression())
}
