package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Jaccard similarity |A∩B| / |A∪B| over two arrays as a native Catalyst
  * `Expression` (SURVEY.md §2.11 tier (b)).
  *
  * The built-in formulation `size(array_intersect(a, b)) /
  * size(array_union(a, b))` materializes two distinct-element arrays per
  * evaluation just to take their lengths. In the all-pairs verification
  * joins (blocked Jaccard, MinHash candidate verification) that runs once
  * per PAIR, so the allocations dominate. This expression computes both
  * cardinalities in one hash-set pass and returns the ratio directly,
  * inside whole-stage codegen.
  *
  * Semantics match the formulation exactly for non-null arrays:
  * duplicates collapse (both built-ins dedup), a null ELEMENT counts as
  * one set member (present in the intersection iff both sides contain
  * null), and |A∪B| = 0 (both arrays empty) yields 0.0 — mirroring the
  * `when(union === 0, 0.0)` guard. One DELIBERATE divergence: a null
  * ARRAY yields null here, where the column formulation under the
  * engine's ANSI-off sessions returned size(null)/size(null) = −1/−1 =
  * 1.0 — every null-text pair scored as an exact duplicate. Pinned by
  * JaccardSimSpec. */
final case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  private def isString: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == StringType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two array<string> or two array<bigint> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Jaccard.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.Jaccard.compute($a, $b, $isString)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}

object Jaccard {

  /** One pass per side: build the distinct set of `a`, probe with the
    * distinct elements of `b`. Null elements are one set member each,
    * like array_intersect/array_union. Called from both interpreted eval
    * and generated code. */
  def compute(a: ArrayData, b: ArrayData, isString: Boolean): Double = {
    val setA = new java.util.HashSet[Any]()
    var nullA = false
    var i = 0
    val na = a.numElements()
    while (i < na) {
      if (a.isNullAt(i)) nullA = true
      else setA.add(if (isString) a.getUTF8String(i) else a.getLong(i))
      i += 1
    }
    val setB = new java.util.HashSet[Any]()
    var nullB = false
    var inter = 0
    i = 0
    val nb = b.numElements()
    while (i < nb) {
      if (b.isNullAt(i)) nullB = true
      else {
        val e: Any = if (isString) b.getUTF8String(i) else b.getLong(i)
        if (setB.add(e) && setA.contains(e)) inter += 1
      }
      i += 1
    }
    if (nullA && nullB) inter += 1
    val union = setA.size + (if (nullA) 1 else 0) +
      setB.size + (if (nullB) 1 else 0) - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  def sim(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
