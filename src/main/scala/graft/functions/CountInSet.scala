package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Number of array elements contained in a literal string set, as a
  * native Catalyst `Expression` (SURVEY.md §2.11 tier (b)).
  *
  * The column formulation — `size(filter(tokens, w => w.isin(set:_*)))`
  * — interprets a CodegenFallback lambda per token, evaluates a
  * linear-scan In per call, and materializes the filtered array just to
  * take its length. This expression probes a prebuilt hash set in one
  * pass inside whole-stage codegen (stopword-ratio scoring runs it per
  * document over every token).
  *
  * Semantics match the formulation for non-null arrays: null elements
  * don't count (isin(null) is null → filter drops). One DELIBERATE
  * divergence, same as [[JaccardSim]]: a null ARRAY yields null here,
  * where `size(null)` under the engine's ANSI-off sessions returned −1.
  * Pinned by CountInSetSpec. */
final case class CountInSetExpr(child: Expression, values: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_in_set"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string> input, got ${other.catalogString}")
  }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](values.size * 2)
    values.foreach(v => s.add(UTF8String.fromString(v)))
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    CountInSet.count(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("countInSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.functions.CountInSet.count($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): CountInSetExpr =
    copy(child = newChild)
}

object CountInSet {

  /** One probe per element; called from both interpreted eval and
    * generated code. */
  def count(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  def countInSet(arr: Column, values: Seq[String]): Column =
    ColumnBridge.column(CountInSetExpr(ColumnBridge.expression(arr), values))
}
