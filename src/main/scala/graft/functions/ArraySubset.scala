package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** `a ⊆ b` over two arrays as a native Catalyst `Expression`
  * (SURVEY.md §2.11 tier (b)): true iff every element of `a` occurs in
  * `b`.
  *
  * The column formulation — `forall(a, v => array_contains(b, v))` — is
  * a CodegenFallback lambda interpreted once per JOIN-PAIR when used as
  * a broadcast-join residual (AutoRoot's candidate-selection joins run
  * it |exploded| × |candidates| times per layer). This expression is a
  * primitive nested scan (the arrays are 1–4 dimension values) inside
  * whole-stage codegen.
  *
  * Semantics match the formulation's three-valued logic exactly: any
  * element of `a` definitely missing from `b` → false (false dominates
  * null, as in forall); otherwise a null element of `a`, or a miss
  * against a `b` that contains null, → null (array_contains semantics);
  * otherwise true. An empty `a` is vacuously true. Pinned by
  * ArraySubsetSpec. */
final case class ArraySubsetOf(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "array_subset_of"

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
    ArraySubset.subsetOf(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("subsetRes")
      s"""
         |java.lang.Boolean $tmp = graft.functions.ArraySubset.subsetOf(
         |  $a, $b, $isString);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.booleanValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArraySubsetOf =
    copy(left = newLeft, right = newRight)
}

object ArraySubset {

  private def elemEquals(x: ArrayData, i: Int, y: ArrayData, j: Int,
      isString: Boolean): Boolean =
    if (isString) x.getUTF8String(i).equals(y.getUTF8String(j))
    else x.getLong(i) == y.getLong(j)

  /** Nested scan; called from both interpreted eval and generated code.
    * Returns FALSE on any definite miss (false dominates null, like
    * forall), NULL if the verdict depends on a null element, else TRUE. */
  def subsetOf(a: ArrayData, b: ArrayData, isString: Boolean): java.lang.Boolean = {
    val na = a.numElements()
    val nb = b.numElements()
    var sawNull = false
    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) sawNull = true // array_contains(b, null) -> null
      else {
        var found = false
        var bHasNull = false
        var j = 0
        while (!found && j < nb) {
          if (b.isNullAt(j)) bHasNull = true
          else if (elemEquals(a, i, b, j, isString)) found = true
          j += 1
        }
        if (!found) {
          if (bHasNull) sawNull = true // miss against null-bearing array -> null
          else return java.lang.Boolean.FALSE
        }
      }
      i += 1
    }
    if (sawNull) null else java.lang.Boolean.TRUE
  }

  def subsetOf(a: Column, b: Column): Column =
    ColumnBridge.column(ArraySubsetOf(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
