package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Σ aᵢ·bᵢ over two numeric arrays as a native Catalyst `Expression`
  * (SURVEY.md §2.11 tier (b)).
  *
  * The built-in formulation `aggregate(zip_with(a, b, (x, y) => x*y),
  * 0.0, _+_)` is a higher-order-function chain: HoF lambdas are
  * CodegenFallback — every dot product allocates a zipped array and
  * interprets two lambdas per element with boxing. At similarity-search
  * volume (brute top-k = |queries|·|corpus| dots; LSH/IVF re-rank =
  * one dot per candidate) that interpretation dominates the query. This
  * expression is one tight primitive loop emitted as a static call
  * inside whole-stage codegen.
  *
  * Semantics match the HoF formulation exactly: elements are widened to
  * double (float→double widening is value-exact) and summed left to
  * right; a null element or a length mismatch yields null (zip_with
  * pads with nulls, and `acc + null` poisons the aggregate the same
  * way). */
final case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def elemFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float|double> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemFloat(left), elemFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotRes")
      s"""
         |java.lang.Double $tmp = graft.functions.VectorOps.dotOrNull(
         |  $a, $b, ${elemFloat(left)}, ${elemFloat(right)});
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorOps {

  /** Primitive-loop dot product; called from both interpreted eval and
    * generated code. Returns null (boxed) on length mismatch or null
    * element, mirroring the zip_with/aggregate null semantics. */
  def dotOrNull(a: ArrayData, b: ArrayData, aFloat: Boolean,
      bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
