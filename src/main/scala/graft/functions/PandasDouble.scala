package graft.functions

import graft.kernels.PandasFloat
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** String → double with pandas `precise_xstrtod` semantics
  * ([[graft.kernels.PandasFloat]]) as a native Catalyst expression —
  * the CSV-measure decode stays inside whole-stage codegen (one static
  * call per value, same pattern as [[SimHash64]]), so the parity-exact
  * snapshot read costs the same as a built-in cast at scan time. */
final case class PandasDoubleExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pandas_double"

  override protected def nullSafeEval(input: Any): Any =
    PandasFloat.parse(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.kernels.PandasFloat.parse($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): PandasDoubleExpr =
    copy(child = newChild)
}

object PandasDouble {
  def pandasDouble(c: Column): Column =
    ColumnBridge.column(PandasDoubleExpr(ColumnBridge.expression(c)))
}
