package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of codepoints OUTSIDE [a-zA-Z0-9 ] as a native Catalyst
  * `Expression` (SURVEY.md §2.11 tier (b)).
  *
  * The column formulation — `length(text) − length(regexp_replace(text,
  * "[^a-zA-Z0-9 ]", ""))` — runs the regex engine over every character
  * and allocates the stripped copy of every document just to subtract
  * two lengths. This expression counts codepoint starts whose lead byte
  * is not an allowed ASCII character — one pass, no allocation — inside
  * whole-stage codegen (quality scoring runs it per document).
  *
  * Exactly equal to the formulation: both count codepoints (length() is
  * codepoint-based, and every non-ASCII codepoint matches the negated
  * ASCII class). Pinned by PunctCountSpec. */
final case class PunctCountExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "punct_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs string input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    PunctCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PunctCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): PunctCountExpr =
    copy(child = newChild)
}

object PunctCount {

  /** One pass over the bytes; called from both interpreted eval and
    * generated code. Counts codepoint STARTS (continuation bytes are
    * skipped), so multibyte codepoints count once, like length(). */
  def count(s: UTF8String): Int = {
    val n = s.numBytes
    var c = 0
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      val allowed = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
        (b >= '0' && b <= '9') || b == ' '
      if (!allowed) c += 1
      i += UTF8String.numBytesForFirstByte(b)
    }
    c
  }

  def punctCount(text: Column): Column =
    ColumnBridge.column(PunctCountExpr(ColumnBridge.expression(text)))
}
