package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character n-grams of a string as a native Catalyst `Expression`
  * (SURVEY.md §2.11 tier (b)).
  *
  * The column-algebra formulation — `transform(sequence(1, greatest(
  * len−n+1, 1)), i => substr(s, i, n))` — interprets a CodegenFallback
  * lambda per position, and every `substr` call re-scans the string from
  * the start to find its codepoint offset: O(len²) per document. This
  * expression computes the codepoint byte-offset table once and emits
  * each n-gram as a byte slice — O(len) — inside whole-stage codegen.
  *
  * Semantics match the formulation exactly: 1-based codepoint windows,
  * and a string shorter than n yields ONE n-gram of the whole string
  * (even the empty string), mirroring the greatest(...,1) guard and
  * substring SQL clamping. Pinned by CharNgramsSpec. */
final case class CharNgramsExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs string input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    CharNgrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharNgrams.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgramsExpr =
    copy(child = newChild)
}

object CharNgrams {

  /** One offset-table pass, then one byte-slice per window; called from
    * both interpreted eval and generated code. */
  def compute(s: UTF8String, n: Int): GenericArrayData = {
    val bytes = s.getBytes
    val numChars = s.numChars()
    // offs(c) = byte offset where codepoint c starts; offs(numChars) = end
    val offs = new Array[Int](numChars + 1)
    var b = 0
    var c = 0
    while (c < numChars) {
      offs(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offs(numChars) = bytes.length
    val windows = if (numChars < n) 1 else numChars - n + 1
    val out = new Array[Any](windows)
    var i = 0
    while (i < windows) {
      val end = if (i + n < numChars) i + n else numChars
      out(i) = UTF8String.fromBytes(bytes, offs(i), offs(end) - offs(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  def charNgrams(text: Column, n: Int): Column =
    ColumnBridge.column(CharNgramsExpr(ColumnBridge.expression(text), n))
}
