package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash fold_cp(acc·31 + codepoint mod 2⁶¹−1) over a
  * string's codepoints as a native Catalyst `Expression` (SURVEY.md
  * §2.11 tier (b)).
  *
  * The column formulation — `aggregate(split(s, ""), 0L, (acc, c) =>
  * pmod(acc·31 + ascii(c), p))` — materializes a one-element-per-
  * codepoint string array and interprets a CodegenFallback lambda per
  * character with boxing. This expression decodes codepoints straight
  * off the UTF-8 bytes in one pass inside whole-stage codegen.
  *
  * Semantics match bit-for-bit: split("") segments by full codepoint
  * (surrogate pairs stay together) and ascii() returns the codepoint,
  * both verified empirically; `acc·31 + cp` wraps in 64-bit arithmetic
  * exactly like the Catalyst multiply/add before its pmod; the empty
  * string hashes to 0 (split("") yields [""] and ascii("") = 0, a
  * no-op fold step). Pinned by RollingHashSpec. */
final case class RollingHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs string input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
}

object RollingHash {
  private val MersennePrime = (1L << 61) - 1

  /** One pass over the bytes, decoding each UTF-8 codepoint; called from
    * both interpreted eval and generated code. */
  def compute(s: UTF8String): Long = {
    val n = s.numBytes
    var acc = 0L
    var i = 0
    while (i < n) {
      val b0 = s.getByte(i)
      val len = UTF8String.numBytesForFirstByte(b0)
      val cp: Long =
        if (len == 1) b0 & 0x7FL
        else if (len == 2)
          ((b0 & 0x1FL) << 6) | (s.getByte(i + 1) & 0x3FL)
        else if (len == 3)
          ((b0 & 0x0FL) << 12) | ((s.getByte(i + 1) & 0x3FL) << 6) |
            (s.getByte(i + 2) & 0x3FL)
        else
          ((b0 & 0x07L) << 18) | ((s.getByte(i + 1) & 0x3FL) << 12) |
            ((s.getByte(i + 2) & 0x3FL) << 6) | (s.getByte(i + 3) & 0x3FL)
      var r = (acc * 31L + cp) % MersennePrime
      if (r < 0) r += MersennePrime
      acc = r
      i += len
    }
    acc
  }

  def rollingHash(text: Column): Column =
    ColumnBridge.column(RollingHashExpr(ColumnBridge.expression(text)))
}
