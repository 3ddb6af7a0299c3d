package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Distinct xxhash64 values of the n-token shingles of a token array, as
  * a native Catalyst `Expression` (SURVEY.md §2.11 tier (b)).
  *
  * The column-algebra formulation — `array_distinct(transform(
  * transform(sequence(1, len−n+1), i => concat_ws(" ", slice(toks, i,
  * n))), s => xxhash64(s)))` — interprets two CodegenFallback lambdas
  * per shingle and materializes the index array, the shingle-string
  * array, and the hash array per row. This expression is one pass over
  * the tokens: each window's bytes are joined into a reusable buffer and
  * hashed once, with first-occurrence-order dedup, inside whole-stage
  * codegen.
  *
  * Semantics match the formulation bit-for-bit: shingle text is the
  * window's tokens joined by a single space with nulls skipped
  * (concat_ws), a token array shorter than n yields ONE shingle of all
  * its tokens (even zero → the empty string), the hash is Spark's
  * xxhash64 (XXH64, seed 42) over the UTF-8 bytes, and dedup preserves
  * first occurrence (array_distinct). Pinned by ShingleHashSpec. */
final case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHash.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHash {
  private val Seed = 42L // Spark's xxhash64 default seed

  /** One pass over the token array; called from both interpreted eval
    * and generated code. */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    val windows = if (m < n) 1 else m - n + 1
    var buf = new Array[Byte](64)
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new java.util.ArrayList[java.lang.Long](windows)
    var i = 0
    while (i < windows) {
      val width = if (m < n) m else n
      // concat_ws(" ", window): join non-null tokens with one space.
      // Empty strings ARE joinable parts (["", "a"] -> " a"), so "need a
      // separator" is tracked by part COUNT, not by bytes written.
      var total = 0
      var parts = 0
      var k = 0
      while (k < width) {
        if (!toks.isNullAt(i + k)) {
          total += (if (parts > 0) 1 else 0) + toks.getUTF8String(i + k).numBytes
          parts += 1
        }
        k += 1
      }
      if (total > buf.length) {
        // next power of two, but highestOneBit(total)*2 overflows negative
        // once a window's joined bytes reach 1 GiB — fall back to the exact
        // size there instead of throwing NegativeArraySizeException
        val doubled = Integer.highestOneBit(total) * 2
        buf = new Array[Byte](if (doubled > total) doubled else total)
      }
      var off = 0
      parts = 0
      k = 0
      while (k < width) {
        if (!toks.isNullAt(i + k)) {
          val t = toks.getUTF8String(i + k)
          if (parts > 0) { buf(off) = ' '; off += 1 }
          t.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + off)
          off += t.numBytes
          parts += 1
        }
        k += 1
      }
      val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, off, Seed)
      if (seen.add(h)) out.add(h)
      i += 1
    }
    val arr = new Array[Long](out.size())
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    new GenericArrayData(arr)
  }

  def shingleHashes(tokens: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(tokens), n))
}
