package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** MinHash signature over an array of shingle hashes as a native Catalyst
  * `Expression` (SURVEY.md §2.11 tier (b)): k affine permutations
  * min_i((a_k·h_i + b_k) mod p), p = 2^61−1.
  *
  * The built-in formulation is k parallel `array_min(transform(hashes,
  * h => pmod(h·a_k + b_k, p)))` columns — every `transform` lambda is
  * CodegenFallback, so a 64-permutation signature interprets 64 lambdas
  * per shingle with boxing and allocates 64 intermediate arrays per row.
  * This expression is one primitive pass over the hash array (k running
  * minima in a local long[]), emitted as a static call inside
  * whole-stage codegen.
  *
  * Semantics match the HoF formulation bit-for-bit for non-null hash
  * arrays: `h·a + b` wraps in 64-bit arithmetic exactly like the
  * Catalyst multiply/add, pmod is `r = x % p; if (r < 0) r += p`,
  * `array_min` skips null elements, and an empty (or all-null) hash
  * array yields a null signature element. Coefficients come from the
  * same seeded generator as the previous column-algebra version, so
  * committed golden digests are unchanged. One DELIBERATE divergence,
  * consistent with [[JaccardSim]]: a null ARRAY (null document text)
  * yields a null signature, where the column formulation produced an
  * array of k nulls whose band hashes degenerated to hash(band-index) —
  * every null-text doc became an LSH candidate of every other. */
final case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<bigint> input, got ${other.catalogString}")
  }

  @transient private lazy val (as, bs) = MinHash.coefficients(numHashes, seed)

  override protected def nullSafeEval(input: Any): Any =
    MinHash.signature(input.asInstanceOf[ArrayData], as, bs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHash.signature($c, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHash {
  private val MersennePrime = (1L << 61) - 1

  /** Deterministic per-permutation affine coefficients (a odd, b) — the
    * exact generator the column-algebra formulation used, so signatures
    * (and every downstream band hash / golden digest) are unchanged. */
  def coefficients(numHashes: Int, seed: Long): (Array[Long], Array[Long]) = {
    val as = new Array[Long](numHashes)
    val bs = new Array[Long](numHashes)
    var k = 0
    while (k < numHashes) {
      val rng = new scala.util.Random(seed * 1315423911L + k)
      as(k) = (rng.nextLong() & Long.MaxValue) | 1L
      bs(k) = rng.nextLong() & Long.MaxValue
      k += 1
    }
    (as, bs)
  }

  /** One pass over the hash array, k running minima; called from both
    * interpreted eval and generated code. Null elements are skipped
    * (array_min semantics); a minimum over zero values is null. */
  def signature(hashes: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val k = as.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = hashes.numElements()
    var seen = false
    var i = 0
    while (i < n) {
      if (!hashes.isNullAt(i)) {
        seen = true
        val h = hashes.getLong(i)
        var j = 0
        while (j < k) {
          var r = (h * as(j) + bs(j)) % MersennePrime
          if (r < 0) r += MersennePrime
          if (r < mins(j)) mins(j) = r
          j += 1
        }
      }
      i += 1
    }
    if (!seen) new GenericArrayData(new Array[Any](k))
    else new GenericArrayData(mins)
  }

  def signature(hashes: Column, numHashes: Int, seed: Long = 42L): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(hashes), numHashes, seed))
}
