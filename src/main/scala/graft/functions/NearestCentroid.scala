package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Nearest-centroid cell assignment for the IVF index as a native
  * Catalyst expression. The previous formulation inlined nlist literal
  * centroid arrays into one `array_max(array(struct(cosine(...))))` tree
  * — at nlist=8 that is fine, but nlist x dim literal nodes grow the
  * generated method body toward Janino's 64KB limit and an interpreted
  * fallback (VERDICT r4 #7). Here the centroid matrix rides along as a
  * plan REFERENCE object (`ctx.addReferenceObj`): the generated code is
  * one static call regardless of nlist, so the assignment scan stays
  * inside whole-stage codegen at any index size (spec-pinned at nlist=64
  * by IvfCodegenSpec).
  *
  * Numeric semantics replicate the column formulation exactly so q61
  * results are unchanged: per-element double accumulation in array order
  * (`aggregate(zip_with(...))` is an ordered left fold), cos = dot /
  * (sqrt(na)*sqrt(nb)) with a 0-denominator guard, and ties/NaN resolved
  * like `array_max` over (cos, cell) structs — last maximal cell wins,
  * NaN sorts above every double. */
final case class NearestCentroidExpr(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  private def floatInput: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    NearestCentroid.assign(input.asInstanceOf[ArrayData], centroids, floatInput)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val f = floatInput
    defineCodeGen(ctx, ev, c => s"graft.functions.NearestCentroid.assign($c, $ref, $f)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidExpr =
    copy(child = newChild)
}

object NearestCentroid {

  /** Argmax-cosine cell id; called from interpreted eval and codegen. */
  def assign(vec: ArrayData, centroids: Array[Array[Double]], floatInput: Boolean): Int = {
    val n = vec.numElements()
    val a = new Array[Double](n)
    var na = 0.0
    var i = 0
    while (i < n) {
      a(i) = if (floatInput) vec.getFloat(i).toDouble else vec.getDouble(i)
      na += a(i) * a(i)
      i += 1
    }
    val sna = math.sqrt(na)
    var bestIdx = 0
    var best = Double.NaN
    var j = 0
    while (j < centroids.length) {
      val c = centroids(j)
      val m = math.min(n, c.length)
      var d = 0.0
      var nb = 0.0
      var k = 0
      while (k < m) { d += a(k) * c(k); nb += c(k) * c(k); k += 1 }
      val den = sna * math.sqrt(nb)
      val cos = if (den == 0.0) 0.0 else d / den
      // array_max semantics: later equal-or-greater cells win, NaN > any
      if (j == 0 || java.lang.Double.compare(cos, best) >= 0) {
        best = cos
        bestIdx = j
      }
      j += 1
    }
    bestIdx
  }

  def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroidExpr(ColumnBridge.expression(vec), centroids))
}
