package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** "Every (k, v) entry of `path` matches `row`" as a native Catalyst
  * `Expression` (SURVEY.md §2.11 tier (b)): true iff for each entry,
  * `row[k] = v`.
  *
  * The column formulation — `forall(map_entries(path), p =>
  * element_at(row, p.key) === p.value)` — is a CodegenFallback lambda
  * interpreted once per JOIN PAIR when used as the frontier fan-out
  * residual (BatchRevRecAdtributor joins every base row against every
  * frontier node per level). This expression is a primitive nested scan
  * (paths hold 0–|attributes| entries) inside whole-stage codegen.
  *
  * Semantics match the formulation's three-valued logic exactly: a
  * definite value mismatch → false (false dominates null, as in forall);
  * otherwise a missing key or null value on either side → null
  * (element_at returns null on absent keys under the engine's ANSI-off
  * sessions, and `===` propagates null); otherwise true. An empty path
  * is vacuously true. Pinned by MapMatchesSpec. */
final case class MapMatchesAll(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "map_matches_all"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (MapType(StringType, StringType, _), MapType(StringType, StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two map<string,string> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MapMatches.matchesAll(a.asInstanceOf[MapData], b.asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("mapMatchRes")
      s"""
         |java.lang.Boolean $tmp = graft.functions.MapMatches.matchesAll($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.booleanValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MapMatchesAll =
    copy(left = newLeft, right = newRight)
}

object MapMatches {

  /** Nested scan; called from both interpreted eval and generated code.
    * Returns FALSE on any definite mismatch, NULL if some entry's verdict
    * is unknowable (absent key / null value), else TRUE. */
  def matchesAll(path: MapData, row: MapData): java.lang.Boolean = {
    val pk = path.keyArray()
    val pv = path.valueArray()
    val rk = row.keyArray()
    val rv = row.valueArray()
    val np = path.numElements()
    val nr = row.numElements()
    var sawNull = false
    var i = 0
    while (i < np) {
      val key = pk.getUTF8String(i)
      // element_at: first matching key's value, null if absent
      var j = 0
      var found = false
      var rowVal: org.apache.spark.unsafe.types.UTF8String = null
      while (!found && j < nr) {
        if (rk.getUTF8String(j).equals(key)) {
          found = true
          rowVal = if (rv.isNullAt(j)) null else rv.getUTF8String(j)
        }
        j += 1
      }
      if (!found || rowVal == null || pv.isNullAt(i)) sawNull = true
      else if (!rowVal.equals(pv.getUTF8String(i)))
        return java.lang.Boolean.FALSE
      i += 1
    }
    if (sawNull) null else java.lang.Boolean.TRUE
  }

  def matchesAll(path: Column, row: Column): Column =
    ColumnBridge.column(MapMatchesAll(
      ColumnBridge.expression(path), ColumnBridge.expression(row)))
}
