package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-leaf score formulas as pure `Column` algebra (whole-stage-codegen
  * friendly — no UDFs). These are the reference's scoring "UDFs":
  *
  *  - explanatory power (EP)  — reference utils/element_scores.py:4-27
  *  - surprise (JS divergence) — reference utils/element_scores.py:30-55
  *  - deviation score          — reference utils/element_scores.py:58-65
  *  - ripple effect            — reference algorithms/hotspot.py:21-37
  *
  * Global sums (A, F) are passed in as `Column`s so callers decide whether
  * they come from a window (`sum(x).over(Window.partitionBy())`), a
  * broadcast scalar, or a grouped aggregate — at 100 TB the windowed form
  * keeps everything in one distributed pass with no driver round-trip.
  */
object Scores {

  /** 0/0 -> 0 safe division (reference's np.divide-where / fillna(0) idiom,
    * utils/run_utils.py:85). */
  def safeDiv(num: Column, den: Column): Column =
    when(den === 0.0, 0.0).otherwise(num / den)

  /** IEEE-754 (numpy/pandas) division: x/0 -> ±Inf, 0/0 -> NaN. Spark's
    * `Divide` returns NULL for any zero divisor (even doubles, non-ANSI),
    * so formulas replicating numpy arithmetic must divide through this. */
  def numpyDiv(num: Column, den: Column): Column =
    when(den === 0.0,
      when(num === 0.0 || isnan(num), Double.NaN)
        .when(num > 0.0, Double.PositiveInfinity)
        .otherwise(Double.NegativeInfinity))
      .otherwise(num / den)

  /** pandas `.sum()` semantics: NaN skipped (±Inf kept). Spark's `sum`
    * propagates NaN — numpy-parity aggregations sum through this. */
  def pandasSum(c: Column): Column = sum(when(isnan(c), lit(null)).otherwise(c))

  /** Explanatory power, fundamental measure: (real - predict) / (A - F)
    * with IEEE-754 zero-divisor semantics (numpy). */
  def explanatoryPower(real: Column, predict: Column, totalReal: Column, totalPredict: Column): Column =
    numpyDiv(real - predict, totalReal - totalPredict)

  /** Explanatory power, derived measure (before sum-normalization):
    * ((ra-pa)·Fb - (rb-pb)·Fa) / (Fb·(Fb + rb - pb)). */
  def explanatoryPowerDerived(
      realA: Column, predictA: Column, realB: Column, predictB: Column,
      totalPredictA: Column, totalPredictB: Column): Column = {
    val n = (realA - predictA) * totalPredictB - (realB - predictB) * totalPredictA
    val d = totalPredictB * (totalPredictB + realB - predictB)
    numpyDiv(n, d)
  }

  /** One surprise term: x·ln(2x/(x+y)) with NaN/±Inf -> 0 (numpy
    * nan_to_num semantics for the 0-valued p or q cases). Zero guards come
    * first so the division never executes on those rows (ANSI-mode safe —
    * CaseWhen branches evaluate lazily). */
  private def surpriseTerm(x: Column, y: Column): Column = {
    val t = x * log(lit(2.0) * x / (x + y))
    when(x === 0.0 || x + y === 0.0, 0.0)
      .otherwise(when(isnan(t), 0.0).otherwise(coalesce(t, lit(0.0))))
  }

  /** Surprise = Jensen-Shannon-divergence contribution of one leaf:
    * 0.5·(p·ln(2p/(p+q)) + q·ln(2q/(p+q))), p = predict/F, q = real/A. */
  def surprise(real: Column, predict: Column, totalReal: Column, totalPredict: Column): Column = {
    val p = predict / totalPredict
    val q = real / totalReal
    lit(0.5) * (surpriseTerm(p, q) + surpriseTerm(q, p))
  }

  /** Deviation score: 2·(predict-real)/(predict+real), 0/0 -> 0. */
  def deviationScore(real: Column, predict: Column): Column =
    when(predict + real === 0.0, 0.0)
      .otherwise(lit(2.0) * (predict - real) / (predict + real))

  /** HotSpot ripple-effect expected value for a selected leaf:
    * a = f_leaf - (f_sum - v_sum) · f_leaf / f_sum
    * where f_sum/v_sum are the sums over the selected element's leaves. */
  def rippleExpectation(fLeaf: Column, fSel: Column, vSel: Column): Column =
    when(fSel === 0.0, 0.0).otherwise(fLeaf - (fSel - vSel) * fLeaf / fSel)

  /** AutoRoot NPS numerator building blocks use plain L1/L2 distances —
    * kept as aggregate expressions at the call sites (sum(abs/pow)). */
}
