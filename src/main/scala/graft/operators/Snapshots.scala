package graft.operators

import graft.functions.Scores
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Leaf-snapshot helpers: attribute discovery, derived-measure merge, and
  * score-column decoration (reference utils/run_utils.py:59-91).
  */
object Snapshots {

  val measureColumns: Set[String] =
    Set("real", "predict", "real_a", "predict_a", "real_b", "predict_b",
      "ep", "ep_z", "surprise", "deviation", "weight", "partition", "cluster")

  /** Attribute discovery: all columns minus the known measures, sorted —
    * the reference's dynamic-schema rule (utils/run_utils.py:68-69). */
  def attributes(df: DataFrame): Seq[String] =
    df.schema.fieldNames.filterNot(measureColumns).sorted.toSeq

  /** Derived-measure merge: inner equi-join of the `a` and `b` tables on
    * all attributes, ratio KPIs, 0/0 -> 0 (utils/run_utils.py:74-85). */
  def mergeDerived(dfa: DataFrame, dfb: DataFrame): DataFrame = {
    val attrs = attributes(dfa)
    val a = dfa.withColumnRenamed("real", "real_a").withColumnRenamed("predict", "predict_a")
    val b = dfb.withColumnRenamed("real", "real_b").withColumnRenamed("predict", "predict_b")
    a.join(b, attrs, "inner")
      .withColumn("real", Scores.safeDiv(col("real_a"), col("real_b")))
      .withColumn("predict", Scores.safeDiv(col("predict_a"), col("predict_b")))
  }

  /** Add `ep` (explanatory power) using global sums computed in the same
    * distributed pass (an empty-partition window → one exchange, no
    * driver round-trip). For derived measures, EP is sum-normalized to 1
    * (utils/element_scores.py:4-27). */
  def withExplanatoryPower(df: DataFrame, derived: Boolean = false): DataFrame = {
    val w = Window.partitionBy()
    if (derived) {
      val raw = Scores.explanatoryPowerDerived(
        col("real_a"), col("predict_a"), col("real_b"), col("predict_b"),
        sum("predict_a").over(w), sum("predict_b").over(w))
      val withRaw = df.withColumn("ep", raw)
      withRaw.withColumn("ep", col("ep") / sum("ep").over(w))
    } else {
      df.withColumn("ep",
        Scores.explanatoryPower(col("real"), col("predict"),
          sum("real").over(w), sum("predict").over(w)))
    }
  }

  /** Add `deviation` (utils/element_scores.py:58-65). */
  def withDeviation(df: DataFrame): DataFrame =
    df.withColumn("deviation", Scores.deviationScore(col("real"), col("predict")))
}
