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

  /** Add `ep` (explanatory power) using global sums from a broadcast
    * 1-row aggregate (an all-rows window would funnel every row through a
    * single partition — fatal at scale; the crossJoin(broadcast) keeps the
    * decorate pass embarrassingly parallel). For derived measures, EP is
    * sum-normalized to 1 (utils/element_scores.py:4-27). */
  def withExplanatoryPower(df: DataFrame, derived: Boolean = false): DataFrame = {
    if (derived) {
      val t1 = df.agg(sum("predict_a").as("__tpa"), sum("predict_b").as("__tpb"))
      val raw = Scores.explanatoryPowerDerived(
        col("real_a"), col("predict_a"), col("real_b"), col("predict_b"),
        col("__tpa"), col("__tpb"))
      val withRaw = df.crossJoin(broadcast(t1))
        .withColumn("ep", raw).drop("__tpa", "__tpb")
      val t2 = withRaw.agg(Scores.pandasSum(col("ep")).as("__tep"))
      withRaw.crossJoin(broadcast(t2))
        .withColumn("ep", Scores.numpyDiv(col("ep"), col("__tep"))).drop("__tep")
    } else {
      val t = df.agg(sum("real").as("__tr"), sum("predict").as("__tp"))
      df.crossJoin(broadcast(t))
        .withColumn("ep",
          Scores.explanatoryPower(col("real"), col("predict"), col("__tr"), col("__tp")))
        .drop("__tr", "__tp")
    }
  }

  /** Add `deviation` (utils/element_scores.py:58-65). */
  def withDeviation(df: DataFrame): DataFrame =
    df.withColumn("deviation", Scores.deviationScore(col("real"), col("predict")))
}
