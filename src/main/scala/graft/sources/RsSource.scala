package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** RobustSpot raw time-series ingest: build a single-timestamp leaf
  * snapshot with a trailing-mean forecast (reference
  * utils/robustspot_data_utils.py:6-64).
  *
  * The reference forecasts each leaf with an O(n²) python loop over the
  * history rows; here it is ONE aggregation over the history window joined
  * back to the anomaly minute on the attribute key (SURVEY.md §2.3 J5) —
  * the shape that distributes: both sides shuffle on the same attribute
  * key, and the history scan prunes to `predictPeriods` minutes.
  */
object RsSource {

  /** Raw schema: epoch-minute `min`, failure counters `value`/`cnt`, all
    * other columns are string attributes. */
  def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  def attributesOf(raw: DataFrame): Seq[String] =
    raw.schema.fieldNames.filterNot(Set("min", "value", "cnt")).toSeq

  /** Snapshot at `ts`: value flipped to failures (cnt - value),
    * k = value/cnt, predict = per-leaf mean over the `predictPeriods`
    * preceding minutes, all-NaN/no-history leaves filled with 0
    * (robustspot_data_utils.py:20-41). Output uses the derived-measure
    * common format: real/predict + real_a/predict_a (value) +
    * real_b/predict_b (cnt), attributes cast to string. */
  def snapshot(raw0: DataFrame, ts: Long, predictPeriods: Int = 4,
      withRowIndex: Boolean = false): DataFrame = {
    val attrs = attributesOf(raw0)
    // Parity knob: `__row` preserves the CSV file order of the snapshot
    // rows — RobustSpot's knee threshold replays the reference's
    // sort-with-NaNs quirk (select_expand.py:42-44) over the IDs in
    // pandas row order, which is this order. monotonically_increasing_id
    // is file-order monotone (splits are offset-ordered); parity runs
    // read one file. Off by default — scale runs don't pay for it.
    val raw1 = if (withRowIndex) raw0.withColumn("__row", monotonically_increasing_id())
               else raw0
    val raw = raw1
      // inferred CSV columns may be integral; the measure algebra is double
      .withColumn("value", col("value").cast("double"))
      .withColumn("cnt", col("cnt").cast("double"))
      .withColumn("value", col("cnt") - col("value"))
      .withColumn("k_real", graft.functions.Scores.numpyDiv(col("value"), col("cnt")))

    val historyTs = (1 to predictPeriods).map(i => ts - i * 60L)
    // pandas .mean() skips NaN (0/0-cnt leaves) but keeps ±Inf — replicate
    // by nulling only NaN before avg
    val history = raw
      .filter(col("min").isin(historyTs: _*))
      .groupBy(attrs.map(col): _*)
      .agg(
        avg("value").as("predict_a"),
        avg("cnt").as("predict_b"),
        avg(when(isnan(col("k_real")), lit(null)).otherwise(col("k_real"))).as("predict"))

    val rowCol = if (withRowIndex) Seq(col("__row")) else Seq.empty
    val current = raw
      .filter(col("min") === ts)
      .select((attrs.map(col) ++ Seq(
        col("value").as("real_a"), col("cnt").as("real_b"), col("k_real").as("real")) ++ rowCol): _*)

    val joined = current.join(history, attrs, "left")
    val filled = joined
      .na.fill(0.0, Seq("real", "predict", "real_a", "predict_a", "real_b", "predict_b"))
      .withColumn("real", when(isnan(col("real")), 0.0).otherwise(col("real")))
      .withColumn("predict", when(isnan(col("predict")), 0.0).otherwise(col("predict")))
    attrs.foldLeft(filled)((d, a) => d.withColumn(a, col(a).cast(StringType)))
      .select((attrs.map(col) ++ Seq("real", "predict", "real_a", "predict_a",
        "real_b", "predict_b").map(col) ++ rowCol): _*)
  }
}
