package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming generalization of the RS ingest path (SURVEY.md
  * §2.10): the batch snapshot's "mean of the previous N minutes per leaf"
  * becomes a sliding event-time window aggregate with a watermark; each
  * completed window yields a (leaf, predict) forecast that `foreachBatch`
  * can join against the live minute to run any localization algorithm.
  *
  * Scale shape: stateful windowed aggregation keyed by (window, attrs) —
  * Spark's state store partitions by key; the watermark bounds state.
  */
object StreamingForecast {

  /** Input: a streaming DataFrame with event-time column `ts`
    * (TimestampType), attribute columns, and `value`/`cnt`. Output: per
    * sliding window and leaf, the trailing mean forecast
    * (predict_a = avg failures, predict_b = avg cnt, predict = avg k).
    * The window of length periods·60s sliding 60s ending at minute M
    * forecasts minute M (it covers minutes M-periods..M-1). */
  def trailingForecast(stream: DataFrame, attrs: Seq[String],
      periods: Int = 4, watermarkDelay: String = "2 minutes"): DataFrame = {
    val failures = col("cnt") - col("value")
    val k = graft.functions.Scores.numpyDiv(failures, col("cnt"))
    stream
      .withColumn("failures", failures)
      .withColumn("k_real", k)
      .withWatermark("ts", watermarkDelay)
      .groupBy(
        (window(col("ts"), s"${periods * 60} seconds", "60 seconds")
          :: attrs.map(col).toList): _*)
      .agg(
        avg("failures").as("predict_a"),
        avg("cnt").as("predict_b"),
        avg(when(isnan(col("k_real")), lit(null)).otherwise(col("k_real"))).as("predict"))
      // the window [start, end) covers the periods minutes BEFORE `end`:
      // this row is the forecast for the minute starting at `end`
      .withColumn("forecast_minute", col("window.end"))
      .drop("window")
  }

  /** Batch-side equivalence anchor: the same forecast computed on a static
    * frame (used by tests to pin streaming semantics to RsSource). */
  def trailingForecastBatch(df: DataFrame, attrs: Seq[String],
      periods: Int = 4): DataFrame = trailingForecast(df, attrs, periods)
}
