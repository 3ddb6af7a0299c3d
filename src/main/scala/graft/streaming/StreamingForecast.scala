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

  /** Per-minute leaf SNAPSHOTS from one stateful pass: each sliding window
    * of periods+1 minutes yields, per leaf, the trailing mean over its
    * first `periods` minutes (predict) and the final minute's actuals
    * (real) — conditional aggregation against the window's own end, so no
    * stream-stream join of two aggregates is needed. Output rows appear
    * once the watermark closes the window; each is one leaf of the
    * minute-`snapshot_minute` snapshot in the engine's common format. */
  def anomalySnapshots(stream: DataFrame, attrs: Seq[String],
      periods: Int = 4, watermarkDelay: String = "2 minutes"): DataFrame = {
    val failures = col("cnt") - col("value")
    val k = graft.functions.Scores.numpyDiv(failures, col("cnt"))
    val w = window(col("ts"), s"${(periods + 1) * 60} seconds", "60 seconds")
    val inLast = col("ts") >= col("window.end") - expr("INTERVAL 60 SECONDS")
    stream
      .withColumn("failures", failures)
      .withColumn("k_real", k)
      .withWatermark("ts", watermarkDelay)
      .groupBy((w :: attrs.map(col).toList): _*)
      .agg(
        avg(when(!inLast, col("failures"))).as("predict_a"),
        avg(when(!inLast, col("cnt"))).as("predict_b"),
        avg(when(!inLast && !isnan(col("k_real")), col("k_real"))).as("predict"),
        sum(when(inLast, col("failures"))).as("real_a"),
        sum(when(inLast, col("cnt"))).as("real_b"),
        avg(when(inLast && !isnan(col("k_real")), col("k_real"))).as("real"))
      .filter(col("real_a").isNotNull) // leaf present in the snapshot minute
      .withColumn("snapshot_minute", col("window.end").cast("long") - 60)
      .drop("window")
      .na.fill(0.0, Seq("real", "predict", "real_a", "predict_a", "real_b", "predict_b"))
  }

  /** Streaming localization: run an RCA algorithm per completed minute in
    * `foreachBatch` — the streaming generalization of the reference's
    * batch pipeline (SURVEY §2.10). `localize` receives the minute and its
    * snapshot frame; use any of the engine's algorithms inside. */
  def localizeEachMinute(
      snapshots: DataFrame,
      localize: (Long, DataFrame) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    snapshots.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val minutes = batch.select("snapshot_minute").distinct()
          .collect().map(_.getLong(0)).sorted
        minutes.foreach { m =>
          localize(m, batch.filter(col("snapshot_minute") === m).drop("snapshot_minute"))
        }
      }
}
