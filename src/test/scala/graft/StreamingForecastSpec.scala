package graft

import graft.streaming.StreamingForecast
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structured-Streaming trailing forecast: the windowed aggregate must
  * reproduce the batch RS forecast semantics (mean of the previous 4
  * minutes per leaf) for completed windows. */
class StreamingForecastSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("sliding-window trailing mean matches the batch forecast") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Double, Double)]

    val base = 1699999980L // minute-aligned (windows snap to epoch minutes)
    // leaf A: failures 2,4,6,8 over minutes m0..m3 (cnt 10)
    val rows = (0 until 4).map(m =>
      (base + m * 60L, "A", 10.0 - 2.0 * (m + 1), 10.0)) :+
      ((base + 4 * 60L, "B", 9.0, 10.0)) // unrelated leaf later
    input.addData(rows: _*)

    val stream = input.toDF().toDF("epoch", "leaf", "value", "cnt")
      .withColumn("ts", col("epoch").cast("timestamp"))
    val forecast = StreamingForecast.trailingForecast(stream, Seq("leaf"), periods = 4)

    val query = forecast.writeStream
      .format("memory").queryName("fc").outputMode("append")
      .start()
    try {
      input.addData((base + 10 * 60L, "A", 10.0, 10.0)) // advance watermark
      query.processAllAvailable()
      val out = spark.table("fc")
        .select(col("leaf"), col("forecast_minute").cast("long").as("fm"),
          col("predict_a"), col("predict_b"), col("predict"))
        .collect()
      // the window covering exactly minutes m0..m3 forecasts base+240
      val a = out.find(r => r.getString(0) == "A" && r.getLong(1) == base + 240)
      assert(a.isDefined, out.mkString("; "))
      assert(a.get.getDouble(2) == 5.0) // mean failures (2+4+6+8)/4
      assert(a.get.getDouble(3) == 10.0)
      assert(math.abs(a.get.getDouble(4) - 0.5) < 1e-12) // mean k
    } finally query.stop()
  }
}
