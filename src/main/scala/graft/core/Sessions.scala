package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * `spark.sql.ansi.enabled=false`: the engine reproduces the reference's
  * numpy/pandas arithmetic (0/0 -> NaN -> filled 0, x/0 -> ±Inf) rather
  * than ANSI SQL errors; score formulas additionally guard every division
  * so they are safe under either setting.
  */
object Sessions {
  def local(cores: String, shufflePartitions: String, appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
