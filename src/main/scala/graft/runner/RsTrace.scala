package graft.runner

import graft.algorithms.RobustSpot
import graft.sources.{RsLabels, RsSource}

/** Debug main: run RobustSpot on one RS case with per-round tracing —
  * intermediates printed in the same shape as the reference's (see
  * tools/rs_trace_ref.py) so the two pipelines can be diffed round by
  * round. Usage: RsTrace <caseFile> [rsDir]
  */
object RsTrace {
  def main(args: Array[String]): Unit = {
    val file = args(0)
    val rsDir = args.lift(1).getOrElse("/root/reference/data/RS")
    val spark = graft.core.Sessions.local("8", "8", "graft-rs-trace")
    spark.sparkContext.setLogLevel("WARN")
    val anomaly = RsLabels.labelFor(rsDir, file)
    val raw = RsSource.readRaw(spark, s"$rsDir/$file.csv")
    val snap = RsSource.snapshot(raw, anomaly.timestamp, withRowIndex = true)
    val attrs = RsSource.attributesOf(raw)
    val rcs = RobustSpot.run(snap, attrs,
      RobustSpot.Options(k = 3, derived = true, trace = println))
    println("preds: " + RobustSpot.predictions(rcs).sorted.mkString("|"))
    println("label: " + anomaly.label)
    spark.stop()
  }
}
