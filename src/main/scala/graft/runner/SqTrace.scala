package graft.runner

import graft.algorithms.Squeeze
import graft.sources.{RsLabels, RsSource}

/** Debug main: run Squeeze on one RS case with per-cluster/per-cuboid
  * tracing in the same shape as tools/sq_trace_ref.py.
  * Usage: SqTrace <caseFile> [rsDir]
  */
object SqTrace {
  def main(args: Array[String]): Unit = {
    val file = args(0)
    val rsDir = args.lift(1).getOrElse("/root/reference/data/RS")
    val spark = graft.core.Sessions.local("8", "8", "graft-sq-trace")
    spark.sparkContext.setLogLevel("WARN")
    val anomaly = RsLabels.labelFor(rsDir, file)
    val raw = RsSource.readRaw(spark, s"$rsDir/$file.csv")
    val snap = RsSource.snapshot(raw, anomaly.timestamp)
    val attrs = RsSource.attributesOf(raw)
    val preds = Squeeze.run(snap, attrs.sorted,
      Squeeze.Options(derived = true, trace = println))
    println("preds: " + preds.sorted.mkString("|"))
    println("label: " + anomaly.label)
    spark.stop()
  }
}
