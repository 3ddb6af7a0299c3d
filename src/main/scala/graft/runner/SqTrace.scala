package graft.runner

import graft.algorithms.Squeeze
import graft.sources.{RsLabels, RsSource}

/** Debug main: run Squeeze on one RS case (derived) or one generated
  * fundamental-corpus file with per-cluster/per-cuboid tracing in the
  * same shape as tools/sq_trace_ref.py / sq_trace_gen.py.
  * Usage: SqTrace <caseFile> [rsDir]     (RS, derived)
  *        SqTrace <file> --gen <corpusDir>  (generated, fundamental)
  */
object SqTrace {
  def main(args: Array[String]): Unit = {
    val file = args(0)
    val spark = graft.core.Sessions.local("8", "8", "graft-sq-trace")
    spark.sparkContext.setLogLevel("WARN")
    if (args.lift(1).contains("--gen")) {
      val corpusDir = args(2)
      val df = graft.sources.InstanceSource.readFundamental(spark, corpusDir, file)
      val attrs = df.columns.filterNot(Set("real", "predict")).toSeq
      val preds = Squeeze.run(df, attrs.sorted,
        Squeeze.Options(trace = println))
      println("preds: " + preds.sorted.mkString("|"))
    } else {
      val rsDir = args.lift(1).getOrElse("/root/reference/data/RS")
      val anomaly = RsLabels.labelFor(rsDir, file)
      val raw = RsSource.readRaw(spark, s"$rsDir/$file.csv")
      val snap = RsSource.snapshot(raw, anomaly.timestamp)
      val attrs = RsSource.attributesOf(raw)
      val preds = Squeeze.run(snap, attrs.sorted,
        Squeeze.Options(derived = true, trace = println))
      println("preds: " + preds.sorted.mkString("|"))
      println("label: " + anomaly.label)
    }
    spark.stop()
  }
}
