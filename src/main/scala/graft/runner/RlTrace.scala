package graft.runner

import graft.algorithms.RiskLoc
import graft.sources.{RsLabels, RsSource}

/** Debug main: run RiskLoc on one RS case with full candidate tracing —
  * the same per-iteration state the reference's `debug=True` prints (see
  * tools/riskloc_trace_ref.py) so the two pipelines can be diffed
  * iteration by iteration. Usage: RlTrace <caseFile> [rsDir]
  */
object RlTrace {
  def main(args: Array[String]): Unit = {
    val file = args(0)
    val rsDir = args.lift(1).getOrElse("/root/reference/data/RS")
    val spark = graft.core.Sessions.local("8", "8", "graft-rl-trace")
    spark.sparkContext.setLogLevel("WARN")
    val anomaly = RsLabels.labelFor(rsDir, file)
    val raw = RsSource.readRaw(spark, s"$rsDir/$file.csv")
    val snap = RsSource.snapshot(raw, anomaly.timestamp)
    val attrs = RsSource.attributesOf(raw)
    val rcs = RiskLoc.run(snap, attrs,
      RiskLoc.Options(derived = true, trace = println))
    rcs.foreach { rc =>
      println(s"CAUSE ${rc.cuboid} ${rc.elements.head.pairs.map(_._2)} " +
        s"ep=${java.lang.Double.toHexString(rc.scores("ep"))} " +
        s"risk=${java.lang.Double.toHexString(rc.scores("risk"))}")
    }
    println("preds: " + RiskLoc.predictions(rcs).sorted.mkString("|"))
    println("label: " + anomaly.label)
    spark.stop()
  }
}
