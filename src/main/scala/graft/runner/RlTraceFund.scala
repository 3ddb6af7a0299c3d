package graft.runner

import graft.algorithms.RiskLoc
import graft.sources.InstanceSource

/** Debug main: RiskLoc with candidate tracing on one fundamental-measure
  * CSV (e.g. the generated corpus). Counterpart of
  * tools/riskloc_trace_ref_fund.py. Usage: RlTraceFund <dir> <file> */
object RlTraceFund {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val file = args(1)
    val spark = graft.core.Sessions.local("8", "8", "graft-rl-trace-fund")
    spark.sparkContext.setLogLevel("WARN")
    val df = InstanceSource.readFundamental(spark, dir, file)
    val attrs = df.columns.filterNot(Seq("real", "predict").contains).sorted.toSeq
    val rcs = RiskLoc.run(df, attrs, RiskLoc.Options(trace = println))
    rcs.foreach { rc =>
      println(s"CAUSE ${rc.cuboid} ${rc.elements.head.pairs.map(_._2)} " +
        s"ep=${java.lang.Double.toHexString(rc.scores("ep"))} " +
        s"high=${java.lang.Double.toHexString(rc.scores("high_risk"))} " +
        s"low=${java.lang.Double.toHexString(rc.scores("low_risk"))} " +
        s"risk=${java.lang.Double.toHexString(rc.scores("risk"))}")
    }
    println("preds: " + RiskLoc.predictions(rcs).sorted.mkString("|"))
    spark.stop()
  }
}
