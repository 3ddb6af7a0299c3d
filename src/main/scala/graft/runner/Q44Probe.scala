package graft.runner

import graft.algorithms.Squeeze
import graft.queries.ScoreQueries
import org.apache.spark.sql.functions._

/** Throwaway oracle cross-check: Squeeze predictions WITH the internal
  * trace (KPIFILTER/ONEDIM/NORMAL/CLUSTER/CUBOID/PICK lines) on a
  * parameterized variant snapshot — same injection surface as
  * Q40Probe/Q43Probe. The trace lines let the oracle checker diff every
  * intermediate stage (knee, cluster intervals, normal threshold,
  * per-cuboid scores), not just the final strings.
  * Usage: Q44Probe <sfDir> <m1> [brand2 rf2 m2]
  */
object Q44Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val m1 = args(1).toDouble
    val second = if (args.length >= 5) Some((args(2), args(3), args(4).toDouble)) else None
    val spark = graft.core.Sessions.local("16", "16", "graft-q44-probe")
    spark.sparkContext.setLogLevel("WARN")
    val scale = {
      val base = when(col("brand") === "Brand#19" && col("rf") === "R", m1)
      // '*' wildcards an attribute (e.g. "* R 2.0" doubles EVERY brand's
      // rf=R slice — the single-attribute anomaly that exercises the
      // layer-1 winner paths)
      def m(c: String, v: String) = if (v == "*") lit(true) else col(c) === v
      second.fold(base.otherwise(1.0)) { case (b2, r2, m2) =>
        base.when(m("brand", b2) && m("rf", r2), m2).otherwise(1.0)
      }
    }
    val snap = ScoreQueries.snapshot(spark, dir)
      .select(col("rf"), col("ls"), col("brand"),
        (col("vreal") * scale).as("real"),
        (col("vreal") * (lit(1.0) +
          (pmod(hash(col("rf"), col("ls"), col("brand")), lit(1000)) / 1000.0 - 0.5) * 0.05))
          .as("predict"))
    val preds = Squeeze.run(snap, Seq("brand", "ls", "rf"),
      Squeeze.Options(trace = s => println(s"TR\t$s")))
    preds.foreach(p => println(s"PRED\t$p"))
    // sentinel: proves the runner ran to completion even when the
    // injection legitimately yields zero RC/PRED lines (ADVICE r12)
    println("PROBE_DONE")
    spark.stop()
  }
}
