package graft.runner

import graft.algorithms.AutoRoot
import graft.queries.ScoreQueries
import org.apache.spark.sql.functions._

/** Throwaway oracle cross-check: AutoRoot root causes on a parameterized
  * variant snapshot (same injection surface as Q40Probe — primary
  * multiplier m1 plus an optional second anomaly). A dual anomaly yields
  * multiple KDE clusters and exercises the per-cluster search plus the
  * merge (same-layer dup and lower-layer subsumption) branches; m1 < 1
  * flips the deviation sign; a weak m1 empties the anomalous set.
  * Usage: Q43Probe <sfDir> <m1> [brand2 rf2 m2]
  */
object Q43Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val m1 = args(1).toDouble
    val second = if (args.length >= 5) Some((args(2), args(3), args(4).toDouble)) else None
    val spark = graft.core.Sessions.local("16", "16", "graft-q43-probe")
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
    AutoRoot.run(snap, Seq("brand", "ls", "rf"), AutoRoot.Options(deltaThreshold = 0.1))
      .foreach { rc =>
        println(s"RC\t${rc.labels.mkString(";")}\t${rc.layer}\t" +
          s"${math.floor(rc.scores("avg") * 1e6) / 1e6}")
      }
    // sentinel: proves the runner ran to completion even when the
    // injection legitimately yields zero RC/PRED lines (ADVICE r12)
    println("PROBE_DONE")
    spark.stop()
  }
}
