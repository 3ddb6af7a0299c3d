package graft.runner

import graft.algorithms.RiskLoc
import graft.queries.ScoreQueries
import org.apache.spark.sql.functions._

/** Throwaway oracle cross-check: RiskLoc root causes on a parameterized
  * variant snapshot — a second injected anomaly and/or a non-2x primary
  * multiplier (m1 < 1 flips the anomaly direction, exercising the cutoff
  * sign, anomaly_right and EP-negation branches; a dual anomaly exercises
  * the removal loop's second real iteration; a weak anomaly exercises the
  * guard-pass/no-winner fixed point). The checker script substitutes the
  * same injection into the generated q40 oracle SQL and diffs.
  * Usage: Q40Probe <sfDir> <m1> [brand2 rf2 m2]
  */
object Q40Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val m1 = args(1).toDouble
    val second = if (args.length >= 5) Some((args(2), args(3), args(4).toDouble)) else None
    val spark = graft.core.Sessions.local("16", "16", "graft-q40-probe")
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
    RiskLoc.run(snap, Seq("brand", "ls", "rf")).foreach { rc =>
      println(s"RC\t${rc.labels.mkString(";")}\t${rc.layer}\t" +
        s"${math.floor(rc.scores("risk") * 1e6) / 1e6}")
    }
    // sentinel: proves the runner ran to completion even when the
    // injection legitimately yields zero RC/PRED lines (ADVICE r12)
    println("PROBE_DONE")
    spark.stop()
  }
}
