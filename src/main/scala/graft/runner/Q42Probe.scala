package graft.runner

import graft.algorithms.RevRecAdtributor
import graft.queries.ScoreQueries
import org.apache.spark.sql.functions._

/** Throwaway oracle cross-check: RevRecAdtributor predictions on a
  * DUAL-anomaly snapshot (exercises multi-element candidate sets and the
  * keep-vs-expand branches the single-anomaly gate input doesn't).
  * Usage: Q42Probe <sfDir> <brand2> <rf2> [teep] */
object Q42Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val (b2, r2) = (args(1), args(2))
    val teep = args.lift(3).map(_.toDouble).getOrElse(0.1)
    val spark = graft.core.Sessions.local("16", "16", "graft-q42-probe")
    spark.sparkContext.setLogLevel("WARN")
    val snap = ScoreQueries.snapshot(spark, dir)
      .select(col("rf"), col("ls"), col("brand"),
        (col("vreal") * when(col("brand") === "Brand#19" && col("rf") === "R", 2.0)
          .when(col("brand") === b2 && col("rf") === r2, 3.0)
          .otherwise(1.0)).as("real"),
        (col("vreal") * (lit(1.0) +
          (pmod(hash(col("rf"), col("ls"), col("brand")), lit(1000)) / 1000.0 - 0.5) * 0.05))
          .as("predict"))
    val preds = RevRecAdtributor.predictions(
      RevRecAdtributor.run(snap, Seq("brand", "ls", "rf"),
        RevRecAdtributor.Options(teep = teep)))
    preds.foreach(p => println(s"PRED\t$p"))
    // sentinel: proves the runner ran to completion even when the
    // injection legitimately yields zero RC/PRED lines (ADVICE r12)
    println("PROBE_DONE")
    spark.stop()
  }
}
