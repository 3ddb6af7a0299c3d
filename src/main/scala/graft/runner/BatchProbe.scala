package graft.runner

import graft.algorithms.{AutoRoot, BatchAutoRoot, BatchRiskLoc, BatchSqueeze}
import graft.queries.ScoreQueries
import org.apache.spark.sql.functions._

/** Throwaway oracle cross-check for the BATCH algorithm oracles
  * (q47/q48/q49): run the whole-corpus Batch* implementation on the
  * three-instance harness corpus with a DIFFERENT anomaly multiplier per
  * instance, so the per-instance oracle plumbing (prune lists, removals,
  * guards — everything `instance_id` is threaded through) is exercised
  * off the gate input where all three instances share m=2.0. The checker
  * (tools/check_batch_probe.py) substitutes the same per-instance
  * multipliers into the generated batch SQL and diffs.
  *
  * Usage: BatchProbe <riskloc|squeeze|autoroot> <sfDir> <m1> <m2> <m3>
  * (mi scales instance i's injected slice: i1=Brand#19/R, i2=Brand#25/A,
  * i3=Brand#31/N; mi=1.0 means instance i has NO anomaly — the
  * empty-per-instance-result edge.)
  */
object BatchProbe {
  def main(args: Array[String]): Unit = {
    val Array(family, dir, m1, m2, m3) = args.take(5)
    val spark = graft.core.Sessions.local("16", "16", "graft-batch-probe")
    spark.sparkContext.setLogLevel("WARN")
    val base = ScoreQueries.snapshot(spark, dir)
    val instances = Seq(
      ("i1", "Brand#19", "R", m1.toDouble),
      ("i2", "Brand#25", "A", m2.toDouble),
      ("i3", "Brand#31", "N", m3.toDouble))
    val corpus = instances.map { case (id, brand, rf, m) =>
      base.select(lit(id).as("instance_id"), col("rf"), col("ls"), col("brand"),
        (col("vreal") * when(col("brand") === brand && col("rf") === rf, m)
          .otherwise(1.0)).as("real"),
        (col("vreal") * (lit(1.0) +
          (pmod(hash(col("rf"), col("ls"), col("brand")), lit(1000)) / 1000.0 - 0.5) * 0.05))
          .as("predict"))
    }.reduce(_ unionByName _).persist()
    val attrs = Seq("brand", "ls", "rf")
    family match {
      case "riskloc" =>
        BatchRiskLoc.run(corpus, "instance_id", attrs).toSeq.sortBy(_._1)
          .foreach { case (inst, rcs) =>
            rcs.foreach(rc => println(s"RC\t$inst\t${rc.labels.mkString(";")}\t" +
              s"${math.floor(rc.scores("risk") * 1e6) / 1e6}"))
          }
      case "squeeze" =>
        BatchSqueeze.run(corpus, "instance_id", attrs).toSeq.sortBy(_._1)
          .foreach { case (inst, preds) =>
            preds.foreach(p => println(s"PRED\t$inst\t$p"))
          }
      case "autoroot" =>
        BatchAutoRoot.run(corpus, "instance_id", attrs,
            AutoRoot.Options(deltaThreshold = 0.1)).toSeq.sortBy(_._1)
          .foreach { case (inst, rcs) =>
            rcs.foreach(rc => println(s"RC\t$inst\t${rc.labels.mkString(";")}\t" +
              s"${math.floor(rc.scores("avg") * 1e6) / 1e6}"))
          }
      case other => sys.error(s"unknown family: $other")
    }
    // sentinel: proves the runner ran to completion even when an
    // injection legitimately yields zero RC/PRED lines (ADVICE r12)
    println("PROBE_DONE")
    spark.stop()
  }
}
