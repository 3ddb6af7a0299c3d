package graft.runner

import org.apache.spark.sql.functions._

/** Dev probe: time ONE BatchRobustSpot.run over a generated H-shaped
  * corpus (the batch leg of a CrossoverSweep cell, without paying for
  * the sequential leg). Combine with GRAFT_BRS_TRACE=1 for per-pass
  * stderr timings. Usage: BrsProbe [dimsSpec] [nInstances] */
object BrsProbe {
  def main(args: Array[String]): Unit = {
    val dims = args.lift(0).getOrElse("a10,b5,c10,d10,e8,f12")
      .split(',').toSeq.map(s => (s.take(1), s.drop(1).toInt))
    val n = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "64", "graft-brs-probe")
    spark.sparkContext.setLogLevel("WARN")
    val corpus = graft.gen.HCorpus.corpus(spark, n, dims).localCheckpoint(true)
    println(s"corpus rows=${corpus.count()} instances=$n")
    val attrs = dims.map(_._1)
    val t0 = System.nanoTime()
    val res = graft.algorithms.BatchRobustSpot.run(corpus, "instance_id", attrs,
      graft.algorithms.RobustSpot.Options(k = 3, derived = false))
    println(f"batch ${(System.nanoTime() - t0) / 1e9}%.1fs " +
      s"causes=${res.values.map(_.size).sum}")
    spark.stop()
  }
}
