package graft.runner

import graft.algorithms.{BatchRobustSpot, RobustSpot}
import graft.gen.HCorpus
import org.apache.spark.sql.functions._

/** Fused-vs-chains A/B for BatchRobustSpot's rounds-1-6 execution shape
  * (VERDICT r10 #3): the 4M-row FuseChainsMaxRows threshold was placed
  * from one heavily-loaded window (fused 462s vs chains 357s at 7.7M,
  * calib 1.10-1.18), and ADVICE r10 flags the 3.4-4M zone where the
  * fused pseudo-instance frame (3x corpus rows) exceeds
  * RoundCacheMaxRows and runs its 5 serialized actions uncached.
  *
  * Times BatchRobustSpot.run twice per H-shaped cell in one JVM —
  * graft.brs.fuseMax=0 (chains) vs =Long.MaxValue (fused), clearCache +
  * GC between — and asserts the two modes' predictions are identical.
  * Both runs hit the identical localCheckpoint'ed corpus, so the delta
  * is the rounds-1-6 shape alone. Both mode paths are JIT-warmed on a
  * discarded tiny corpus before any timing, and the mode order
  * alternates per cell (ADVICE r11: the r11 cells always ran chains
  * first, giving fused the same-JVM warmup for free).
  *
  * Usage: BrsFuseAB [cellsSpec]  (same "dims:n;..." syntax as
  * [[CrossoverSweep]]; default brackets the threshold at 3.07M / 3.84M /
  * 7.68M corpus rows).
  */
object BrsFuseAB {
  def main(args: Array[String]): Unit = {
    val cells = args.lift(0).getOrElse(Seq(
      "a10,b5,c8,d5,e8,f12:16", // 192k x 16 = 3.07M (fused, 3x frame cached)
      "a10,b5,c10,d5,e8,f12:16", // 240k x 16 = 3.84M (fused, 3x frame UNCACHED)
      "a10,b5,c10,d10,e8,f12:16" // 480k x 16 = 7.68M (chains on current dispatch)
    ).mkString(";")).split(';').toSeq.map { spec =>
      val Array(dimsSpec, nStr) = spec.split(':')
      (dimsSpec.split(',').toSeq.map(s => (s.take(1), s.drop(1).toInt)), nStr.toInt)
    }

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus, "64", "graft-brs-fuse-ab")
    spark.sparkContext.setLogLevel("WARN")
    val opt = RobustSpot.Options(k = 3, derived = false)

    def timed(corpus: org.apache.spark.sql.DataFrame, attrs: Seq[String])(fuseMax: Long)
        : (Double, Map[String, Seq[Seq[RobustSpot.Cause]]]) = {
      sys.props("graft.brs.fuseMax") = fuseMax.toString
      try {
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        val r = BatchRobustSpot.run(corpus, "instance_id", attrs, opt)
        ((System.nanoTime() - t0) / 1e9, r)
      } finally sys.props -= "graft.brs.fuseMax"
    }

    // Discarded JIT/codegen warmup of BOTH mode paths on a tiny corpus
    // (ADVICE r11: the r11 cells always timed chains first in the same
    // JVM, handing fused the warmup the chains run paid for).
    locally {
      val wDims = Seq(("a", 4), ("b", 3), ("c", 5))
      val w = HCorpus.corpus(spark, 2, wDims).localCheckpoint(true)
      timed(w, wDims.map(_._1))(0L)
      timed(w, wDims.map(_._1))(Long.MaxValue)
      w.unpersist()
    }

    for (((dims, n), cellIdx) <- cells.zipWithIndex) {
      val corpus = HCorpus.corpus(spark, n, dims).localCheckpoint(true)
      val rows = corpus.count()
      val attrs = dims.map(_._1)
      val timeMode = timed(corpus, attrs) _

      // Alternate mode order per cell so any residual same-JVM ordering
      // effect biases the two modes symmetrically across a sweep.
      val ((chainsSec, chainsRes), (fusedSec, fusedRes)) =
        if (cellIdx % 2 == 0) {
          val c = timeMode(0L); val f = timeMode(Long.MaxValue); (c, f)
        } else {
          val f = timeMode(Long.MaxValue); val c = timeMode(0L); (c, f)
        }

      println(f"[brs-ab] rows=$rows%9d (n=$n) fused=$fusedSec%8.1fs " +
        f"chains=$chainsSec%8.1fs winner=${if (fusedSec < chainsSec) "fused" else "chains"} " +
        f"equal=${fusedRes == chainsRes} causes=${fusedRes.values.map(_.size).sum} " +
        f"order=${if (cellIdx % 2 == 0) "chains-first" else "fused-first"}")
      corpus.unpersist()
    }
    spark.stop()
  }
}
