package graft.runner

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Spark-job counter for the sequential gate queries (VERDICT r6 #2): the
  * driver-loop algorithms (q40/q44/q46) pay one scheduler round-trip per
  * action, which amplifies box latency 3-7x in the bench. This runner
  * counts jobs per gate query so round-trip reductions are measurable and
  * committable (PERF_NOTES.md).
  *
  * Usage: ActionCount [sfDir] [queryCsv]
  */
object ActionCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val names = args.lift(1).map(_.split(',').toSeq).getOrElse(
      Seq("q40_riskloc", "q41_adtributor", "q42_revrec_adtributor", "q43_autoroot",
        "q44_squeeze", "q45_hotspot", "q46_robustspot"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.core.Sessions.local(cpus, cpus, "graft-action-count")
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    def settle(): Int = {
      var prev = -1; var cur = jobs.get()
      while (cur != prev) { Thread.sleep(150); prev = cur; cur = jobs.get() }
      cur
    }
    // warmup so shared snapshot materialization does not land on the first query
    graft.SparkEntry.queries("q01_filter_project")(spark, sfDir).count()

    val out = names.map { name =>
      spark.catalog.clearCache()
      settle(); jobs.set(0)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val w = (System.nanoTime() - t0) / 1e9
      val j = settle()
      println(f"$name%-24s jobs=$j%4d wall=$w%.2fs")
      s""""$name":$j"""
    }
    println(out.mkString("{", ",", "}"))
    spark.stop()
  }
}
