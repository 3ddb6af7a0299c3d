package graft.runner

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Measurement-only job tracer (round 14, guide §1): runs one gate query
  * and logs every Spark job's submit time, wall and call site, plus the
  * DRIVER GAP since the previous job ended — the scheduler-round-trip
  * latency the driver-loop algorithm queries pay per action. Output is a
  * TSV on stdout; nothing here is part of any declared query.
  *
  * Usage: JobTrace <sfDir> <queryName> [repeats]
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val repeats = args.lift(2).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus, cpus, "graft-job-trace")
    spark.sparkContext.setLogLevel("WARN")

    final case class Ev(id: Int, submitMs: Long, endMs: Long, site: String)
    val events = new java.util.concurrent.ConcurrentHashMap[Int, Ev]()
    val order = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .orElse(js.stageInfos.lastOption.map(si =>
            si.details.linesIterator.find(l => l.contains("graft"))
              .getOrElse(si.name)))
          .getOrElse("?")
        events.put(js.jobId, Ev(js.jobId, js.time, -1L, site))
        order.add(js.jobId)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val ev = events.get(je.jobId)
        if (ev != null) events.put(je.jobId, ev.copy(endMs = je.time))
      }
    })

    val fn = graft.SparkEntry.queries(name)
    for (rep <- 1 to repeats) {
      events.clear(); order.clear()
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val n = df.count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain
      import scala.jdk.CollectionConverters._
      val evs = order.asScala.flatMap(id => Option(events.get(id))).sortBy(_.submitMs)
      println(s"== $name rep $rep rows=$n wall=${f"$wall%.2f"}s jobs=${evs.size}")
      var prevEnd = -1L
      var busy = 0L
      var gap = 0L
      for (e <- evs) {
        val g = if (prevEnd < 0) 0L else math.max(0L, e.submitMs - prevEnd)
        val w = if (e.endMs > 0) e.endMs - e.submitMs else -1L
        if (w > 0) busy += w
        gap += g
        println(s"JOB\t${e.id}\t+${g}ms\t${w}ms\t${e.site}")
        if (e.endMs > prevEnd) prevEnd = e.endMs
      }
      println(f"== busy=${busy / 1e3}%.2fs driver-gaps=${gap / 1e3}%.2fs")
      // per-callsite rollup: where do the job-walls concentrate?
      val bySite = evs.filter(_.endMs > 0).groupBy(_.site).toSeq
        .map { case (s, es) => (s, es.size, es.map(e => e.endMs - e.submitMs).sum) }
        .sortBy(-_._3)
      for ((s, n2, tot) <- bySite)
        println(f"SITE\t$s\t$n2%d jobs\t${tot / 1e3}%.2fs")
    }
    spark.stop()
  }
}
