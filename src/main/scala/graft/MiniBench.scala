package graft
object MiniBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("32", "32", "graft-minibench")
    graft.core.Tables.names.foreach { t =>
      try graft.core.Tables.load(spark, sfDir, t).limit(1).count()
      catch { case _: Throwable => () } }
    try SparkEntry.queries("q01_filter_project")(spark, sfDir).count()
    catch { case _: Throwable => () }
    val names = args.toSeq
    names.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      println(f"MINIBENCH $name ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
