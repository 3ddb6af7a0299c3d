package graft.runner

import graft.algorithms.{BatchRevRecAdtributor, RevRecAdtributor}
import graft.sources.{RsLabels, RsSource}
import org.apache.spark.sql.functions.lit

/** Debug main: sequential vs batch RevRecAdtributor on one RS case with
  * per-node score tracing. Usage: RraTrace <caseFile> [rsDir] */
object RraTrace {
  def main(args: Array[String]): Unit = {
    val file = args(0)
    val rsDir = args.lift(1).getOrElse("/root/reference/data/RS")
    val spark = graft.core.Sessions.local("8", "8", "graft-rra-trace")
    spark.sparkContext.setLogLevel("WARN")
    val anomaly = RsLabels.labelFor(rsDir, file)
    val raw = RsSource.readRaw(spark, s"$rsDir/$file.csv")
    val snap = RsSource.snapshot(raw, anomaly.timestamp)
    val attrs = RsSource.attributesOf(raw)

    println("==== SEQUENTIAL")
    val seq = RevRecAdtributor.run(snap, attrs,
      RevRecAdtributor.Options(teep = 0.2, k = 3, derived = true, trace = println))
    println("seq preds: " + RevRecAdtributor.predictions(seq).sorted.mkString("|"))

    println("==== BATCH")
    val batch = BatchRevRecAdtributor.run(snap.withColumn("instance_id", lit(file)),
      "instance_id", attrs,
      RevRecAdtributor.Options(teep = 0.2, k = 3, derived = true, trace = println))
    println("batch preds: " +
      BatchRevRecAdtributor.predictions(batch)(file).sorted.mkString("|"))
    spark.stop()
  }
}
