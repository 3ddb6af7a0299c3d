package graft.algorithms

import graft.TestSpark
import graft.sources.{InstanceSource, RsLabels, RsSource}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BatchRevRecAdtributor: the whole corpus unioned into one instance-keyed
  * frame must reproduce the sequential per-instance RevRecAdtributor.run
  * exactly — same candidates, same recursion/abandon/dedup outcomes —
  * while each recursion LEVEL costs a fixed number of corpus-wide passes
  * instead of one grouping-sets job per recursion node. */
class BatchRevRecAdtributorSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val corpusDir = "src/test/resources/gen_corpus"
  private val rsDir = "/root/reference/data/RS"

  private lazy val files: Seq[String] =
    new java.io.File(corpusDir).listFiles()
      .map(_.getName).filter(n => n.endsWith(".csv") && n != "injection_info.csv")
      .map(_.stripSuffix(".csv")).sorted.toSeq

  test("batch equals sequential r_adtributor per instance (fundamental)") {
    val attrs = Seq("a", "b", "c", "d")
    val union = files.map { f =>
      InstanceSource.readFundamental(spark, corpusDir, f)
        .withColumn("instance_id", lit(f))
    }.reduce(_ unionByName _)

    val batch = BatchRevRecAdtributor.run(union, "instance_id", attrs,
      RevRecAdtributor.Options(teep = 0.2, k = 3, derived = false))

    for (f <- files) {
      val seq = RevRecAdtributor.run(
        InstanceSource.readFundamental(spark, corpusDir, f), attrs,
        RevRecAdtributor.Options(teep = 0.2, k = 3, derived = false))
      assert(RevRecAdtributor.predictions(batch.getOrElse(f, Seq.empty)).sorted ==
        RevRecAdtributor.predictions(seq).sorted, s"file $f")
    }
  }

  test("batch equals sequential r_adtributor per instance (RS derived)") {
    assume(new java.io.File(s"$rsDir/anomaly.yaml").exists(), "reference corpus not mounted")
    // tie-heavy derived cases sharing one attribute sequence
    val cases = Seq("case50_0215_367138632", "case52_0215_367138632")
    val raws = cases.map(f => f -> RsSource.readRaw(spark, s"$rsDir/$f.csv"))
    val attrs = RsSource.attributesOf(raws.head._2)
    assume(raws.forall { case (_, r) => RsSource.attributesOf(r) == attrs })

    val union = raws.map { case (f, raw) =>
      RsSource.snapshot(raw, RsLabels.labelFor(rsDir, f).timestamp)
        .withColumn("instance_id", lit(f))
    }.reduce(_ unionByName _)

    val batch = BatchRevRecAdtributor.run(union, "instance_id", attrs,
      RevRecAdtributor.Options(teep = 0.2, k = 3, derived = true))

    for ((f, raw) <- raws) {
      val seq = RevRecAdtributor.run(
        RsSource.snapshot(raw, RsLabels.labelFor(rsDir, f).timestamp), attrs,
        RevRecAdtributor.Options(teep = 0.2, k = 3, derived = true))
      assert(RevRecAdtributor.predictions(batch.getOrElse(f, Seq.empty)).sorted ==
        RevRecAdtributor.predictions(seq).sorted, s"case $f")
    }
  }

  test("parity-mode batch hotspot equals sequential HotSpotParity per instance") {
    assume(new java.io.File(s"$rsDir/anomaly.yaml").exists(), "reference corpus not mounted")
    val cases = Seq("case1_0821_1741394221", "case2_0824_392202648")
    val raws = cases.map(f => f -> RsSource.readRaw(spark, s"$rsDir/$f.csv"))
    val attrs = RsSource.attributesOf(raws.head._2)
    assume(raws.forall { case (_, r) => RsSource.attributesOf(r) == attrs })

    val union = raws.map { case (f, raw) =>
      RsSource.snapshot(raw, RsLabels.labelFor(rsDir, f).timestamp, withRowIndex = true)
        .withColumn("instance_id", lit(f))
    }.reduce(_ unionByName _)

    val seedOf = (f: String) => BigInt(graft.runner.RsSweep.crc32Seed(f))
    val batch = BatchHotSpot.runParity(union, "instance_id", attrs,
      HotSpot.Options(), seedOf)

    for ((f, raw) <- raws) {
      val snap = RsSource.snapshot(raw, RsLabels.labelFor(rsDir, f).timestamp,
        withRowIndex = true)
      val seq = HotSpotParity.run(snap, attrs, HotSpot.Options(), seedOf(f))
      assert(batch(f) == seq, s"case $f")
    }
  }
}
