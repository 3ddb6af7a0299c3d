package graft.algorithms

import graft.TestSpark
import graft.sources.{InstanceSource, RsLabels, RsSource}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BatchRobustSpot: a union of instance snapshots keyed by instance_id
  * must produce EXACTLY the per-instance RobustSpot.run results, while
  * running ~4 aggregation passes per drill-down round for the entire
  * corpus instead of per instance.
  *
  * Covers both modes: fundamental measures over the generated corpus,
  * and derived-measure PARITY mode (with `__row`) over real RS cases —
  * the latter pins the batched NumpySum/PyListSort replication against
  * the sequential path that RS_SWEEP.md proved bit-equal to the
  * reference. */
class BatchRobustSpotSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val corpusDir = "src/test/resources/gen_corpus"
  private val rsDir = "/root/reference/data/RS"

  private lazy val files: Seq[String] =
    new java.io.File(corpusDir).listFiles()
      .map(_.getName).filter(n => n.endsWith(".csv") && n != "injection_info.csv")
      .map(_.stripSuffix(".csv")).sorted.toSeq

  test("batch equals sequential RobustSpot per instance (fundamental)") {
    val attrs = Seq("a", "b", "c", "d")
    val union = files.map { f =>
      InstanceSource.readFundamental(spark, corpusDir, f)
        .withColumn("instance_id", lit(f))
    }.reduce(_ unionByName _)

    val batch = BatchRobustSpot.run(union, "instance_id", attrs,
      RobustSpot.Options(k = 3, derived = false))

    for (f <- files) {
      val seq = RobustSpot.run(InstanceSource.readFundamental(spark, corpusDir, f),
        attrs, RobustSpot.Options(k = 3, derived = false))
      assert(batch.getOrElse(f, Seq.empty) == seq, s"file $f")
    }
  }

  test("batch equals sequential RobustSpot per instance (RS parity mode)") {
    // three real production cases sharing one attribute sequence
    val cases = Seq("case1_0821_1741394221", "case2_0824_392202648", "case3_0824_2231886096")
    val raws = cases.map(f => f -> RsSource.readRaw(spark, s"$rsDir/$f.csv"))
    val attrs = RsSource.attributesOf(raws.head._2)
    assert(raws.forall { case (_, r) => RsSource.attributesOf(r) == attrs })

    val union = raws.map { case (f, raw) =>
      RsSource.snapshot(raw, RsLabels.labelFor(rsDir, f).timestamp, withRowIndex = true)
        .withColumn("instance_id", lit(f))
    }.reduce(_ unionByName _)

    val batch = BatchRobustSpot.run(union, "instance_id", attrs,
      RobustSpot.Options(k = 3, derived = true))

    for ((f, raw) <- raws) {
      val snap = RsSource.snapshot(raw, RsLabels.labelFor(rsDir, f).timestamp,
        withRowIndex = true)
      val seq = RobustSpot.run(snap, attrs, RobustSpot.Options(k = 3, derived = true))
      assert(batch.getOrElse(f, Seq.empty) == seq, s"case $f")
    }
  }
}
