package graft.gen

import graft.TestSpark
import graft.algorithms._
import graft.eval.Evaluation
import graft.model.Labels
import graft.sources.InstanceSource
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Generator reproduction path: the committed synthetic corpus
  * (src/test/resources/gen_corpus — 10 files from graft.gen.ReferenceCorpus,
  * seed 20260812, dims a6 b5 c4 d3) is localized by the REFERENCE
  * implementation (fixtures/gen_corpus_golden.tsv via
  * tools/make_gen_golden.py) and by the engine; per-file predictions and
  * F1 must match exactly for all six algorithms — including stochastic
  * HotSpot, whose seeded reference run is replayed bit-for-bit via the
  * MT19937 port (HotSpotParity). This closes the loop
  * the VERDICT asked for: generated labels round-trip, and engine F1 on
  * generator output equals the reference's.
  */
class GenCorpusSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val corpusDir = "src/test/resources/gen_corpus"
  private val goldenPath = "src/test/resources/fixtures/gen_corpus_golden.tsv"

  private final case class Golden(label: String, preds: Seq[String], tp: Int, fp: Int, fn: Int)

  private lazy val golden: Map[(String, String), Golden] =
    scala.io.Source.fromFile(goldenPath, "UTF-8").getLines().map { line =>
      val f = line.split("\t", -1)
      val preds = if (f(3).isEmpty) Seq.empty[String] else f(3).split('|').toSeq
      (f(0), f(1)) -> Golden(f(2), preds, f(4).toInt, f(5).toInt, f(6).toInt)
    }.toMap

  private lazy val files: Seq[String] = golden.keys.map(_._2).toSeq.distinct.sorted

  private def runAlgo(algo: String, file: String): Seq[String] = {
    val df0 = InstanceSource.readFundamental(spark, corpusDir, file)
    val attrs = df0.columns.filterNot(Set("real", "predict")).toSeq
    algo match {
      case "riskloc" =>
        RiskLoc.predictions(RiskLoc.run(df0, attrs, RiskLoc.Options()))
      case "autoroot" =>
        AutoRoot.predictions(AutoRoot.run(df0, attrs, AutoRoot.Options(deltaThreshold = 0.25)))
      case "squeeze" =>
        Squeeze.run(df0, attrs.sorted, Squeeze.Options())
      case "adtributor" =>
        Adtributor.predictions(Adtributor.run(df0, attrs, Adtributor.Options()))
      case "robustspot" =>
        // __row: CSV order for the knee's NaN-scramble parity path
        val df = df0.withColumn("__row", monotonically_increasing_id())
        RobustSpot.predictions(RobustSpot.run(df, attrs, RobustSpot.Options(derived = false)))
      case "hotspot" =>
        // stochastic MCTS: the golden seeds random.seed(int(file)) per run;
        // HotSpotParity replays it with the MT19937 port + CPython set order
        val df = df0.withColumn("__row", monotonically_increasing_id())
        HotSpot.predictions(HotSpotParity.run(df, attrs, HotSpot.Options(), BigInt(file)))
    }
  }

  for (algo <- Seq("riskloc", "autoroot", "squeeze", "adtributor", "robustspot", "hotspot")) {
    test(s"$algo matches the reference exactly on the generated corpus") {
      for (file <- files) {
        val g = golden((algo, file))
        val preds = runAlgo(algo, file)
        val canonical = Labels.canonicalPredictions(preds)
        assert(canonical.sorted == g.preds.sorted, s"$algo/$file")
        val s = Evaluation.score(preds, g.label)
        assert((s.tp, s.fp, s.fn) == ((g.tp, g.fp, g.fn)), s"$algo/$file score")
      }
    }
  }
}
