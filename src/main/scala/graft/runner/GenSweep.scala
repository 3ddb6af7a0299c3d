package graft.runner

import graft.algorithms._
import graft.eval.Evaluation
import graft.model.Labels
import graft.sources.InstanceSource
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Wide generator-reproduction sweep (VERDICT r5 #5): GenCorpusSpec pins
  * reference parity on a committed 10-file corpus; the reference's S/L
  * protocol is 1000 files (README.md:109-118). This runner widens the
  * evidence toward that width out-of-band: generate N files with the
  * bit-exact generator replica (graft.gen.ReferenceCorpus), localize each
  * with all seven algorithms, and diff predictions + F1 per file against
  * the reference implementation's own output on the same files (golden
  * tsv built by `GEN_SWEEP_CORPUS=<dir> GEN_SWEEP_OUT=<tsv> PYTHONHASHSEED=0
  * python3 tools/make_gen_golden.py`).
  *
  * Usage: GenSweep [corpusDir] [goldenTsv] [outMd] [algosCsv]
  * Writes a per-algorithm summary table; exit 0 iff every per-file
  * prediction set matches the golden.
  */
object GenSweep {

  val allAlgos: Seq[String] = Seq("riskloc", "autoroot", "squeeze",
    "adtributor", "r_adtributor", "robustspot", "hotspot")

  /** Engine run with the reference CLI defaults for S-style (fundamental,
    * non-derived) corpora — the same dispatch GenCorpusSpec pins at
    * 10 files (tools/make_gen_golden.py ALGO_ARGS). */
  def runAlgo(spark: SparkSession, corpusDir: String, algo: String,
      file: String): Seq[String] = {
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
      case "r_adtributor" =>
        RevRecAdtributor.predictions(RevRecAdtributor.run(df0, attrs,
          RevRecAdtributor.Options(teep = 0.2, k = 3, derived = false)))
      case "robustspot" =>
        // __row: CSV order for the knee's NaN-scramble parity path
        val df = df0.withColumn("__row", monotonically_increasing_id())
        RobustSpot.predictions(RobustSpot.run(df, attrs, RobustSpot.Options(derived = false)))
      case "hotspot" =>
        // stochastic MCTS: the golden seeds random.seed(int(file)) per
        // run; HotSpotParity replays it with the MT19937 port
        val df = df0.withColumn("__row", monotonically_increasing_id())
        HotSpot.predictions(HotSpotParity.run(df, attrs, HotSpot.Options(), BigInt(file)))
      case other => throw new IllegalArgumentException(other)
    }
  }

  def main(args: Array[String]): Unit = {
    val corpusDir = args.lift(0).getOrElse("/tmp/gen_sweep_corpus")
    val goldenTsv = args.lift(1).getOrElse("/tmp/gen_sweep_golden.tsv")
    val outMd = args.lift(2).getOrElse("GEN_SWEEP.md")
    val algos = args.lift(3).map(_.split(',').toSeq).getOrElse(allAlgos)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.core.Sessions.local(cpus, cpus, "graft-gen-sweep")
    spark.sparkContext.setLogLevel("WARN")

    val golden = RsSweep.readGolden(goldenTsv)
    val files = golden.keys.map(_._2).toSeq.distinct.sorted
    println(s"gen sweep: ${files.size} files x ${algos.size} algorithms from $corpusDir")

    val md = new StringBuilder
    md ++= "# Generator-reproduction sweep (engine vs reference)\n\n"
    md ++= s"Corpus: ${files.size} synthetic files (graft.gen.ReferenceCorpus — the\n"
    md ++= "bit-exact generate_dataset.py replica), localized with reference CLI\n"
    md ++= "defaults; golden = the reference implementation run on the same files\n"
    md ++= "(tools/make_gen_golden.py). A match means the per-file prediction SET\n"
    md ++= "is identical, element for element.\n\n"
    md ++= "| algorithm | files | exact prediction match | engine F1 (mean) | reference F1 (mean) | wall (s) |\n"
    md ++= "|---|---|---|---|---|---|\n"

    var allOk = true
    for (algo <- algos) {
      val t0 = System.nanoTime()
      // per-file runs are independent (hotspot reseeds its MT19937 replay
      // per file) — submit them concurrently like Runner.runAll; at the
      // reference S dims (48k rows/file) a sequential 200-file scan would
      // serialize hours of per-file driver coordination
      val perFile = graft.core.Concurrency.awaitAll(
        files.map { file => () =>
          val g = golden((algo, file))
          val preds = Labels.canonicalPredictions(
            runAlgo(spark, corpusDir, algo, file)).sorted
          val s = Evaluation.score(preds, g.label)
          val f1 = if (2 * s.tp + s.fp + s.fn == 0) 0.0
            else 2.0 * s.tp / (2 * s.tp + s.fp + s.fn)
          (file, preds, g, f1)
        }, maxConcurrent = 8)
      var matches = 0
      var engF1 = 0.0
      var refF1 = 0.0
      perFile.foreach { case (file, preds, g, f1) =>
        engF1 += f1
        refF1 += g.f1
        if (preds == g.preds.sorted) matches += 1
        else {
          allOk = false
          println(s"MISMATCH $algo/$file:\n  engine=$preds\n  ref   =${g.preds.sorted}")
        }
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val line = f"| $algo | ${files.size} | $matches/${files.size} | ${engF1 / files.size}%.4f | ${refF1 / files.size}%.4f | $wall%.1f |"
      println(line)
      md ++= line + "\n"
      spark.catalog.clearCache()
    }
    md ++= s"\nSeed protocol: generator corpus seed in the corpus dir name/args; " +
      "hotspot per-file `random.seed(int(file))`, replayed via the MT19937 port.\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(outMd), md.toString.getBytes("UTF-8"))
    println(s"wrote $outMd")
    spark.stop()
    if (!allOk) sys.exit(1)
  }
}
