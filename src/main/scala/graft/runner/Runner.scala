package graft.runner

import graft.algorithms._
import graft.eval.Evaluation
import graft.operators.Snapshots
import graft.sources.{InstanceSource, RsLabels, RsSource}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.util.concurrent.Executors
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** Batch-evaluation runner — the engine's `run.py` (reference run.py +
  * utils/run_utils.py): enumerate instance files under a directory, run
  * one localization algorithm per instance, score set-match F1 against
  * ground truth, and write per-instance + per-(dataset, folder) summary
  * CSVs.
  *
  * Parallelism: the reference forks 10 OS processes; here instances are
  * submitted concurrently against one SparkSession (FAIR scheduling) —
  * each instance's jobs interleave across the cluster, which is the shape
  * that scales past one machine.
  *
  * Usage: Runner <algorithm> --run-path <dir> [--data-root data]
  *   [--n-threads 10] [--derived true|false] [--out results] [--batch]
  * Algorithms: riskloc | adtributor | rev_rec_adtributor | autoroot |
  *   squeeze | hotspot | robustspot
  */
object Runner {

  final case class InstanceResult(dataset: String, folder: String, file: String,
      f1: Double, tp: Int, fp: Int, fn: Int, seconds: Double)

  def runInstance(spark: SparkSession, dataRoot: String,
      ref: InstanceSource.InstanceRef, algorithm: String,
      derivedFlag: Option[Boolean]): InstanceResult =
    runInstance(spark, dataRoot, ref, algorithm, derivedFlag, Map.empty)

  /** `opts`: the reference CLI's per-algorithm flags
    * (utils/argument_parser.py:18-69) by their kebab-case names, e.g.
    * "risk-threshold" -> "0.4", "teep" -> "0.05", "debug" -> "true". */
  def runInstance(spark: SparkSession, dataRoot: String,
      ref: InstanceSource.InstanceRef, algorithm: String,
      derivedFlag: Option[Boolean], opts: Map[String, String]): InstanceResult = {
    val rsData = ref.dataset == "RS"
    val derived = derivedFlag.getOrElse(ref.dataset == "D" || rsData)
    val dir = ref.dir(dataRoot)

    val (df, label): (DataFrame, String) =
      if (rsData) {
        val anomaly = RsLabels.labelFor(dir, ref.file)
        val raw = RsSource.readRaw(spark, s"$dir/${ref.file}.csv")
        (RsSource.snapshot(raw, anomaly.timestamp), anomaly.label)
      } else if (derived)
        (InstanceSource.readDerived(spark, dir, ref.file),
          InstanceSource.injectionLabel(dir, ref.file))
      else
        (InstanceSource.readFundamental(spark, dir, ref.file),
          InstanceSource.injectionLabel(dir, ref.file))

    val attributes = Snapshots.attributes(df)
    def d(key: String, dflt: Double) = opts.get(key).map(_.toDouble).getOrElse(dflt)
    def i(key: String, dflt: Int) = opts.get(key).map(_.toInt).getOrElse(dflt)
    def b(key: String, dflt: Boolean) = opts.get(key).map(_.toBoolean).getOrElse(dflt)
    val trace: String => Unit =
      if (b("debug", dflt = false)) line => Console.err.println(s"[${ref.file}] $line")
      else _ => ()
    val t0 = System.nanoTime()
    val predictions: Seq[String] = algorithm match {
      case "riskloc" =>
        RiskLoc.predictions(RiskLoc.run(df, attributes, RiskLoc.Options(
          riskThreshold = d("risk-threshold", 0.5),
          pepThreshold = d("pep-threshold", 0.02),
          nRemove = i("n-remove", 5),
          removeRelative = b("remove-relative", dflt = false),
          pruneElements = b("prune-elements", dflt = true),
          derived = derived, trace = trace)))
      case "adtributor" =>
        Adtributor.predictions(Adtributor.run(df, attributes, Adtributor.Options(
          tep = d("tep", 0.1), teep = d("teep", 0.1), k = i("k", 3), derived = derived)))
      case "rev_rec_adtributor" =>
        RevRecAdtributor.predictions(RevRecAdtributor.run(df, attributes,
          RevRecAdtributor.Options(teep = d("teep", 0.2), k = i("k", 3), derived = derived)))
      case "autoroot" =>
        AutoRoot.predictions(AutoRoot.run(df, attributes,
          AutoRoot.Options(deltaThreshold = d("delta-threshold", 0.25))))
      case "squeeze" =>
        Squeeze.run(df, attributes, Squeeze.Options(
          psUpperBound = d("ps-upper-bound", 0.9),
          maxNumElements = i("max-num-elements-single-cluster", 12),
          derived = derived, trace = trace))
      case "hotspot" =>
        HotSpot.predictions(HotSpot.run(df, attributes, HotSpot.Options(
          pt = d("pt", 0.8), m = i("m", 200),
          scoring = opts.getOrElse("scoring", "gps"))))
      case "robustspot" =>
        RobustSpot.predictions(RobustSpot.run(df, attributes, RobustSpot.Options(
          k = i("k", 3),
          lambdaAmplification = i("lambda-amplification", 100),
          caThreshold = d("contribution-ability-threshold", 0.0),
          confidenceThreshold = d("confidence-threshold", 0.8),
          derived = derived, trace = trace)))
      case other => throw new IllegalArgumentException(s"unknown algorithm: $other")
    }
    val seconds = (System.nanoTime() - t0) / 1e9

    val s = Evaluation.score(predictions, label)
    InstanceResult(ref.dataset, ref.folder, ref.file, s.f1, s.tp, s.fp, s.fn, seconds)
  }

  /** Per-(dataset, folder) aggregate with recomputed F1
    * (run_utils.py:142-165). */
  def summarize(spark: SparkSession, results: Seq[InstanceResult]): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    results.toDF()
      .groupBy("dataset", "folder")
      .agg(sum("tp").as("tp"), sum("fp").as("fp"), sum("fn").as("fn"),
        sum("seconds").as("seconds"))
      .withColumn("f1",
        when(lit(2) * col("tp") + col("fp") + col("fn") === 0, 0.0)
          .otherwise(lit(2.0) * col("tp") / (lit(2) * col("tp") + col("fp") + col("fn"))))
      .orderBy("dataset", "folder")
  }

  /** Run every instance concurrently (the reference's process pool becomes
    * concurrent job submission against one session). */
  def runAll(spark: SparkSession, dataRoot: String, refs: Seq[InstanceSource.InstanceRef],
      algorithm: String, derivedFlag: Option[Boolean], nThreads: Int,
      opts: Map[String, String] = Map.empty): Seq[InstanceResult] = {
    val pool = Executors.newFixedThreadPool(nThreads)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = refs.map(ref => Future(runInstance(spark, dataRoot, ref, algorithm, derivedFlag, opts)))
      Await.result(Future.sequence(futures), Duration.Inf)
    } finally pool.shutdown()
  }

  /** Whole-corpus batch mode (`--batch`): instead of one driver-coordinated
    * run per instance, every instance becomes one key of a single
    * instance-keyed frame and the corpus runs as one Batch* DAG per
    * (dataset, folder, attribute-sequence) group — a fixed number of
    * corpus-wide aggregation passes per layer/round, the execution shape
    * for 1000-file corpora on a real cluster. Predictions per instance are
    * pinned equal to the sequential path by the Batch*Specs.
    * rev_rec_adtributor has no batched variant (its recursion re-derives
    * per-instance sub-snapshots) — it falls back to runAll. */
  def runBatch(spark: SparkSession, dataRoot: String, refs: Seq[InstanceSource.InstanceRef],
      algorithm: String, derivedFlag: Option[Boolean],
      opts: Map[String, String] = Map.empty): Seq[InstanceResult] = {
    import org.apache.spark.sql.functions.lit
    def d(key: String, dflt: Double) = opts.get(key).map(_.toDouble).getOrElse(dflt)
    def i(key: String, dflt: Int) = opts.get(key).map(_.toInt).getOrElse(dflt)
    def b(key: String, dflt: Boolean) = opts.get(key).map(_.toBoolean).getOrElse(dflt)

    final case class Loaded(ref: InstanceSource.InstanceRef, key: String,
        df: DataFrame, label: String, attrs: Seq[String], derived: Boolean)
    val loaded = refs.map { ref =>
      val rsData = ref.dataset == "RS"
      val derived = derivedFlag.getOrElse(ref.dataset == "D" || rsData)
      val dir = ref.dir(dataRoot)
      val (df, label): (DataFrame, String) =
        if (rsData) {
          val anomaly = RsLabels.labelFor(dir, ref.file)
          val raw = RsSource.readRaw(spark, s"$dir/${ref.file}.csv")
          (RsSource.snapshot(raw, anomaly.timestamp), anomaly.label)
        } else if (derived)
          (InstanceSource.readDerived(spark, dir, ref.file),
            InstanceSource.injectionLabel(dir, ref.file))
        else
          (InstanceSource.readFundamental(spark, dir, ref.file),
            InstanceSource.injectionLabel(dir, ref.file))
      Loaded(ref, s"${ref.dataset}/${ref.folder}/${ref.file}", df, label,
        Snapshots.attributes(df), derived)
    }

    loaded.groupBy(l => (l.ref.dataset, l.ref.folder, l.attrs, l.derived)).toSeq
      .flatMap { case ((_, _, attrs, derived), group) =>
        val t0 = System.nanoTime()
        // one materialization: Batch* runs many passes over the corpus, and
        // the per-file scan/join lineage should not ride along in each
        val union = group.map(l => l.df.withColumn("instance_id", lit(l.key)))
          .reduce(_ unionByName _).localCheckpoint(true)
        val preds: Map[String, Seq[String]] = algorithm match {
          case "riskloc" =>
            BatchRiskLoc.run(union, "instance_id", attrs, RiskLoc.Options(
              riskThreshold = d("risk-threshold", 0.5),
              pepThreshold = d("pep-threshold", 0.02),
              nRemove = i("n-remove", 5),
              removeRelative = b("remove-relative", dflt = false),
              pruneElements = b("prune-elements", dflt = true),
              derived = derived))
              .view.mapValues(RiskLoc.predictions).toMap
          case "adtributor" =>
            val rows = BatchAdtributor.run(union, "instance_id", attrs,
              Adtributor.Options(tep = d("tep", 0.1), teep = d("teep", 0.1),
                k = i("k", 3), derived = derived)).collect()
            rows.groupBy(r => r.getString(r.fieldIndex("instance_id")))
              .view.mapValues { rs =>
                graft.model.Labels.canonicalPredictions(
                  rs.sortBy(_.getInt(rs.head.fieldIndex("rank"))).toSeq.flatMap { r =>
                    val dim = r.getString(r.fieldIndex("dimension"))
                    r.getSeq[String](r.fieldIndex("elements")).map(e => s"$dim=$e")
                  })
              }.toMap
          case "autoroot" =>
            BatchAutoRoot.run(union, "instance_id", attrs,
                AutoRoot.Options(deltaThreshold = d("delta-threshold", 0.25)))
              .view.mapValues(AutoRoot.predictions).toMap
          case "squeeze" =>
            BatchSqueeze.run(union, "instance_id", attrs, Squeeze.Options(
              psUpperBound = d("ps-upper-bound", 0.9),
              maxNumElements = i("max-num-elements-single-cluster", 12),
              derived = derived))
          case "hotspot" =>
            BatchHotSpot.predictions(BatchHotSpot.run(union, "instance_id", attrs,
              HotSpot.Options(pt = d("pt", 0.8), m = i("m", 200),
                scoring = opts.getOrElse("scoring", "gps"))))
          case "robustspot" =>
            BatchRobustSpot.predictions(BatchRobustSpot.run(union, "instance_id", attrs,
              RobustSpot.Options(k = i("k", 3),
                lambdaAmplification = i("lambda-amplification", 100),
                caThreshold = d("contribution-ability-threshold", 0.0),
                confidenceThreshold = d("confidence-threshold", 0.8),
                derived = derived)))
          case other => throw new IllegalArgumentException(
            s"algorithm has no batch variant: $other")
        }
        val perCase = (System.nanoTime() - t0) / 1e9 / group.size
        group.map { l =>
          val s = Evaluation.score(preds.getOrElse(l.key, Seq.empty), l.label)
          InstanceResult(l.ref.dataset, l.ref.folder, l.ref.file,
            s.f1, s.tp, s.fp, s.fn, perCase)
        }
      }
  }

  /** The reference's CLI name for the recursive variant is accepted too. */
  private def canonicalAlgorithm(name: String): String =
    if (name == "r_adtributor") "rev_rec_adtributor" else name

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Runner <algorithm> --run-path <dir> [...]")
    val algorithm = canonicalAlgorithm(args(0))
    // --flag value pairs; a bare --flag (e.g. --debug) reads as "true"
    val opts = {
      val m = collection.mutable.Map.empty[String, String]
      var i = 1
      while (i < args.length) {
        require(args(i).startsWith("--"), s"expected --flag, got ${args(i)}")
        val k = args(i).drop(2)
        if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
          m(k) = args(i + 1); i += 2
        } else { m(k) = "true"; i += 1 }
      }
      m.toMap
    }
    val dataRoot = opts.getOrElse("data-root", "data")
    val runPath = opts.getOrElse("run-path", "")
    val nThreads = opts.getOrElse("n-threads", "10").toInt
    val derivedFlag = opts.get("derived").map(_.toBoolean)
    val out = opts.getOrElse("out", "results")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.core.Sessions.local(cpus, cpus, s"graft-run-$algorithm")
    spark.sparkContext.setLocalProperty("spark.scheduler.mode", "FAIR")

    val refs = InstanceSource.instances(dataRoot, runPath)
    require(refs.nonEmpty, s"no instances under $dataRoot/$runPath")

    val results =
      if (opts.get("batch").exists(_.toBoolean) && algorithm != "rev_rec_adtributor")
        runBatch(spark, dataRoot, refs, algorithm, derivedFlag, opts)
      else runAll(spark, dataRoot, refs, algorithm, derivedFlag, nThreads, opts)

    import spark.implicits._
    val all = results.toDF().orderBy("dataset", "folder", "file")
    val summary = summarize(spark, results)
    summary.show(1000, truncate = false)
    InstanceSource.writeCsv(all, s"$out/$algorithm-all")
    InstanceSource.writeCsv(summary, s"$out/$algorithm-summary")
    spark.stop()
  }
}
