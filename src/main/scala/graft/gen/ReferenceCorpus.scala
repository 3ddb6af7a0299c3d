package graft.gen

import java.nio.file.{Files, Paths}
import scala.collection.mutable
import scala.util.Random

/** Full-featured corpus generator replicating the reference's
  * generate_dataset.py end to end — the features the plain Spark-native
  * DatasetGenerator omits:
  *
  *  - real/predict SWAP for equal error distribution on both sides
  *    (generate_dataset.py:253-258): each row flips its pair with p=1/2,
  *    then negative predicts clamp to 0;
  *  - anomaly placement constraints with recursive retry (:99-162): no
  *    reuse of a non-leaf cuboid's dimension set, no element overlap with
  *    earlier anomalies on shared dimensions, no zero-real leaf anomalies
  *    in the lowest layer, uniqueness of the drawn elements;
  *  - direction selection by the aggregate error sign (:266-280): the
  *    anomaly scales `real` or `predict` depending on which total is
  *    larger, resetting the noise on the scaled side first;
  *  - per-row severity draws N(severity, deviation) in row order (:184-188);
  *  - injection_info.csv metadata incl. anomaly_significance (:203-229).
  *
  * Determinism: a single seeded java.util.Random drives every draw, so a
  * (seed, dims, num) triple regenerates the identical corpus on any JVM.
  * The parity golden (fixtures/gen_corpus_golden.tsv) is built by running
  * the REFERENCE implementation over these exact files
  * (tools/make_gen_golden.py), so engine-vs-reference F1 equality is
  * checked on generator output — the reference's own reproduction path.
  */
object ReferenceCorpus {

  final case class FileSpec(name: String, labels: String, rows: Array[Row])
  final case class Row(values: Array[Int], var real: Double, var predict: Double)

  final case class Config(
      dims: Seq[(String, Int)],
      numFiles: Int,
      seed: Long,
      weibullAlpha: (Double, Double) = (0.5, 1.0),
      zeroRate: (Double, Double) = (0.0, 0.25),
      noiseLevel: (Double, Double) = (0.0, 0.25),
      anomalySeverity: (Double, Double) = (0.2, 1.0),
      anomalyDeviation: (Double, Double) = (0.0, 0.1),
      numAnomaly: (Int, Int) = (1, 3),
      numAnomalyElements: (Int, Int) = (1, 3),
      onlyLastLayer: Boolean = false)

  private final case class AnomalyProps(level: Int, elements: Int, severity: Double, deviation: Double)
  private final case class Placed(dims: Seq[Int], cuboids: Seq[Seq[Int]]) // dim indices + element values

  def uniform(rng: Random, lo: Double, hi: Double): Double = lo + (hi - lo) * rng.nextDouble()
  def randint(rng: Random, lo: Int, hi: Int): Int = lo + rng.nextInt(hi - lo + 1) // inclusive

  /** rng.choice(seq, k, replace=False) via partial Fisher-Yates. */
  private def choiceNoReplace[A](rng: Random, xs: Seq[A], k: Int): Seq[A] = {
    val a = xs.toBuffer
    (0 until k).map { i =>
      val j = i + rng.nextInt(a.length - i)
      val t = a(i); a(i) = a(j); a(j) = t
      a(i)
    }
  }

  def generateFile(cfg: Config, rng: Random): (Array[Row], String, Map[String, String]) = {
    val dims = cfg.dims
    val nDims = dims.length
    val zeroRate = uniform(rng, cfg.zeroRate._1, cfg.zeroRate._2)
    val noise = uniform(rng, cfg.noiseLevel._1, cfg.noiseLevel._2)
    val numAnomalies = randint(rng, cfg.numAnomaly._1, cfg.numAnomaly._2)
    val props = (0 until numAnomalies).map { _ =>
      val level = if (cfg.onlyLastLayer) nDims else randint(rng, 1, nDims)
      val elements = randint(rng, cfg.numAnomalyElements._1, cfg.numAnomalyElements._2)
      val severity = uniform(rng, cfg.anomalySeverity._1, cfg.anomalySeverity._2) + noise
      val deviation = uniform(rng, cfg.anomalyDeviation._1, cfg.anomalyDeviation._2)
      AnomalyProps(level, elements, severity, deviation)
    }

    // full cartesian product in itertools.product order (last dim fastest)
    val n = dims.map(_._2).product
    val rows = new Array[Row](n)
    var i = 0
    while (i < n) {
      val values = new Array[Int](nDims)
      var rem = i
      var d = nDims - 1
      while (d >= 0) {
        values(d) = rem % dims(d)._2 + 1 // values are 1-based
        rem /= dims(d)._2
        d -= 1
      }
      rows(i) = Row(values, 0.0, 0.0)
      i += 1
    }

    // real ~ weibull(alpha) * 100; zero rows; predict = real * (1 + N(0, noise))
    val alpha = uniform(rng, cfg.weibullAlpha._1, cfg.weibullAlpha._2)
    rows.foreach(r => r.real = math.pow(-math.log(1.0 - rng.nextDouble()), 1.0 / alpha) * 100.0)
    rows.foreach(r => if (!(rng.nextDouble() > zeroRate)) r.real = 0.0)
    rows.foreach(r => r.predict = r.real + r.real * (rng.nextGaussian() * noise))

    // swap predict/real with p=1/2 per row; clamp negative predicts
    rows.foreach { r =>
      if (rng.nextInt(2) == 1) { val t = r.real; r.real = r.predict; r.predict = t }
      if (r.predict < 0) r.predict = 0.0
    }

    // anomaly placement with the reference's constraints + retries
    def rowFor(dimIdx: Seq[Int], values: Seq[Int]): Row = {
      // unique leaf lookup only valid in the lowest layer (all dims bound)
      val idx = dimIdx.zip(values).sortBy(_._1)
      var pos = 0
      idx.foreach { case (d, v) => pos = pos * dims(d)._2 + (v - 1) }
      rows(pos)
    }

    // one placement ATTEMPT; None = retry (rng draws consumed, like the
    // reference's recursive call — generate_dataset.py:100-153)
    def placeOnce(level: Int, elements: Int, current: Seq[Placed]): Option[Placed] = {
      val anomalyDims = choiceNoReplace(rng, 0 until nDims, level).sorted
      val lowest = level == nDims
      if (current.exists(_.dims == anomalyDims) && !lowest)
        return None
      val perDim = anomalyDims.map { d =>
        var dimElements = (1 to dims(d)._2).toSet
        for (ca <- current if ca.dims.contains(d)) {
          val idx = ca.dims.indexOf(d)
          dimElements --= ca.cuboids.map(_(idx)).toSet
        }
        if (dimElements.isEmpty) return None
        val sortedEls = dimElements.toSeq.sorted
        (0 until elements).map(_ => sortedEls(rng.nextInt(sortedEls.length)))
      }
      val cuboids = (0 until elements).map(e => anomalyDims.indices.map(d => perDim(d)(e)))
      if (lowest && cuboids.exists(c => rowFor(anomalyDims, c).real == 0))
        return None
      if (cuboids.distinct.length < elements)
        return None
      Some(Placed(anomalyDims, cuboids))
    }

    // retry LOOP, not recursion: the reference retries by re-calling itself
    // (same rng stream), which our replica preserves exactly; a loop avoids
    // overflowing the stack before the retry limit on unsatisfiable draws
    def place(level: Int, elements: Int, current: Seq[Placed], depth0: Int): Placed = {
      var depth = depth0
      while (depth <= 1000) {
        placeOnce(level, elements, current) match {
          case Some(p) => return p
          case None => depth += 1
        }
      }
      throw new IllegalStateException("anomaly placement retry limit")
    }

    val placed = mutable.ArrayBuffer.empty[Placed]
    props.foreach(p => placed += place(p.level, p.elements, placed.toSeq, 0))

    def maskOf(a: Placed): Array[Boolean] =
      rows.map(r => a.cuboids.exists(c => a.dims.indices.forall(i => r.values(a.dims(i)) == c(i))))
    val masks = placed.map(maskOf).toSeq

    // direction: scale the side whose total is smaller (the anomaly must
    // not be drowned by the normal data's aggregate error direction)
    val direction = if (rows.map(_.real).sum > rows.map(_.predict).sum) 1 else 0
    masks.zip(props).foreach { case (mask, p) =>
      rows.indices.foreach { i =>
        if (mask(i)) {
          val r = rows(i)
          if (direction == 0) {
            r.real = r.predict // reset the noise
            val draw = p.severity + p.deviation * rng.nextGaussian()
            r.real = math.max(r.real * (1 - draw), 0.0)
          } else {
            r.predict = r.real
            val draw = p.severity + p.deviation * rng.nextGaussian()
            r.predict = math.max(r.predict * (1 - draw), 0.0)
          }
        }
      }
    }

    val labels = placed.flatMap { a =>
      a.cuboids.map(c =>
        a.dims.indices.map(i => s"${dims(a.dims(i))._1}=${dims(a.dims(i))._1}${c(i)}")
          .sorted.mkString("&"))
    }.mkString(";")

    // injection_info metadata (generate_dataset.py:203-229)
    val anyMask = rows.indices.map(i => masks.exists(_(i)))
    def sumWhere(f: Row => Double, m: Int => Boolean) =
      rows.indices.collect { case i if m(i) => f(rows(i)) }.sum
    val totalReal = rows.map(_.real).sum
    val totalPredict = rows.map(_.predict).sum
    val abnErr = sumWhere(r => math.abs(r.real - r.predict), anyMask)
    def r2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_EVEN).toString
    val meta = Map(
      "total_real_amount" -> r2(totalReal),
      "total_predict_amount" -> r2(totalPredict),
      "normal_predict_amount" -> r2(sumWhere(r => math.abs(r.predict), i => !anyMask(i))),
      "normal_predict_error" -> r2(sumWhere(r => math.abs(r.real - r.predict), i => !anyMask(i))),
      "abnormal_predict_amount" -> r2(sumWhere(r => math.abs(r.predict), anyMask)),
      "abnormal_predict_error" -> r2(abnErr),
      "anomaly_significance" -> r2(abnErr / totalPredict),
      "zero_rate" -> r2(zeroRate),
      "noise_level" -> r2(noise),
      "elements_per_anomaly" -> props.map(_.elements).mkString(";"),
      "anomaly_severity" -> props.map(p => r2(p.severity)).mkString(";"),
      "anomaly_deviation" -> props.map(p => r2(p.deviation)).mkString(";"),
      "anomaly_direction" -> direction.toString)
    (rows, labels, meta)
  }

  private val MetaCols = Seq("total_real_amount", "total_predict_amount",
    "normal_predict_amount", "normal_predict_error", "abnormal_predict_amount",
    "abnormal_predict_error", "anomaly_significance", "zero_rate", "noise_level",
    "elements_per_anomaly", "anomaly_severity", "anomaly_deviation", "anomaly_direction")

  def writeCorpus(cfg: Config, outDir: String): Seq[String] = {
    val rng = new Random(cfg.seed)
    Files.createDirectories(Paths.get(outDir))
    val used = mutable.LinkedHashMap.empty[String, (String, Map[String, String])]
    while (used.size < cfg.numFiles) {
      var name = ""
      while (name.isEmpty || used.contains(name))
        name = (100000 + rng.nextInt(900000)).toString
      // Corpus-level redraw on an unplaceable anomaly draw: the reference's
      // placement recursion has no success guarantee (small cardinalities
      // can exhaust a dimension; generate_dataset.py:99-163 would die on
      // Python's recursion limit for the same draw). A failed draw costs
      // the rng stream it consumed and the file is re-drawn fresh — file
      // streams that DO place are byte-identical to the reference's, which
      // is the property GenCorpusSpec pins.
      val generated =
        try Some(generateFile(cfg, rng))
        catch { case _: IllegalStateException => None }
      if (generated.isEmpty) {
        println(s"anomaly placement unsatisfiable for draw $name; re-drawing file")
      } else {
      val (rows, labels, meta) = generated.get
      val header = (cfg.dims.map(_._1) ++ Seq("real", "predict")).mkString(",")
      val body = rows.map(r =>
        (cfg.dims.indices.map(d => s"${cfg.dims(d)._1}${r.values(d)}") ++
          Seq(r.real.toString, r.predict.toString)).mkString(",")).mkString("\n")
      Files.write(Paths.get(outDir, s"$name.csv"), (header + "\n" + body + "\n").getBytes("UTF-8"))
      used += name -> (labels, meta)
      // injection_info.csv rewritten per file, like the reference
      val info = new StringBuilder("timestamp,set," + MetaCols.mkString(",") + "\n")
      used.foreach { case (nm, (lb, mt)) =>
        // labels contain ';'/'&' but never ',' — pandas to_csv leaves them
        // unquoted, and the reference's readers expect that
        info ++= (Seq(nm, lb) ++ MetaCols.map(mt)).mkString(",") + "\n"
      }
      Files.write(Paths.get(outDir, "injection_info.csv"), info.toString.getBytes("UTF-8"))
      }
    }
    used.keys.toSeq
  }

  /** CLI: GenCorpus <outDir> <numFiles> <seed> <dims like a6,b5,c4,d3> */
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val num = args(1).toInt
    val seed = args(2).toLong
    val dims = args(3).split(',').toSeq.map { s =>
      (s.take(1), s.drop(1).toInt)
    }
    val names = writeCorpus(Config(dims, num, seed), outDir)
    println(s"wrote ${names.size} files to $outDir: ${names.mkString(", ")}")
  }
}
