package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed H-shape corpus builder. The reference's H dataset
  * (README.md:119-122: `generate_dataset.py --num 100 --dims 10 5 250 20
  * 8 12` — 100 files x 24M leaf rows) is the scale point where the
  * whole-corpus Batch* DAGs earn their keep. [[ReferenceCorpus]]
  * replicates that generator bit-for-bit but builds each file on the
  * driver — right for S/L-size parity goldens, hopeless for 24M-row
  * instances. This builder produces an H-SHAPED instance (same attribute
  * lattice and anomaly mechanics, simplified noise model) as pure column
  * algebra over `spark.range`: fully distributed, deterministic in
  * (instance, seed) — re-evaluating the plan reproduces identical values,
  * so no persist is needed for stability — and no leaf row ever touches
  * the driver. It feeds the H-scale rehearsal (runner.HScale →
  * H_SCALE.md), which checks execution SHAPE — batch == sequential,
  * bounded job count, flat driver heap — not reference parity
  * (GenCorpusSpec pins that at S size).
  */
object HCorpus {

  /** The reference H invocation's dims (attribute name -> cardinality). */
  val HDims: Seq[(String, Int)] =
    Seq("a" -> 10, "b" -> 5, "c" -> 250, "d" -> 20, "e" -> 8, "f" -> 12)

  final case class Anomaly(element: Seq[(String, String)], severity: Double)

  /** One H-shaped instance: the full cartesian product of `dims` in
    * itertools.product order (last dim fastest), Weibull-ish `real`,
    * noisy `predict`, anomalies injected direction-0 style (reset the
    * noise on the scaled side, then scale, clamp at 0 —
    * generate_dataset.py:184-188,266-280). */
  def instance(spark: SparkSession, instanceId: String,
      dims: Seq[(String, Int)] = HDims, anomalies: Seq[Anomaly] = Seq.empty,
      zeroRate: Double = 0.1, noise: Double = 0.1, seed: Long = 7L): DataFrame = {
    val n = dims.map(_._2.toLong).product
    val strides = dims.map(_._2.toLong).scanRight(1L)(_ * _).tail
    // uniform in (0,1), deterministic per (leaf, salt, instance, seed)
    def u(salt: Int) =
      (pmod(xxhash64(col("id"), lit(instanceId), lit(salt), lit(seed)),
        lit(1L << 40)).cast("double") + 0.5) / (1L << 40).toDouble
    var df = spark.range(n).toDF()
    dims.zipWithIndex.foreach { case ((name, card), i) =>
      // floor division: `/` on longs is DOUBLE division in Spark SQL — the
      // un-floored version produced fractional element labels ("a1.0166..")
      // that made every leaf its own pseudo-element and missed the anomaly
      // masks entirely (causes=0 in the r7 rehearsal)
      df = df.withColumn(name,
        concat(lit(name),
          ((floor(col("id") / strides(i)) % card) + 1).cast("long").cast("string")))
    }
    val alpha = 0.75 // inverse-CDF Weibull draw, like the reference's rng.weibull
    val real0 = when(u(1) < zeroRate, 0.0)
      .otherwise(pow(-log(lit(1.0) - u(2)), 1.0 / alpha) * 100.0)
    // +2% systematic over-forecast: the reference aligns each file's anomaly
    // direction with the normal data's global error direction
    // (generate_dataset.py:269-272 — direction 0 iff predict.sum >= real.sum,
    // and only then scales `real` down). A deterministic bias keeps this
    // builder pure column algebra while guaranteeing direction 0 is the
    // correct choice for every instance; without it the anomaly can FIGHT a
    // noise-dominated global direction and the EP denominator collapses.
    df = df.withColumn("real", real0)
      .withColumn("predict",
        col("real") * (lit(1.02) + (u(3) - 0.5) * 2.0 * noise))
    anomalies.foreach { a =>
      val mask = a.element.map { case (k, v) => col(k) === v }.reduce(_ && _)
      df = df.withColumn("real",
        when(mask, greatest(col("predict") * (1.0 - a.severity), lit(0.0)))
          .otherwise(col("real")))
    }
    df.select((lit(instanceId).as("instance_id") +: dims.map(d => col(d._1))) ++
      Seq(col("real"), col("predict")): _*)
  }

  /** Instance i's injected anomaly (rotating through layer-1/2/3 elements
    * so batch iterations differ per instance — the realistic whole-corpus
    * input). */
  def anomalyFor(i: Int, dims: Seq[(String, Int)] = HDims): Anomaly =
    (i % 3) match {
      case 0 => Anomaly(Seq(dims(0)._1 -> s"${dims(0)._1}${i % dims(0)._2 + 1}"), 0.8)
      case 1 => Anomaly(Seq(
        dims(0)._1 -> s"${dims(0)._1}${i % dims(0)._2 + 1}",
        dims(1)._1 -> s"${dims(1)._1}${i % dims(1)._2 + 1}"), 0.85)
      case _ => Anomaly(Seq(
        dims(1)._1 -> s"${dims(1)._1}${i % dims(1)._2 + 1}",
        dims(3)._1 -> s"${dims(3)._1}${i % dims(3)._2 + 1}"), 0.9)
    }

  /** N instances unioned under instance_id, each with its own anomaly. */
  def corpus(spark: SparkSession, numInstances: Int,
      dims: Seq[(String, Int)] = HDims, seed: Long = 7L): DataFrame =
    (0 until numInstances).map { i =>
      instance(spark, f"h$i%03d", dims, Seq(anomalyFor(i, dims)), seed = seed + i)
    }.reduce(_ unionByName _)

  /** Ground-truth labels for [[corpus]]'s injected anomalies, in the
    * evaluation's canonical `attr=value&attr=value` element form. */
  def labels(numInstances: Int, dims: Seq[(String, Int)] = HDims): Map[String, String] =
    (0 until numInstances).map { i =>
      f"h$i%03d" -> anomalyFor(i, dims).element
        .map { case (k, v) => s"$k=$v" }.sorted.mkString("&")
    }.toMap
}
