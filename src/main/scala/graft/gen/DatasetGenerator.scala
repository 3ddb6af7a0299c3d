package graft.gen

import graft.model.{Element, Labels}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded synthetic snapshot generator (reference generate_dataset.py):
  * full cartesian product of dimension values, weibull-distributed `real`,
  * gaussian-noise `predict`, anomalies injected by scaling selected
  * elements' real values. Labels are constructed by injection, making the
  * generator a property-test oracle for the localization algorithms.
  *
  * Spark-first: the leaf table is derived from `spark.range(n)` by index
  * arithmetic (no shuffle, no driver materialization — scales to any
  * cardinality product), with `rand/randn(seed)` columns and the weibull
  * drawn via inverse CDF: (-ln(1-u))^(1/alpha) * 100
  * (generate_dataset.py:35,240-249).
  */
object DatasetGenerator {

  final case class Anomaly(element: Element, severity: Double)

  final case class Config(
      dims: Seq[(String, Int)],          // (name, cardinality), values "<name>0".."<name>k"
      seed: Long = 121,
      weibullAlpha: Double = 0.5,
      noiseLevel: Double = 0.01,         // relative gaussian noise on predict
      zeroRate: Double = 0.0,            // fraction of leaves zeroed out
      anomalies: Seq[Anomaly] = Nil)

  /** Generate one snapshot DataFrame: dims..., real, predict. */
  def generate(spark: SparkSession, cfg: Config): DataFrame = {
    val n = cfg.dims.map(_._2.toLong).product
    // Mixed-radix decode of the row id into one value index per dimension.
    var df: DataFrame = spark.range(n).toDF()
    var stride = n
    cfg.dims.foreach { case (name, card) =>
      stride /= card
      df = df.withColumn(name, concat(lit(name), ((col("id") / stride).cast("long") % card).cast("string")))
    }

    val u = rand(cfg.seed)
    val weibull = pow(-log(lit(1.0) - u), lit(1.0 / cfg.weibullAlpha)) * 100.0
    df = df.withColumn("real", weibull)
    if (cfg.zeroRate > 0)
      df = df.withColumn("real", when(rand(cfg.seed + 1) < cfg.zeroRate, 0.0).otherwise(col("real")))

    // predict = real + relative gaussian noise (clipped at 0), before
    // anomaly injection — so predict keeps forecasting the normal value.
    df = df.withColumn("predict",
      greatest(col("real") * (lit(1.0) + randn(cfg.seed + 2) * cfg.noiseLevel), lit(0.0)))

    // Inject: scale real by (1 - severity) inside each anomalous element
    // (generate_dataset.py:182-188,273-280).
    cfg.anomalies.foreach { a =>
      val cond = a.element.pairs.map { case (d, v) => col(d) === v }.reduce(_ && _)
      df = df.withColumn("real", when(cond, col("real") * (1.0 - a.severity)).otherwise(col("real")))
    }

    df.drop("id")
  }

  /** Ground-truth label string for a config (generate_dataset.py:191-200). */
  def label(cfg: Config): String =
    Labels.canonicalPredictions(cfg.anomalies.map(_.element.label)).mkString(";")
}
