package graft.sources

import graft.operators.Snapshots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}
import java.io.File

/** Instance enumeration and snapshot IO (reference utils/run_utils.py:
  * read_dataframe / get_label / get_instances). Three input variants:
  * fundamental CSV, derived `.a`/`.b` CSV pair, RobustSpot raw series
  * ([[RsSource]]). */
object InstanceSource {

  /** One runnable instance file. `file` is the basename without extension
    * (a timestamp for synthetic sets, a case name for RS). */
  final case class InstanceRef(dataset: String, folder: String, file: String) {
    def dir(root: String): String =
      if (folder.isEmpty) s"$root/$dataset" else s"$root/$dataset/$folder"
  }

  /** Recursive walker: leaf directories contribute their files, label
    * files excluded, derived `.a`/`.b` pairs deduplicated by basename
    * (run_utils.py:110-139). */
  def instances(root: String, directory: String): Seq[InstanceRef] = {
    def walk(dir: File, dataset: String, folder: String): Seq[InstanceRef] = {
      val entries = Option(dir.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      val subdirs = entries.filter(_.isDirectory)
      if (subdirs.nonEmpty)
        subdirs.flatMap(sd => walk(sd,
          if (dataset.isEmpty) sd.getName else dataset,
          if (dataset.isEmpty) folder
          else if (folder.isEmpty) sd.getName else s"$folder/${sd.getName}"))
      else entries
        .filter(f => f.isFile &&
          f.getName != "injection_info.csv" && f.getName != "anomaly.yaml")
        .map(f => InstanceRef(dataset, folder, f.getName.split("\\.")(0)))
        .distinct
    }
    val start = new File(s"$root/$directory")
    if (directory.isEmpty) walk(start, "", "")
    else {
      val parts = directory.split("/").toSeq
      walk(start, parts.head, parts.tail.mkString("/"))
    }
  }

  /** Schema-dynamic snapshot read: every non-measure column is a string
    * attribute, measures are doubles (the reference relies on pandas
    * inference; we make the contract explicit).
    *
    * Measures decode through [[graft.functions.PandasDouble]] — pandas'
    * `precise_xstrtod` is NOT correctly rounded, and the reference's
    * threshold comparisons (e.g. riskloc risk >= 0.5 exactly) sit on the
    * 1-ULP parse differences for 16-17-digit values, so a plain
    * DoubleType cast (Java correctly-rounded parse) reads a DIFFERENT
    * snapshot than the reference does. Columns are read as strings (no
    * inferSchema) so the original digits reach the decoder. */
  def readSnapshot(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("header", "true").csv(path)
    val measures = Set("real", "predict", "real_a", "predict_a", "real_b", "predict_b")
    raw.schema.fieldNames.foldLeft(raw) { (df, c) =>
      if (measures(c)) df.withColumn(c, graft.functions.PandasDouble.pandasDouble(col(c)))
      else df.withColumn(c, col(c).cast(StringType))
    }
  }

  /** Derived pair: `<file>.a.csv` + `<file>.b.csv`, inner-joined on all
    * attributes, ratio KPIs with 0/0 -> 0 (run_utils.py:74-85). */
  def readDerived(spark: SparkSession, dir: String, file: String): DataFrame =
    Snapshots.mergeDerived(
      readSnapshot(spark, s"$dir/$file.a.csv"),
      readSnapshot(spark, s"$dir/$file.b.csv"))

  def readFundamental(spark: SparkSession, dir: String, file: String): DataFrame =
    readSnapshot(spark, s"$dir/$file.csv")

  /** Ground-truth lookup from `injection_info.csv` (run_utils.py:94-107).
    * Driver-side: label files are tiny. */
  def injectionLabel(dir: String, file: String): String = {
    val src = scala.io.Source.fromFile(s"$dir/injection_info.csv")
    try {
      val lines = src.getLines().toSeq
      val header = lines.head.split(",", -1).toSeq
      val tsIdx = header.indexOf("timestamp")
      val setIdx = header.indexOf("set")
      lines.tail
        .map(_.split(",", -1))
        .find(_(tsIdx) == file)
        .map(_(setIdx).stripPrefix("\"").stripSuffix("\"")) // CSV-quoted label
        .getOrElse(throw new NoSuchElementException(s"no label for $file in $dir"))
    } finally src.close()
  }

  /** Result sink: one headered CSV (run_utils.py:164-165). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
}
