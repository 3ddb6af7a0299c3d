package graft.sources

import scala.jdk.CollectionConverters._

/** RobustSpot ground-truth labels from `anomaly.yaml` (reference
  * utils/robustspot_data_utils.py:69-99): a list of
  * `{data, timestamp, cause: {attr: value, ...}}` entries. Parsed with
  * snakeyaml (bundled with Spark); driver-side — label files are tiny. */
object RsLabels {

  final case class RsAnomaly(data: String, timestamp: Long, cause: Seq[Map[String, String]]) {
    /** Canonical label string: `attr=value&...` per cause, `;`-joined
      * (robustspot_data_utils.py:82-99). */
    def label: String =
      cause.map(_.map { case (k, v) => s"$k=$v" }.mkString("&")).mkString(";")
  }

  def parse(yamlText: String): Seq[RsAnomaly] = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val root = yaml.load[java.util.List[java.util.Map[String, Object]]](yamlText)
    root.asScala.toSeq.map { m =>
      val causeObj = m.get("cause")
      val causes: Seq[Map[String, String]] = causeObj match {
        case l: java.util.List[_] =>
          l.asScala.toSeq.map(c =>
            c.asInstanceOf[java.util.Map[String, Object]].asScala
              .map { case (k, v) => k.toString -> v.toString }.toMap)
        case c: java.util.Map[_, _] =>
          Seq(c.asScala.map { case (k, v) => k.toString -> v.toString }.toMap)
        case other => throw new IllegalArgumentException(s"unexpected cause: $other")
      }
      RsAnomaly(m.get("data").toString, m.get("timestamp").toString.toLong, causes)
    }
  }

  def load(path: String): Seq[RsAnomaly] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parse(src.mkString) finally src.close()
  }

  def labelFor(dir: String, file: String): RsAnomaly =
    load(s"$dir/anomaly.yaml").find(_.data == file)
      .getOrElse(throw new NoSuchElementException(s"no anomaly entry for $file"))
}
