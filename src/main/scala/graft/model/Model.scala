package graft.model

/** Core domain model for multi-dimensional root-cause localization.
  *
  * A *leaf snapshot* is a DataFrame with N string attribute columns plus
  * `real`/`predict` double measures (one row per attribute-value
  * combination). A *cuboid* is an ordered subset of the attributes; an
  * *element* is one value-tuple within a cuboid. A root cause is a set of
  * elements, serialized canonically as sorted `attr=value` pairs joined
  * with `&`, elements joined with `;` (reference utils/evaluation.py:49-60).
  */
final case class Element(pairs: Seq[(String, String)]) {
  /** Canonical `attr=val&attr=val` string, pairs sorted lexicographically. */
  def label: String = pairs.map { case (a, v) => s"$a=$v" }.sorted.mkString("&")
}

object Element {
  def apply(cuboid: Seq[String], values: Seq[String]): Element =
    Element(cuboid.zip(values))
}

/** One located root cause: a set of elements from a single cuboid plus the
  * algorithm's scores (kept generic — each algorithm fills its own keys). */
final case class RootCause(
    elements: Seq[Element],
    cuboid: Seq[String],
    layer: Int,
    scores: Map[String, Double] = Map.empty) {
  def labels: Seq[String] = elements.map(_.label)
}

object Labels {
  /** Canonicalize one element string: sort its `&`-joined pairs. */
  def canonicalElement(s: String): String = s.split("&").toSeq.sorted.mkString("&")

  /** Parse a ground-truth label (`;`-separated elements) into the unique,
    * canonical element set (reference utils/evaluation.py:12-14). */
  def parse(label: String): Seq[String] =
    label.split(";").toSeq.map(canonicalElement).distinct

  /** Unify predictions (utils/evaluation.py:57-59): np.unique dedups and
    * sorts the RAW strings first, then each is canonicalized — two raw
    * strings that canonicalize identically both survive, so the dedup
    * must happen before canonicalization to count FPs like the
    * reference. */
  def canonicalPredictions(preds: Seq[String]): Seq[String] =
    preds.distinct.sorted.map(canonicalElement)
}
