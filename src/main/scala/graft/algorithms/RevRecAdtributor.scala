package graft.algorithms

import graft.model.Labels
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reverse + recursive Adtributor (reference
  * algorithms/rev_rec_adtributor.py): per dimension, take ALL elements
  * passing the EP threshold (if a strict subset), then recurse into each
  * element's sub-snapshot over the remaining dimensions, multiplying
  * explanatory powers. Driver-controlled recursion over distributed
  * sub-frames — each level is one grouping-sets aggregation.
  */
object RevRecAdtributor {

  final case class Options(teep: Double = 0.2, k: Int = 3, derived: Boolean = false)

  final case class Candidate(
      elements: Seq[Seq[(String, String)]], // each element: (dim, value) pairs
      cuboid: Seq[String],
      explanatoryPower: Double,
      surprise: Double)

  /** rev_adtributor: per-dimension full candidate sets (reference :16-35). */
  private def revAdtributor(df: DataFrame, dims: Seq[String], opt: Options): Seq[Candidate] = {
    val scored = Adtributor.scoredElements(df, dims, opt.derived)
    val perDim = scored
      .groupBy("dimension")
      .agg(
        sort_array(collect_list(when(col("ep") > opt.teep, col("element")))).as("cands"),
        sum(when(col("ep") > opt.teep, col("ep"))).as("ep_sum"),
        sum(when(col("ep") > opt.teep, col("surprise"))).as("surprise_sum"),
        count(lit(1)).as("n_total"),
        count(when(col("ep") > opt.teep, lit(1))).as("n_cand"))
      .collect()
    val byDim = perDim.flatMap { r =>
      val dim = r.getString(0)
      val cands = r.getSeq[String](1)
      val (nTotal, nCand) = (r.getLong(4), r.getLong(5))
      if (nCand > 0 && nCand < nTotal)
        Some(dim -> Candidate(cands.map(e => Seq(dim -> e)), Seq(dim), r.getDouble(2), r.getDouble(3)))
      else None
    }.toMap
    dims.flatMap(byDim.get).sortBy(c => -c.surprise).take(opt.k)
  }

  /** Full recursive drill-down (reference :38-74). */
  def run(df: DataFrame, dims: Seq[String], opt: Options = Options()): Seq[Candidate] = {
    val explanatory = revAdtributor(df, dims, opt)

    val expanded = explanatory.flatMap { cand =>
      val dim = cand.cuboid.head
      val remaining = dims.filterNot(_ == dim)
      if (remaining.isEmpty) Seq(cand)
      else {
        // Recurse per candidate element; abandon the deep expansion if ANY
        // element yields no deeper explanatory set (reference :56-63).
        val perElement = cand.elements.map { elem =>
          val value = elem.head._2
          val sub = df.filter(col(dim) === value)
          run(sub, remaining, opt).map { es =>
            es.copy(
              elements = es.elements.map(e => (e ++ elem).sortBy(_._1)),
              cuboid = (es.cuboid :+ dim).sorted,
              explanatoryPower = es.explanatoryPower * cand.explanatoryPower)
          }
        }
        if (perElement.exists(_.isEmpty)) Seq(cand)
        else perElement.flatten
      }
    }

    // Dedup by flattened element key, first occurrence wins (reference :6-12).
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, Candidate]
    expanded.foreach { c =>
      val key = c.elements.map(_.map(_._2).mkString("")).mkString("")
      if (!seen.contains(key)) seen(key) = c
    }
    seen.values.toSeq
  }

  /** Canonical prediction strings, one per element. */
  def predictions(candidates: Seq[Candidate]): Seq[String] =
    Labels.canonicalPredictions(
      candidates.flatMap(_.elements.map(_.map { case (d, v) => s"$d=$v" }.mkString("&"))))
}
