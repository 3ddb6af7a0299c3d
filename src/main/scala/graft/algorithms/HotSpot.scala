package graft.algorithms

import graft.model.{Element, RootCause}
import graft.operators.Cuboids
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** HotSpot (Sun et al., IEEE Access'18) — MCTS search over element subsets
  * per cuboid, ripple-based potential scores. Reference behavior:
  * algorithms/hotspot.py.
  *
  * Spark-first design: both scoring functions decompose over the disjoint
  * per-element leaf sets — the ripple ratio of an element depends only on
  * that element's own (Σv, Σf), so every term of ps/gps is a sum of
  * per-element constants:
  *   gps(S) = 1 - (a+c)/(b+c)  with  a = Σ_e aErr_e / Σ_e n_e,
  *            b = Σ_e |v-f|_e / Σ_e n_e, c from the global totals;
  *   ps(S)  = max(0, 1 - sqrt(Σtot sq - Σ_e sq_e + Σ_e aSq_e)/sqrt(Σtot sq)).
  * So each layer runs ONE multi-cuboid aggregation plus ONE ratio pass
  * (same two-pass shape as RiskLoc), and the inherently sequential MCTS
  * (hotspot.py:172-200) runs on the driver over per-element summaries only —
  * no leaf vector ever leaves the executors, which is what survives 100 TB.
  * The reference's unseeded random.random() (hotspot.py:125) becomes an
  * explicit seed.
  */
object HotSpot {

  final case class Options(
      pt: Double = 0.8,
      m: Int = 200,
      scoring: String = "gps", // 'ps' | 'gps'
      seed: Long = 42L,
      /** Driver-collect guard absent from the reference (it enumerates every
        * element): cuboids with more distinct elements keep only the
        * highest-|v-f| ones. Defaulted far above test-scale cardinalities. */
      maxElementsPerCuboid: Int = 100000)

  final case class Candidate(layer: Int, cuboid: Seq[String], score: Double,
      elements: Seq[Seq[String]]) {
    def toRootCause: RootCause = RootCause(
      elements.map(vs => Element(cuboid, vs)), cuboid, layer, Map("score" -> score))
  }

  /** Per-element decomposed statistics (v = real, f = predict, a = ripple
    * forecast f·Σv/Σf): n, Σv, Σf, Σ|v-f|, Σ(v-f)², Σ|v-a| with numpy
    * nan_to_num semantics (gps, hotspot.py:45-48), Σ(v-a)² with a=0 when
    * Σf=0 (ps ripple, hotspot.py:21-22). */
  private[algorithms] final case class ElemStats(values: Seq[String], n: Long, sumV: Double,
      sumF: Double, absDiff: Double, sqDiff: Double, gpsAErr: Double, psASqErr: Double)

  private[algorithms] final case class Totals(n: Long, absDiff: Double, sqDiff: Double)

  // ---------------------------------------------------------------- scoring

  private[algorithms] def gpsScore(sel: Seq[ElemStats], t: Totals): Double = {
    val selN = sel.map(_.n).sum
    val a = sel.map(_.gpsAErr).sum / selN
    val b = sel.map(_.absDiff).sum / selN
    val restN = t.n - selN
    val c = if (restN > 0) (t.absDiff - sel.map(_.absDiff).sum) / restN else 0.0
    1.0 - (a + c) / (b + c)
  }

  private[algorithms] def psScore(sel: Seq[ElemStats], t: Totals): Double = {
    val distVA = math.sqrt(t.sqDiff - sel.map(_.sqDiff).sum + sel.map(_.psASqErr).sum)
    math.max(1.0 - distVA / math.sqrt(t.sqDiff), 0.0)
  }

  private def score(sel: Seq[ElemStats], t: Totals, scoring: String): Double =
    if (scoring == "ps") psScore(sel, t) else gpsScore(sel, t)

  // ------------------------------------------------------------------- MCTS

  private final class Node(val state: List[Int], val parent: Node) {
    var children: Array[Node] = _
    var fullyExpanded = false
    var q = 0.0
    var n = 0
  }

  /** UCB1 with C=√2 over visited, not-fully-expanded children
    * (hotspot.py:74-85). */
  private def ucb(node: Node): Node = {
    val c = math.sqrt(2.0)
    var best: Node = null
    var maxScore = -1.0
    for (child <- node.children if child.n > 0 && !child.fullyExpanded) {
      val s = child.q + c * math.sqrt(math.log(node.n) / child.n)
      if (s > maxScore) { best = child; maxScore = s }
    }
    best
  }

  private def initChildren(node: Node, nElements: Int): Unit = {
    val inState = node.state.toSet
    node.children = (0 until nElements).filterNot(inState)
      .map(e => new Node(e :: node.state, node)).toArray
  }

  /** Tree-policy descent (hotspot.py:112-141). */
  private def selection(root: Node, nElements: Int, rng: scala.util.Random): Node = {
    var node = root
    while (node.state.length < nElements) {
      if (node.children == null) { initChildren(node, nElements); return node }
      var qMax = 0.0
      var allVisit = true
      for (child <- node.children) {
        qMax = math.max(qMax, child.q)
        if (child.n == 0) allVisit = false
      }
      if (!allVisit && rng.nextDouble() > qMax) return node
      val child = ucb(node)
      if (child == null) {
        if (allVisit) {
          node.fullyExpanded = true
          if (node.parent == null) return node
          node = node.parent
        } else return node
      } else node = child
    }
    node.fullyExpanded = true
    node
  }

  /** Best unvisited child by single-element score (hotspot.py:144-153). */
  private def expand(node: Node, elementScores: Array[Double]): Node = {
    var best: Node = null
    var maxScore = -1.0
    for (child <- node.children if child.n == 0) {
      val s = elementScores(child.state.head)
      if (s > maxScore) { best = child; maxScore = s }
    }
    best
  }

  private def backup(node0: Node, newQ: Double): Unit = {
    var node = node0
    while (node != null) { node.n += 1; node.q = math.max(node.q, newQ); node = node.parent }
  }

  /** Seeded MCTS over one cuboid's elements (hotspot.py:172-200). Returns
    * (selected element indices, max q). */
  private[algorithms] def mcts(elems: Array[ElemStats], t: Totals, pt: Double,
      m: Int, scoring: String, rng: scala.util.Random): (List[Int], Double) = {
    val root = new Node(Nil, null)
    var maxQ = -1.0
    var bestState: List[Int] = Nil
    val elementScores = Array.tabulate(elems.length)(i => score(Seq(elems(i)), t, scoring))

    var i = 0
    var break = false
    while (i < m && !break) {
      var node = selection(root, elems.length, rng)
      if (!node.fullyExpanded) node = expand(node, elementScores)
      if (root.fullyExpanded) break = true
      else {
        val newQ = score(node.state.map(elems), t, scoring)
        backup(node, newQ)
        if (newQ > maxQ) { maxQ = root.q; bestState = node.state }
        else if (newQ == maxQ && !node.state.toSet.subsetOf(bestState.toSet)
            && node.state.length < bestState.length) {
          maxQ = root.q; bestState = node.state
        }
        if (maxQ >= pt) break = true
      }
      i += 1
    }
    (bestState.reverse, maxQ)
  }

  /** Keep only elements that strictly contain some element of a layer-(l-1)
    * candidate whose cuboid is a strict subset (hotspot.py:203-209). */
  private[algorithms] def hierarchicalPruning(elems: Array[ElemStats], layer: Int,
      cuboid: Seq[String], candidates: Seq[Candidate]): Array[ElemStats] = {
    val parentSelections = candidates
      .filter(c => c.layer == layer - 1 && c.cuboid.toSet.subsetOf(cuboid.toSet)
        && c.cuboid.toSet != cuboid.toSet)
      .map(_.elements)
    var kept = elems
    for (parent <- parentSelections) {
      val parentSets = parent.map(_.toSet)
      kept = kept.filter(e => parentSets.exists(pe =>
        pe.subsetOf(e.values.toSet) && pe != e.values.toSet))
    }
    kept
  }

  // -------------------------------------------------------------------- run

  def run(df0: DataFrame, attributes: Seq[String], opt: Options = Options()): Candidate = {
    require(opt.scoring == "ps" || opt.scoring == "gps", "scoring must be 'ps' or 'gps'")
    val usePruning = opt.scoring != "gps"
    val df = df0.persist(StorageLevel.MEMORY_AND_DISK)

    // nan_to_num: NaN -> 0, ±Inf -> ±DBL_MAX (numpy semantics)
    def nanToNum(c: org.apache.spark.sql.Column) =
      when(isnan(c), 0.0)
        .when(c === Double.PositiveInfinity, Double.MaxValue)
        .when(c === Double.NegativeInfinity, Double.MinValue)
        .otherwise(c)

    /** One layer's per-element decomposed stats (two-pass DAG, one
      * action). Not persisted between layers — see the explode note. */
    def layerStats(layer: Int): (Seq[Seq[String]], Array[Row]) = {
      val cuboids = attributes.combinations(layer).toSeq
      // NOT persisted: the explode is a narrow projection of a cached
      // parent multiplied by the cuboid count; caching that blowup spills
      // at H scale (block-manager eviction lock pileup, VERDICT r7) while
      // recomputing it per consuming pass is map-side CPU only.
      val exploded = Cuboids.expand(df, cuboids)

      val stats1 = exploded
        .groupBy(col("cb.cid").as("cid"), col("cb.key").as("key"))
        .agg(
          count(lit(1)).as("n"),
          sum("real").as("sum_v"), sum("predict").as("sum_f"),
          sum(abs(col("real") - col("predict"))).as("abs_diff"),
          sum(pow(col("real") - col("predict"), 2.0)).as("sq_diff"))
        .persist(StorageLevel.MEMORY_AND_DISK)

      // second pass: ripple-forecast error terms per element
      val ratios = stats1.select(col("cid").as("rcid"), col("key").as("rkey"),
        graft.functions.Scores.numpyDiv(col("sum_v"), col("sum_f")).as("ratio"),
        col("sum_f").as("rsum_f"))
      val stats2 = exploded
        .join(broadcast(ratios),
          col("cb.cid") === col("rcid") && col("cb.key") === col("rkey"))
        .withColumn("a_gps", nanToNum(col("predict") * col("ratio")))
        .withColumn("a_ps", when(col("rsum_f") === 0.0, 0.0).otherwise(col("predict") * col("ratio")))
        .groupBy(col("rcid").as("cid"), col("rkey").as("key"))
        .agg(
          sum(abs(col("real") - col("a_gps"))).as("gps_a_err"),
          sum(pow(col("real") - col("a_ps"), 2.0)).as("ps_a_sq_err"))

      val collected = stats1.join(stats2, Seq("cid", "key")).collect()
      stats1.unpersist()
      (cuboids, collected)
    }

    // Totals run FIRST, serially: under the bench's clearCache isolation
    // the input cache is COLD here, and two concurrent first actions
    // each compute the whole cached lineage (per-partition block-write
    // races), duplicating the snapshot aggregation — worse than the one
    // scheduler round-trip an overlap would save (measured round 13; the
    // overlap idea stays in Squeeze/BatchSqueeze where the cache is
    // already materialized when the background action starts).
    val Row(tn: Long, tAbs: Double, tSq: Double) = df.agg(
      count(lit(1)),
      sum(abs(col("real") - col("predict"))),
      sum(pow(col("real") - col("predict"), 2.0))).collect()(0)
    val totals = Totals(tn, tAbs, tSq)

    val rng = new scala.util.Random(opt.seed)
    val candidates = collection.mutable.ArrayBuffer.empty[Candidate]

    for (layer <- 1 to attributes.size) {
      val (cuboids, collected) = layerStats(layer)

      val byCid = collected.groupBy(_.getInt(0))
      for ((cuboid, cid) <- cuboids.zipWithIndex) {
        var elems = byCid.getOrElse(cid, Array.empty[Row])
          .map(r => ElemStats(r.getSeq[String](1), r.getLong(2), r.getDouble(3),
            r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getDouble(8)))
          .sortBy(_.values.mkString(graft.core.Canonical.NulSep)) // deterministic MCTS child order
        if (elems.length > opt.maxElementsPerCuboid)
          elems = elems.sortBy(-_.absDiff).take(opt.maxElementsPerCuboid)
            .sortBy(_.values.mkString(graft.core.Canonical.NulSep))
        if (usePruning && layer > 1)
          elems = hierarchicalPruning(elems, layer, cuboid, candidates.toSeq)

        val (stateIdx, q) = mcts(elems, totals, opt.pt, opt.m, opt.scoring, rng)
        val cand = Candidate(layer, cuboid, q, stateIdx.map(i => elems(i).values))
        if (cand.score >= opt.pt) { df.unpersist(); return cand }
        candidates += cand
      }
    }
    df.unpersist()
    // score desc, layer asc, #elements asc (hotspot.py:212-215)
    candidates.minBy(c => (-c.score, c.layer, c.elements.size))
  }

  def predictions(cand: Candidate): Seq[String] =
    graft.model.Labels.canonicalPredictions(cand.toRootCause.labels)
}
