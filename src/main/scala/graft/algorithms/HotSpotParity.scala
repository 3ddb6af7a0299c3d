package graft.algorithms

import graft.algorithms.HotSpot.{Candidate, Options}
import graft.kernels.{MersenneTwister, NumpySum, PyHash}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Bit-exact driver replay of the reference HotSpot
  * (algorithms/hotspot.py) for PARITY VERIFICATION: given the instance
  * rows in CSV order and the reference's RNG seed, reproduces the
  * reference's candidate — elements iterate in CPython set order
  * (PYTHONHASHSEED=0, [[PyHash]]), `random.random()` is the MT19937 port
  * ([[MersenneTwister]]), and every np.sum/np.mean rounds with numpy's
  * pairwise summation ([[NumpySum]]) over the reference's concatenation
  * order.
  *
  * This is the verification path, not the scale path: it collects ONE
  * instance's leaf vectors to the driver because gps/ps scores are means
  * over arrays concatenated in selection order — bit-reproducible only
  * with the full vectors. Production corpora run [[HotSpot]] /
  * [[BatchHotSpot]], whose per-element decomposed aggregation keeps leaf
  * data on the executors (same algorithm, ULP-level score differences).
  */
object HotSpotParity {

  private def nanToNum(x: Double): Double =
    if (x.isNaN) 0.0
    else if (x == Double.PositiveInfinity) Double.MaxValue
    else if (x == Double.NegativeInfinity) Double.MinValue
    else x

  /** Run on an instance frame carrying a `__row` CSV-order column. */
  def run(df: DataFrame, attributes: Seq[String], opt: Options = Options(),
      seed: BigInt = 0): Candidate = {
    val rows = df.orderBy("__row")
      .select((attributes.map(col) ++ Seq(col("real"), col("predict"))): _*)
      .collect()
      .map(r => (attributes.indices.map(r.getString).toArray,
        r.getDouble(attributes.length), r.getDouble(attributes.length + 1)))
    runRows(rows, attributes, opt, seed)
  }

  def runRows(rows: Array[(Array[String], Double, Double)], attributes: Seq[String],
      opt: Options, seed: BigInt): Candidate = {
    require(opt.scoring == "ps" || opt.scoring == "gps")
    val usePruning = opt.scoring != "gps"
    val nRows = rows.length
    val v = rows.map(_._2)
    val f = rows.map(_._3)
    val rng = new MersenneTwister(seed)

    val tupleHash: Seq[String] => Long =
      t => PyHash.tupleHash(t.map(PyHash.strHash))

    // ---- scoring (hotspot.py:29-63), numpy-exact ----------------------

    /** gps over element-row-index selections in state order. */
    def gpsScore(selections: Seq[Array[Int]]): Double = {
      val aParts = new scala.collection.mutable.ArrayBuffer[Double]
      val bParts = new scala.collection.mutable.ArrayBuffer[Double]
      val selected = new Array[Boolean](nRows)
      for (sel <- selections) {
        val sv = sel.map(v)
        val sf = sel.map(f)
        val ratio = NumpySum.sum(sv) / NumpySum.sum(sf)
        for (k <- sel) {
          aParts += math.abs(v(k) - nanToNum(f(k) * ratio))
          bParts += math.abs(v(k) - f(k))
          selected(k) = true
        }
      }
      val a = NumpySum.sum(aParts.toArray) / aParts.length
      val b = NumpySum.sum(bParts.toArray) / bParts.length
      val rest = (0 until nRows).filterNot(selected)
      val c =
        if (rest.nonEmpty)
          nanToNum(NumpySum.sum(rest.map(k => math.abs(v(k) - f(k))).toArray) / rest.length)
        else 0.0
      1.0 - ((a + c) / (b + c))
    }

    /** ps over selections: ripple-overwrite a copy of f, full-array
      * distances (hotspot.py:21-37). */
    def psScore(selections: Seq[Array[Int]]): Double = {
      val a = f.clone()
      for (sel <- selections) {
        val vSum = NumpySum.sum(sel.map(v))
        val fSum = NumpySum.sum(sel.map(f))
        for (k <- sel)
          a(k) = if (fSum != 0) f(k) - (fSum - vSum) * (f(k) / fSum) else 0.0
      }
      def dist(x: Array[Double], y: Array[Double]): Double =
        math.sqrt(NumpySum.sum(Array.tabulate(nRows)(i => { val d = x(i) - y(i); d * d })))
      math.max(1.0 - dist(v, a) / dist(v, f), 0.0)
    }

    def score(selections: Seq[Array[Int]]): Double =
      if (opt.scoring == "ps") psScore(selections) else gpsScore(selections)

    val pt = opt.pt

    // ---- MCTS (hotspot.py:108-200), reference control flow ------------

    final class Node(val state: Vector[Int], val parent: Node) {
      var children: Array[Node] = _
      var fullyExpanded = false
      var q = 0.0
      var n = 0
    }

    def mcts(elemRows: Array[Array[Int]]): (Vector[Int], Double) = {
      val nElements = elemRows.length
      val elementScores = Array.tabulate(nElements)(e => score(Seq(elemRows(e))))

      def initChildren(node: Node): Unit = {
        val inState = node.state.toSet
        node.children = (0 until nElements).filterNot(inState)
          .map(e => new Node(node.state :+ e, node)).toArray
      }
      def ucb(node: Node): Node = {
        val c = math.sqrt(2.0)
        var best: Node = null
        var maxScore = -1.0
        for (child <- node.children if child.n > 0 && !child.fullyExpanded) {
          val s = child.q + c * math.sqrt(math.log(node.n) / child.n)
          if (s > maxScore) { best = child; maxScore = s }
        }
        best
      }
      def selection(root: Node): Node = {
        var node = root
        while (node.state.length < nElements) {
          if (node.children == null) { initChildren(node); return node }
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
      def expand(node: Node): Node = {
        var best: Node = null
        var maxScore = -1.0
        for (child <- node.children if child.n == 0) {
          val s = elementScores(child.state.last)
          if (s > maxScore) { best = child; maxScore = s }
        }
        best
      }
      def backup(node0: Node, newQ: Double): Unit = {
        var node = node0
        while (node != null) { node.n += 1; node.q = math.max(node.q, newQ); node = node.parent }
      }

      val root = new Node(Vector.empty, null)
      var maxQ = -1.0
      var bestState = Vector.empty[Int]
      var i = 0
      var break = false
      while (i < opt.m && !break) {
        var node = selection(root)
        if (!node.fullyExpanded) node = expand(node)
        if (root.fullyExpanded) break = true
        else {
          val newQ = score(node.state.map(elemRows))
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
      (bestState, maxQ)
    }

    // ---- layer/cuboid loop (hotspot.py:218-261) ------------------------

    val candidates = scala.collection.mutable.ArrayBuffer.empty[Candidate]
    for (layer <- 1 to attributes.length) {
      for (cuboid <- attributes.combinations(layer)) {
        val cuboidIdx = cuboid.map(attributes.indexOf).toArray
        // {tuple(row) for row in df[cuboid].values}: CPython set order
        val inserted = rows.map(r => cuboidIdx.map(r._1).toSeq)
        var elements: Seq[Seq[String]] =
          PyHash.PySet.of(inserted.toSeq, tupleHash).toList
        if (usePruning && layer > 1) {
          val parentSelections = candidates
            .filter(c => c.layer == layer - 1 && c.cuboid.toSet.subsetOf(cuboid.toSet)
              && c.cuboid.toSet != cuboid.toSet)
            .map(_.elements)
          for (parent <- parentSelections) {
            val parentSets = parent.map(_.toSet)
            elements = elements.filter(e =>
              parentSets.exists(pe => pe.subsetOf(e.toSet) && pe != e.toSet))
          }
        }
        val rowsOf: Map[Seq[String], Array[Int]] =
          rows.indices.groupBy(i => cuboidIdx.map(rows(i)._1).toSeq)
            .view.mapValues(_.toArray).toMap
        val elemRows = elements.map(rowsOf).toArray

        val (stateIdx, q) = mcts(elemRows)
        val cand = Candidate(layer, cuboid, q, stateIdx.map(elements).toList)
        if (cand.score >= pt) return cand
        candidates += cand
      }
    }
    candidates.minBy(c => (-c.score, c.layer, c.elements.size))
  }
}
