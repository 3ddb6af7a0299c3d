package graft.algorithms

import graft.model.{Element, RootCause}
import graft.operators.{Cuboids, Snapshots}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** AutoRoot over a UNION of many instance snapshots, batched into one
  * Spark DAG per layer (the BatchRiskLoc/BatchSqueeze pattern; reference
  * flow: algorithms/autoroot.py per instance).
  *
  * Keying: (instance, cluster, cuboid, key). Per-instance KDE cluster
  * boundaries come from ONE corpus-wide `collect_vector` aggregation;
  * cluster assignment is then a broadcast join of a per-instance
  * boundary ARRAY and a higher-order `filter` count — no per-leaf
  * shuffle and no per-instance jobs. Each layer runs the same three
  * aggregation passes as a single instance (tuple counts, then the two
  * NPS statistic passes over value-set-matched selections), corpus-wide.
  *
  * Unlike RiskLoc/Squeeze there is no early exit — the reference always
  * scans every layer — so the batch loop is exactly `#attributes`
  * rounds. Per-instance results are pinned equal to [[AutoRoot.run]] by
  * BatchAutoRootSpec.
  *
  * DISPATCH (measured, round 8): this whole-corpus DAG wins when
  * instances are small and many — scheduling-dominated corpora like RS
  * (4-9x over sequential, RS_SWEEP_BATCH.md) — and LOSES to the
  * concurrent per-instance sequential path once rows/instance outgrow
  * Runner.BatchCrossoverRows, because every corpus-wide pass carries the
  * big instances' rows (H_SCALE.md: sequential wins 1.7-6x at 24M
  * rows/instance). Runner's default `--mode auto` picks per corpus from
  * the CROSSOVER.md-measured threshold; batch is NOT the universal scale
  * mode, it is the many-small-instances mode.
  */
object BatchAutoRoot {

  /** Whole-corpus AutoRoot: merged root causes per instance. */
  def run(df0: DataFrame, instanceCol: String, attributes: Seq[String],
      opt: AutoRoot.Options = AutoRoot.Options()): Map[String, Seq[RootCause]] = {
    val spark = df0.sparkSession
    import spark.implicits._
    val inst = col(instanceCol)

    val allInstances: Seq[String] =
      df0.select(inst.cast("string")).distinct().collect().map(_.getString(0)).toSeq
    val empty: Map[String, Seq[RootCause]] = allInstances.map(_ -> Seq.empty[RootCause]).toMap

    val df = Snapshots.withDeviation(df0.withColumn(instanceCol, inst.cast("string")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // per-instance anomalous deviation vectors -> KDE minima boundaries.
    // Instances above statSampleCap are thinned by the SAME deterministic
    // leaf-hash filter sequential AutoRoot uses (AutoRoot.Options doc), so
    // Batch == sequential stays exact while the driver collect stays
    // bounded by instances x cap at any per-instance row count.
    val anomalous = df.filter(abs(col("deviation")) > 0.2)
    val anomCounts: Map[String, Long] = anomalous.groupBy(inst.as("__i")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (anomCounts.isEmpty) { df.unpersist(); return empty }
    val sampleKs = anomCounts.map { case (i, n) =>
      i -> (if (n > opt.statSampleCap) (n + opt.statSampleCap - 1) / opt.statSampleCap else 1L)
    }
    val devSrc =
      if (sampleKs.values.exists(_ > 1L))
        anomalous.join(broadcast(sampleKs.toSeq.toDF("__ki", "__k")), inst === col("__ki"))
          .filter(pmod(xxhash64(attributes.map(col): _*), col("__k")) === 0)
          .drop("__ki", "__k")
      else anomalous
    val devRows = devSrc
      .groupBy(inst.as("__i"))
      .agg(graft.functions.VectorAgg.collectVector(col("deviation")).as("devs"))
      .collect()
    if (devRows.isEmpty) { df.unpersist(); return empty }
    val boundaries: Map[String, Array[Double]] = devRows.map { r =>
      r.getString(0) -> AutoRoot.clusterBoundaries(r.getSeq[Double](1).sorted.toArray)
    }.toMap

    // cluster id = count of boundaries >= the deviation (clusterExpr
    // batched: per-instance boundary ARRAY broadcast in, higher-order
    // `filter` size — identical arithmetic, no per-instance literals)
    val boundDf = boundaries.toSeq.map { case (i, bs) => (i, bs.toSeq) }.toDF("__bi", "__bs")
    val clusterSimple =
      when(abs(col("deviation")) > 0.2,
        when(size(col("__bs")) === 0, lit(1))
          .otherwise(size(filter(col("__bs"), b => col("deviation") <= b))))
        .otherwise(lit(null))

    val withCluster = df.join(broadcast(boundDf), inst === col("__bi"), "left")
      .withColumn("cluster", clusterSimple)
      .drop("__bi", "__bs")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // per-(instance, cluster) sizes and per-instance totals, one pass each
    val clusterSizes: Map[(String, Int), Long] = withCluster
      .filter(col("cluster").isNotNull)
      .groupBy(inst.as("__i"), col("cluster")).agg(count(lit(1)).as("z"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val totals: Map[String, (Long, Double)] = withCluster
      .groupBy(inst.as("__i")).agg(count(lit(1)), sum(AutoRoot.termB))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

    val sizeDf = broadcast(clusterSizes.toSeq.map { case ((i, k), z) => (i, k, z) }
      .toDF("__zi", "__zk", "__z"))

    // instances with no anomalous rows (no boundaries entry) have
    // cluster=null on every row and can produce no candidates — drop
    // them before the per-layer expand so their rows are never shuffled
    // (the BatchSqueeze active left_semi pattern)
    val expandBase = withCluster.join(
      broadcast(boundaries.keys.toSeq.toDF(instanceCol)), Seq(instanceCol), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // best candidate per (instance, cluster), across layers by avg score
    val best = collection.mutable.Map.empty[(String, Int), (Double, RootCause)]

    // Layers are independent given the cluster assignment (each computes
    // its own candidates and NPS stats off the shared cached base); only
    // the best-split merge is order-sensitive ("strict >, earlier layer
    // wins" on ties). So the per-layer Spark passes run on a bounded
    // concurrent pool (graft.core.Concurrency: caps simultaneous
    // persisted counts frames) and the driver-side merge applies their
    // results sequentially in layer order below.
    val layerResults = try graft.core.Concurrency.awaitAll(
      (1 to attributes.size).map { layer => () => {
      val cuboids = attributes.combinations(layer).toSeq
      // NOT persisted: the explode is a narrow projection of a cached
      // parent multiplied by the cuboid count; caching that blowup spills
      // at H scale (block-manager eviction lock pileup, VERDICT r7) while
      // recomputing it per consuming pass is map-side CPU only.
      val exploded = Cuboids.expand(expandBase, cuboids)

      // y per (instance, element); x per (instance, element, cluster) —
      // the long form of the single-instance x_k pivot (cluster ids are
      // per-instance here, so a wide pivot would be ragged)
      val counts = exploded
        .groupBy(inst.as("__i"), col("cb.cid").as("cid"), col("cb.key").as("key"))
        .agg(count(lit(1)).as("y")).persist(StorageLevel.MEMORY_AND_DISK)
      // try/finally: a failing pass must not leave counts cached for the
      // rest of the session (ADVICE r7)
      try {
      val xs = exploded.filter(col("cluster").isNotNull)
        .groupBy(inst.as("__i"), col("cb.cid").as("cid"), col("cb.key").as("key"),
          col("cluster").as("k"))
        .agg(count(lit(1)).as("x"))

      // candidate splits (LF and cluster-share thresholds,
      // autoroot.py:110-123); the last-layer 1/z guard applies per
      // (instance, cluster)
      val lastLayer = layer == attributes.size
      val candPairs = xs
        .join(counts, Seq("__i", "cid", "key"))
        .join(sizeDf, col("__i") === col("__zi") && col("k") === col("__zk"))
        .filter(
          (col("x") / col("__z") > opt.deltaThreshold) &&
            (col("x").cast("double") / col("y") > opt.deltaThreshold) &&
            (if (lastLayer) lit(1.0) / col("__z") > opt.deltaThreshold else lit(true)))
        .select(col("__i"), col("cid"), col("key"), col("k"), col("x"), col("y"))
        .collect()

      val statRows: Map[(String, Int, Seq[String]), (Long, Double, Double)] =
        if (candPairs.isEmpty) Map.empty
        else {
        // NPS statistics once per DISTINCT (instance, element) — value-set
        // selection semantics as in AutoRoot.run (layer>=2 quirk)
        val candKeys = candPairs.map(r => (r.getString(0), r.getInt(1), r.getSeq[String](2)))
          .distinct.toSeq
        val candSel = broadcast(candKeys.toDF("ji", "jcid", "jkey")
          .withColumn("jset", array_distinct(col("jkey"))))
        // Fan-out bound: the (instance, cid) equi-keys hash-partition the
        // join; the native array_subset_of residual then matches each leaf
        // against every candidate of its (instance, cuboid) — worst case
        // |leaves| x |candidates| intermediate rows within one cuboid.
        // This value-SET selection (a leaf joins a candidate when its key
        // values are a subset of the candidate's value set) is the
        // reference's own semantics for layer>=2 splits (autoroot.py:
        // 125-129 via attribute_combination value matching), so the
        // fan-out is inherent, not a plan miss. Candidates per cuboid are
        // already threshold-filtered (LF/CF > deltaThreshold) which keeps
        // the candidate side small; for pathologically skewed cuboids the
        // mitigation is tightening deltaThreshold, not a different join.
        val setMatch = inst === col("ji") && col("cb.cid") === col("jcid") &&
          graft.functions.ArraySubset.subsetOf(col("cb.key"), col("jset"))
        val stats1 = exploded
          .join(candSel, setMatch)
          .groupBy(col("ji").as("__i"), col("jcid").as("cid"), col("jkey").as("key"))
          .agg(
            count(lit(1)).as("n_sel"),
            sum("real").as("sreal"), sum("predict").as("spred"),
            sum(AutoRoot.termB).as("sum_b"))
        val ratios = stats1.select(col("__i").as("ri"), col("cid").as("rcid"),
          col("key").as("rkey"), array_distinct(col("key")).as("rset"),
          when(col("spred") =!= 0, col("sreal") / col("spred")).otherwise(0.0).as("ratio"))
        val stats2 = exploded
          .join(broadcast(ratios),
            inst === col("ri") && col("cb.cid") === col("rcid") &&
              graft.functions.ArraySubset.subsetOf(col("cb.key"), col("rset")))
          .withColumn("a_row", col("predict") * col("ratio"))
          .withColumn("term_a",
            when(col("real") === 0, 0.0).otherwise(abs(col("real") - col("a_row")) / col("real")))
          .groupBy(col("ri").as("__i"), col("rcid").as("cid"), col("rkey").as("key"))
          .agg(avg("term_a").as("a"))

        stats1.join(stats2, Seq("__i", "cid", "key"))
          .select(col("__i"), col("cid"), col("key"), col("n_sel"), col("sum_b"), col("a"))
          .collect()
          .map(r => (r.getString(0), r.getInt(1), r.getSeq[String](2)) ->
            (r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
        }
      (layer, cuboids, candPairs, statRows)
      } finally counts.unpersist()
      } })
    catch { case e: Throwable =>
      // failing layer pass: drop the session-wide cached frames too
      expandBase.unpersist(); withCluster.unpersist(); df.unpersist(); throw e }

    // driver-side merge, sequential in layer order (earlier layer wins
    // avg-score ties via strict >)
    for ((layer, cuboids, candPairs, statRows) <- layerResults
         if candPairs.nonEmpty) {
        // driver: per (instance, cluster), per cuboid -> best-NPS split;
        // across cuboids and layers -> best avg (strict >, earlier wins)
        val byPair = candPairs.groupBy(r => (r.getString(0), r.getInt(3)))
        for (((i, k), rows) <- byPair) {
          val z = clusterSizes((i, k)).toDouble
          val (nTotal, tTermB) = totals(i)
          val byCuboid = rows.groupBy(_.getInt(1))
          for ((cid, rs) <- byCuboid.toSeq.sortBy(_._1)) {
            val ordered = rs.sortBy(_.getSeq[String](2).mkString(graft.core.Canonical.NulSep))
            var bestNps = -1.0
            var bestRow: Row = null
            for (r <- ordered) {
              val key = r.getSeq[String](2)
              val (nSelL, sumB, a) = statRows((i, cid, key))
              val nSel = nSelL.toDouble
              val b = sumB / nSel
              val c = if (nTotal == nSelL) Double.NaN
                else (tTermB - sumB) / (nTotal - nSelL)
              val nps = if (b + c == 0) Double.NaN else 1.0 - (a + c) / (b + c)
              if (nps > bestNps) { bestNps = nps; bestRow = r }
            }
            if (bestRow != null) {
              val x = bestRow.getLong(4).toDouble
              val lf = x / bestRow.getLong(5)
              val cf = x / z
              val avgScore = (bestNps + lf + cf) / 3.0
              val cur = best.get((i, k)).map(_._1).getOrElse(-1.0)
              if (avgScore > cur) {
                val cuboid = cuboids(cid)
                best((i, k)) = (avgScore, RootCause(
                  Seq(Element(cuboid, bestRow.getSeq[String](2))),
                  cuboid, layer,
                  Map("nps" -> bestNps, "lf" -> lf, "cf" -> cf, "avg" -> avgScore)))
              }
            }
          }
        }
    }

    expandBase.unpersist(); withCluster.unpersist(); df.unpersist()
    val merged = best.toSeq
      .groupBy(_._1._1)
      .map { case (i, entries) =>
        val ks = entries.map(_._1._2).sorted
        val byK = entries.map { case ((_, k), v) => k -> v._2 }.toMap
        i -> AutoRoot.mergeRootCauses(ks.map(byK), attributes.size)
      }
    empty ++ merged
  }
}
