package graft.algorithms

import graft.functions.Scores
import graft.model.{Element, RootCause}
import graft.operators.Snapshots
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** RiskLoc over a UNION of many instance snapshots in ONE Spark DAG per
  * remove-and-repeat iteration (SURVEY §3.1 / §4.2; the BatchAdtributor
  * pattern extended to an iterative algorithm).
  *
  * Every aggregation is keyed by `instance_id`: per-instance EP totals,
  * deviation cutoffs (two row_number windows over the distinct-deviation
  * frame), EP-sign flips, candidate filters and the two risk passes all
  * compute for the whole corpus at once. The only driver state is the
  * per-instance prune sets and winner selection over collected
  * per-candidate summaries (both bounded by candidates, not leaves).
  *
  * The remove-and-repeat loop advances ALL instances together: each
  * global iteration localizes at most one cause per instance, removes
  * found leaves with one instance-keyed anti-filter, and drops finished
  * instances; the iteration count is max #causes over the corpus (small),
  * so a 1000-file corpus costs ~(#iterations × jobs-per-iteration) Spark
  * jobs instead of 1000 × that.
  *
  * Semantics per instance equal [[RiskLoc.run]] (pinned by
  * BatchRiskLocSpec on the generated corpus). Prune visibility follows
  * the reference: layer-1 cuboids see the iteration-start state, deeper
  * cuboids see this iteration's additions (riskloc.py:89-117).
  *
  * DISPATCH (measured, round 8): with the layer-capped deep pass below,
  * this DAG wins at every measured multi-instance shape — 2.2-13x over
  * concurrent sequential at 48k rows/instance, 1.4-3.5x at 480k, 2.8x at
  * 4.8M, 4.3x at the full 24M H shape (CROSSOVER.md; H_SCALE.md round-8:
  * 341.8s vs 1466s) — so Runner's `--mode auto` batches riskloc for any
  * n > 1. (The OTHER Batch* DAGs do lose to sequential at large
  * instances; see their thresholds in Runner.BatchCrossoverByAlgo.)
  */
object BatchRiskLoc {

  private case class Winner(instance: String, cid: Int, key: Seq[String],
      ep: Double, high: Double, low: Double, risk: Double)

  /** Per-instance EP decoration (Snapshots.withExplanatoryPower with the
    * 1-row broadcast totals becoming one totals row PER instance). */
  private def withEp(df: DataFrame, inst: Column, opt: RiskLoc.Options): DataFrame =
    if (opt.derived) {
      val t1 = df.groupBy(inst.as("__i")).agg(
        sum("predict_a").as("__tpa"), sum("predict_b").as("__tpb"))
      val withRaw = df.join(broadcast(t1), inst === col("__i"))
        .withColumn("ep", Scores.explanatoryPowerDerived(
          col("real_a"), col("predict_a"), col("real_b"), col("predict_b"),
          col("__tpa"), col("__tpb")))
        .drop("__i", "__tpa", "__tpb")
      val t2 = withRaw.groupBy(inst.as("__i")).agg(Scores.pandasSum(col("ep")).as("__tep"))
      withRaw.join(broadcast(t2), inst === col("__i"))
        .withColumn("ep", Scores.numpyDiv(col("ep"), col("__tep")))
        .drop("__i", "__tep")
    } else {
      val t = df.groupBy(inst.as("__i")).agg(sum("real").as("__tr"), sum("predict").as("__tp"))
      df.join(broadcast(t), inst === col("__i"))
        .withColumn("ep", Scores.explanatoryPower(col("real"), col("predict"), col("__tr"), col("__tp")))
        .drop("__i", "__tr", "__tp")
    }

  /** Per-instance deviation cutoffs (RiskLoc.cutoff batched): the n+1
    * smallest/largest DISTINCT deviations per instance via two windows. */
  private def cutoffs(df: DataFrame, instanceCol: String,
      opt: RiskLoc.Options): Map[String, Double] = {
    val inst = col(instanceCol)
    val devs = df.select(inst.as("__i"), col("deviation")).distinct()
    val counts: Map[String, Long] =
      if (opt.removeRelative)
        devs.groupBy("__i").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      else Map.empty
    def nFor(i: String): Int =
      if (opt.removeRelative) math.ceil(counts(i) * opt.nRemove / 100.0).toInt else opt.nRemove
    val maxN = if (opt.removeRelative) counts.values.map(c => math.ceil(c * opt.nRemove / 100.0).toInt).max
               else opt.nRemove
    val ranked = devs
      .withColumn("ra", row_number().over(Window.partitionBy("__i").orderBy(asc("deviation"))))
      .withColumn("rd", row_number().over(Window.partitionBy("__i").orderBy(desc("deviation"))))
      .filter(col("ra") <= maxN + 1 || col("rd") <= maxN + 1)
      .collect()
    ranked.groupBy(_.getString(0)).map { case (i, rows) =>
      val n = nFor(i)
      val smallest = rows.filter(_.getInt(2) <= n + 1).map(_.getDouble(1))
      val largest = rows.filter(_.getInt(3) <= n + 1).map(_.getDouble(1))
      val minVal = smallest.max
      val maxVal = largest.min
      // python min(a, b, key=abs): first wins ties
      val t = if (math.abs(minVal) <= math.abs(maxVal)) minVal else maxVal
      i -> -t
    }
  }

  /** Small per-instance lookup joined in as a column (one row per
    * instance — broadcast hash join, no shuffle of the leaf frame). */
  private def lookupCol(df: DataFrame, instanceCol: String,
      m: Map[String, Double], name: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.join(broadcast(m.toSeq.toDF("__i", name)), col(instanceCol) === col("__i")).drop("__i")
  }

  /** Batched RiskLoc.score: cutoff, partition, weight, EP sign, ep_z. */
  private def scoreAll(df0: DataFrame, instanceCol: String,
      opt: RiskLoc.Options): (DataFrame, Map[String, Double], DataFrame, Map[String, Double]) = {
    val inst = col(instanceCol)
    val base = Snapshots.withDeviation(withEp(df0, inst, opt))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cut = cutoffs(base, instanceCol, opt)

    var df = lookupCol(base, instanceCol, cut, "__cut")
    val anomalyRight = col("__cut") > 0 || (col("__cut") === 0 && lit(1.0) / col("__cut") > 0)
    df = df.withColumn("partition",
      when(anomalyRight && col("deviation") > col("__cut"), 1)
        .when(!anomalyRight && col("deviation") < col("__cut"), 1)
        .otherwise(0))
    val baseWeight = abs(col("__cut") - col("deviation"))
    df = df.withColumn("weight",
      least(
        when(col("partition") === 1, abs(col("deviation")))
          .when(col("real") === 0 && col("predict") === 0, 0.0)
          .otherwise(baseWeight),
        lit(1.0)))

    val epSums = df.filter(col("partition") === 1)
      .groupBy(inst.as("__i")).agg(Scores.pandasSum(col("ep")).as("__eps"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) 0.0 else r.getDouble(1))).toMap
    val flip = cut.keys.map(i => i -> (epSums.getOrElse(i, 0.0) < 0)).toMap
    val adjThreshold = cut.keys.map(i =>
      i -> math.abs(epSums.getOrElse(i, 0.0)) * opt.pepThreshold).toMap
    // Iteration 1's anomalous EP mass is ALREADY this pass's |eps| —
    // IEEE negation is bit-exact, so the sign-flipped frame's
    // partition-1 sum equals it (the sequential score() epSum0 argument,
    // ported round 13) — the first searchAll wave skips its mass action.
    val epMass0 = cut.keys.map(i => i -> math.abs(epSums.getOrElse(i, 0.0))).toMap

    df = lookupCol(df, instanceCol,
      flip.map { case (i, f) => i -> (if (f) -1.0 else 1.0) }, "__sign")
      .withColumn("ep", col("ep") * col("__sign"))
      .withColumn("ep_z", when(col("ep") > 0, col("ep")).otherwise(0.0))
      .drop("__cut", "__sign")
    (df, adjThreshold, base, epMass0)
  }

  private type PruneState = Map[String, Seq[String]] // attr -> pruned values

  private def pruneFlags(exploded: DataFrame, instanceCol: String, attributes: Seq[String],
      states: Map[String, PruneState]): DataFrame = {
    // (instance, attr, value) prune table; per-attribute broadcast lookups
    val spark = exploded.sparkSession
    import spark.implicits._
    val rows = for {
      (i, st) <- states.toSeq
      (a, vs) <- st.toSeq
      v <- vs
    } yield (i, a, v)
    if (rows.isEmpty)
      return attributes.foldLeft(exploded)((d, a) => d.withColumn(s"__pr_$a", lit(false)))
    val pruneDf = rows.toDF("__pi", "__pa", "__pv")
    attributes.foldLeft(exploded) { (d, a) =>
      d.join(broadcast(pruneDf.filter(col("__pa") === a).select(col("__pi"), col("__pv"))),
          col(instanceCol) === col("__pi") && col(a) === col("__pv"), "left")
        .withColumn(s"__pr_$a", col("__pv").isNotNull)
        .drop("__pi", "__pv")
    }
  }

  /** Multi-cuboid expand with per-instance prune flags. */
  private def expand(df: DataFrame, instanceCol: String, attributes: Seq[String],
      cuboids: Seq[(Seq[String], Int)], states: Map[String, PruneState]): DataFrame = {
    val flagged = pruneFlags(df, instanceCol, attributes, states)
    val structs = cuboids.map { case (c, i) =>
      val keep = c.map(a => !col(s"__pr_$a")).reduce(_ && _)
      when(keep, struct(lit(i).as("cid"), array(c.map(col): _*).as("key"))).otherwise(lit(null))
    }
    flagged.withColumn("cb", explode(array(structs: _*))).filter(col("cb").isNotNull)
      .drop(attributes.map(a => s"__pr_$a"): _*)
  }

  /** Selection-level aggregates (wa/wn/sreal/spred/w2/n_nz) — fused into
    * every candidate-producing aggregation so the multi-cuboid explode is
    * computed once for candidates+stats instead of once per pass (the
    * explode over the H shape's 57 deep cuboids is the dominant stage;
    * widening the existing (inst, cid, key) hash-agg by six columns is
    * map-side CPU only, the group count is unchanged). */
  private def riskAggCols: Seq[Column] = {
    val nz = col("real") =!= 0 && col("predict") =!= 0
    Seq(
      sum(when(col("partition") === 1, col("weight")).otherwise(0.0)).as("wa"),
      sum(when(col("partition") === 0, col("weight")).otherwise(0.0)).as("wn"),
      sum(when(nz, col("real")).otherwise(0.0)).as("sreal"),
      sum(when(nz, col("predict")).otherwise(0.0)).as("spred"),
      avg(when(nz, abs(col("deviation")))).as("w2"),
      count(when(nz, lit(1))).as("n_nz"))
  }

  /** Ripple pass + winner selection keyed by (instance, cid, key).
    * `candStats` must carry the fused selection-level aggregates
    * (inst, cid, key, ep, wa, wn, sreal, spred, w2, n_nz) — only the
    * ripple mean (pass 2) still reads the exploded frame. */
  private def riskWinners(exploded: DataFrame, instanceCol: String,
      candStats: DataFrame, opt: RiskLoc.Options): Map[(String, Int), Winner] = {
    val nz = col("real") =!= 0 && col("predict") =!= 0
    val inst = col(instanceCol)
    // Op order replicates the reference exactly (riskloc.py:66-67) — see
    // the sequential RiskLoc.riskWinners note: a = (predict*sreal)/spred
    // elementwise, and fillna(0) replaces only NaN, keeping true ±Inf.
    val ratios = candStats.select(col("inst").as("ri"), col("cid").as("rcid"), col("key").as("rkey"),
      col("sreal").as("rsreal"), col("spred").as("rspred"))
    val stats2 = exploded
      .join(broadcast(ratios),
        inst === col("ri") && col("cb.cid") === col("rcid") && col("cb.key") === col("rkey"))
      .filter(nz)
      .withColumn("a",
        graft.functions.Scores.numpyDiv(col("predict") * col("rsreal"), col("rspred")))
      .withColumn("d0",
        graft.functions.Scores.numpyDiv(lit(2.0) * (col("a") - col("real")), col("a") + col("real")))
      .withColumn("d", when(isnan(col("d0")), 0.0).otherwise(col("d0")))
      .groupBy(col("ri").as("inst"), col("rcid").as("cid"), col("rkey").as("key"))
      .agg(avg(abs(col("d"))).as("w1"))

    // Winner selection stays IN Spark: the driver scan "first candidate in
    // (ep desc, key asc) order whose risk passes" equals "rank-1 of the
    // PASSING candidates under the same order" (restricting an order to a
    // subset preserves relative order), so only one row per (instance,
    // cuboid) is ever collected. Collecting every candidate's stats instead
    // is O(instances x cuboids x maxCandidatesPerCuboid) — at the H shape
    // (4 x 24M rows, 57 deep cuboids) that is millions of rows and blew
    // spark.driver.maxResultSize in the r7 rehearsal. Formulas are the same
    // IEEE double ops the driver scan used (riskloc.py:51-55); key order by
    // elementwise array compare == the NUL-joined string compare the driver
    // used (keys within a cuboid share arity; values are NUL-free).
    val winners = candStats
      .join(stats2, Seq("inst", "cid", "key"), "left")
      // n_normal = wn + 1 rounds first (riskloc.py:51-55)
      .withColumn("high", col("wa") / (col("wa") + (col("wn") + lit(1.0))))
      .withColumn("low",
        when(col("n_nz") > 0 && col("w2").isNotNull && col("w2") =!= 0.0,
          coalesce(col("w1"), lit(0.0)) / col("w2")).otherwise(0.0))
      .withColumn("risk", col("high") - col("low"))
      // Scala's `_.risk >= threshold` is FALSE for NaN (any Double
      // comparison with NaN is), but Spark SQL treats NaN as the largest
      // value, so a bare >= would pass a NaN risk (possible when +-Inf
      // survives into the w1/w2 means) that the sequential scan skips.
      .filter(!isnan(col("risk")) && col("risk") >= opt.riskThreshold)
      .withColumn("__rn", row_number().over(
        Window.partitionBy("inst", "cid").orderBy(desc("ep"), asc("key"))))
      .filter(col("__rn") === 1)
      .select("inst", "cid", "key", "ep", "high", "low", "risk")
      .collect()

    winners.iterator.map { r =>
      (r.getString(0), r.getInt(1)) ->
        Winner(r.getString(0), r.getInt(1), r.getSeq[String](2).toSeq, r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6))
    }.toMap
  }

  /** One remove-and-repeat iteration for EVERY instance in `adjThreshold`
    * (the caller's pre-check active set). Runs the per-instance
    * continuation check (anomalous EP mass >= threshold) and the layer-1
    * candidate sums as ONE concurrent pair — the layer-1 pass is
    * speculative over the pre-check set, and sums for instances the check
    * retires are discarded before they become prune updates or
    * candidates. When `speculateDeep` (the previous iteration needed the
    * deep layers — remove-and-repeat causes cluster at one depth), the
    * deep-layer candidate frame is materialized concurrently with the
    * layer-1 risk pass; instances that do win at layer 1 get their deep
    * candidates filtered back out before the deep risk pass, so winner
    * selection is unchanged. Returns the found cause per instance
    * (instances without one are done) plus whether the deep stage ran —
    * the next iteration's speculation hint. */
  private def searchAll(df: DataFrame, instanceCol: String, attributes: Seq[String],
      adjThreshold: Map[String, Double],
      pruned: collection.mutable.Map[String, collection.mutable.Map[String, collection.mutable.ArrayBuffer[String]]],
      speculateDeep: Boolean, deepCapLayer: Int,
      opt: RiskLoc.Options,
      knownEpMass: Option[Map[String, Double]] = None): (Map[String, RootCause], Boolean) = {
    val spark = df.sparkSession
    import spark.implicits._
    val inst = col(instanceCol)
    val nAttrs = attributes.size
    def snapshot(i: String): PruneState =
      pruned.getOrElse(i, collection.mutable.Map.empty)
        .iterator.map { case (k, v) => k -> v.toSeq }.toMap
    val usePrune = opt.pruneElements
    val instances0 = adjThreshold.keySet
    val statesOld: Map[String, PruneState] =
      if (usePrune) instances0.iterator.map(i => i -> snapshot(i)).toMap else Map.empty

    // ---- stage 1: layer 1 for all instances
    val layer1 = attributes.map(Seq(_)).zipWithIndex
    // NOT persisted: the explode is a narrow projection of the cached
    // scored frame multiplied by the cuboid count; at the H shape (24M
    // rows/instance, 6 attrs) caching it spills and deadlocks the block
    // manager under 32-way eviction (observed r7) — recomputing per pass
    // is map-side CPU only.
    val exploded1 = expand(df, instanceCol, attributes, layer1, statesOld)
    val agg1Task: () => Array[Row] = () => exploded1
      .groupBy(inst.as("inst"), col("cb.cid").as("cid"), col("cb.key").as("key"))
      .agg(Scores.pandasSum(col("ep")).as("ep"),
        (Seq(sum("ep_z").as("ep_z"), sum("partition").as("part_sum")) ++ riskAggCols): _*)
      .collect()
    // Iteration 1's per-instance EP mass is known from scoreAll (bit-exact
    // sign-flip, see its note) — the wave then has a single task; later
    // iterations compute the post-removal mass concurrently as before.
    val (epMass, rawAgg1) = knownEpMass match {
      case Some(known) => (known, agg1Task())
      case None =>
        val wave1 = graft.core.Concurrency.awaitAll[Array[Row]](Seq(
          () => df.filter(col("partition") === 1)
            .groupBy(inst.as("__i")).agg(Scores.pandasSum(col("ep")).as("__eps"))
            .collect(),
          agg1Task))
        (wave1(0).map(r =>
          r.getString(0) -> (if (r.isNullAt(1)) 0.0 else r.getDouble(1))).toMap,
          wave1(1))
    }
    val instances = instances0.filter(i => epMass.getOrElse(i, 0.0) >= adjThreshold(i))
    if (instances.isEmpty) return (Map.empty, false)
    val epsA = rawAgg1.filter(r => instances.contains(r.getString(0)))

    if (usePrune) {
      epsA.foreach { r =>
        val i = r.getString(0)
        if (r.getDouble(4) < adjThreshold(i) || r.getLong(5) == 0)
          pruned.getOrElseUpdate(i, collection.mutable.Map.empty)
            .getOrElseUpdate(attributes(r.getInt(1)), collection.mutable.ArrayBuffer.empty) +=
            r.getSeq[String](2).head
      }
    }
    val statesNew: Map[String, PruneState] =
      if (usePrune) instances.iterator.map(i => i -> snapshot(i)).toMap else Map.empty

    // rows: inst(0) cid(1) key(2) ep(3) ep_z(4) part_sum(5)
    //       wa(6) wn(7) sreal(8) spred(9) w2(10) n_nz(11)
    val candL1 = epsA.toSeq
      .filter(r => r.getLong(5) > 0 && r.getDouble(3) > adjThreshold(r.getString(0)))
      .map(r => (r.getString(0), r.getInt(1), r.getSeq[String](2), r.getDouble(3),
        r.getDouble(6), r.getDouble(7), r.getDouble(8), r.getDouble(9),
        if (r.isNullAt(10)) None else Some(r.getDouble(10)), r.getLong(11)))
      .groupBy(r => (r._1, r._2)).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(-_._4).take(opt.maxCandidatesPerCuboid)
      }

    def winners1Pass(): Map[String, Winner] =
      if (candL1.isEmpty) Map.empty
      else riskWinners(exploded1, instanceCol,
        candL1.toDF("inst", "cid", "key", "ep", "wa", "wn", "sreal", "spred", "w2", "n_nz"), opt)
        .values.toSeq.groupBy(_.instance)
        .map { case (i, ws) => i -> ws.sortBy(w => (-w.ep, w.cid)).head }

    val found = collection.mutable.Map.empty[String, RootCause]
    def recordLayer1(winners1: Map[String, Winner]): Unit =
      winners1.foreach { case (i, w) =>
        val cuboid = Seq(attributes(w.cid))
        found(i) = RootCause(Seq(Element(cuboid, w.key)), cuboid, 1,
          Map("ep" -> w.ep, "high_risk" -> w.high, "low_risk" -> w.low, "risk" -> w.risk))
      }
    if (nAttrs == 1) { recordLayer1(winners1Pass()); return (found.toMap, false) }

    // ---- stage 2: deeper layers, only for instances without a layer-1 win
    val deep = (2 to nAttrs).flatMap(l => attributes.combinations(l).toSeq)
      .zipWithIndex.map { case (c, i) => (c, i + nAttrs) }
    val deepCuboids = deep.map(_._1)
    def layerOf(cid: Int): Int = deepCuboids(cid - nAttrs).size

    // Layer-capped deep pass (VERDICT r7 #7): winner selection takes the
    // SHALLOWEST deep layer with any winner, so emitting every row for
    // every deep cuboid (57 at 6 attributes) wastes most of the expand
    // whenever causes sit near the top — the common case (remove-and-
    // repeat causes cluster at one depth, tracked by `deepCapLayer` = last
    // found deep layer + 1). The near pass covers layers 2..cap; only
    // instances it leaves unfound fall back to the far layers — exactly
    // equivalent because a near winner shadows any far winner (deeper
    // layer) and a near miss means layers <= cap contribute nothing.
    val cap = math.min(math.max(2, deepCapLayer), nAttrs)
    val deepNear = deep.filter(_._1.size <= cap)
    val deepFar = deep.filter(_._1.size > cap)

    def buildDeepCands(forInstances: Set[String],
        cuboidSubset: Seq[(Seq[String], Int)]): (DataFrame, DataFrame) = {
      val dfDeep = if (forInstances == instances0) df
                   else df.filter(inst.isin(forInstances.toSeq: _*))
      val exploded2 = expand(dfDeep, instanceCol, attributes, cuboidSubset, statesNew)
      val thresholdDf = broadcast(adjThreshold.toSeq.toDF("__ti", "__thr"))
      val candsDeep = exploded2
        .groupBy(inst.as("inst"), col("cb.cid").as("cid"), col("cb.key").as("key"))
        .agg(Scores.pandasSum(col("ep")).as("ep"),
          (sum("partition").as("part_sum") +: riskAggCols): _*)
        .join(thresholdDf, col("inst") === col("__ti"))
        .filter(col("part_sum") > 0 && col("ep") > col("__thr"))
        .select("inst", "cid", "key", "ep", "wa", "wn", "sreal", "spred", "w2", "n_nz")
        .withColumn("rn", row_number().over(
          Window.partitionBy("inst", "cid").orderBy(desc("ep"))))
        .filter(col("rn") <= opt.maxCandidatesPerCuboid)
        .drop("rn")
        .persist(StorageLevel.MEMORY_AND_DISK)
      (exploded2, candsDeep)
    }

    def deepStage(exploded2: DataFrame, candsDeep: DataFrame,
        deepInstances: Set[String]): Unit = {
      val candKeys = if (deepInstances == instances) candsDeep
                     else candsDeep.filter(col("inst").isin(deepInstances.toSeq: _*))
      riskWinners(exploded2, instanceCol, candKeys, opt)
        .values.toSeq.groupBy(_.instance).foreach { case (i, ws) =>
          (2 to nAttrs).iterator
            .map(layer => ws.filter(w => layerOf(w.cid) == layer)
              .sortBy(w => (-w.ep, w.cid)).headOption)
            .collectFirst { case Some(w) => w }
            .foreach { w =>
              val cuboid = deepCuboids(w.cid - nAttrs)
              found(i) = RootCause(Seq(Element(cuboid, w.key)), cuboid, cuboid.size,
                Map("ep" -> w.ep, "high_risk" -> w.high, "low_risk" -> w.low, "risk" -> w.risk))
            }
        }
    }

    var ranDeep = false
    // far-layer fallback: only instances the near pass left unfound ever
    // pay for layers > cap
    def fallbackFar(): Unit = {
      val still = instances -- found.keySet
      if (still.nonEmpty && deepFar.nonEmpty) {
        val (e3, c3) = buildDeepCands(still, deepFar)
        try deepStage(e3, c3, still)
        finally c3.unpersist()
      }
    }
    if (speculateDeep) {
      // Materialize the deep candidate frame concurrently with the
      // layer-1 risk pass. Per-instance deep candidates are identical
      // whether computed over the full set or deepInstances only (every
      // aggregation, threshold join and top-n window is instance-keyed),
      // so the only speculation cost is the explode/agg work for
      // instances that turn out to win at layer 1.
      val (exploded2, candsDeep) = buildDeepCands(instances, deepNear)
      // try/finally: if winners1Pass or deepStage throws, the persisted
      // frame must not stay cached for the rest of the session (ADVICE r7)
      try {
        val wave2 = graft.core.Concurrency.awaitAll[AnyRef](Seq(
          () => winners1Pass().asInstanceOf[AnyRef],
          () => { candsDeep.count(); null }))
        recordLayer1(wave2(0).asInstanceOf[Map[String, Winner]])
        val deepInstances = instances -- found.keySet
        if (deepInstances.nonEmpty) {
          ranDeep = true
          deepStage(exploded2, candsDeep, deepInstances)
        }
      } finally candsDeep.unpersist()
      fallbackFar()
    } else {
      recordLayer1(winners1Pass())
      val deepInstances = instances -- found.keySet
      if (deepInstances.nonEmpty) {
        ranDeep = true
        val (exploded2, candsDeep) = buildDeepCands(deepInstances, deepNear)
        try deepStage(exploded2, candsDeep, deepInstances)
        finally candsDeep.unpersist()
        fallbackFar()
      }
    }
    (found.toMap, ranDeep)
  }

  /** Whole-corpus RiskLoc: one instance-keyed DAG per global iteration.
    * Input must carry `instanceCol`; returns causes per instance. */
  def run(df0: DataFrame, instanceCol: String, attributes: Seq[String],
      opt: RiskLoc.Options = RiskLoc.Options()): Map[String, Seq[RootCause]] = {
    val inst = col(instanceCol)
    val (scored0, adjThreshold0, base, epMass0) = scoreAll(df0, instanceCol, opt)
    var df = scored0.persist(StorageLevel.MEMORY_AND_DISK)
    // base stays cached until the first wave materializes the scored
    // frame (round 13; the explicit count-to-materialize action is gone —
    // wave-1's two concurrent actions are the materializer, and releasing
    // base before them would recompute the scored lineage from raw input)
    var baseToRelease: Option[DataFrame] = Some(base)
    var toUnpersist: Option[DataFrame] = None

    val pruned = collection.mutable.Map
      .empty[String, collection.mutable.Map[String, collection.mutable.ArrayBuffer[String]]]
    val results = collection.mutable.Map.empty[String, collection.mutable.ArrayBuffer[RootCause]]
    var active: Set[String] = adjThreshold0.keySet
    // Deep-layer speculation hint: remove-and-repeat causes cluster at one
    // depth, so "last iteration needed deep layers" predicts the next.
    // Starts false — a corpus whose causes all sit at layer 1 never pays a
    // speculative deep explode (the H-scale concern: 57 cuboids x 24M rows).
    var speculateDeep = false
    // Deep-layer CAP hint (VERDICT r7 #7): the deep pass first covers only
    // layers 2..cap (last found deep layer + 1); deeper layers run as a
    // fallback for instances the near pass left unfound. Starts at 2.
    var deepCapLayer = 2
    var firstIteration = true

    while (active.nonEmpty) {
      // searchAll runs the per-instance continuation check (anomalous EP
      // mass below threshold finishes the instance) concurrently with its
      // layer-1 sums and returns only instances that passed AND found a
      // cause this iteration.
      val thresholds = adjThreshold0.filter { case (i, _) => active.contains(i) }
      val (found, ranDeep) = searchAll(df.filter(inst.isin(active.toSeq: _*)), instanceCol,
        attributes, thresholds, pruned, speculateDeep, deepCapLayer, opt,
        knownEpMass = if (firstIteration) Some(epMass0) else None)
      firstIteration = false
      // caches feeding the frame the wave just materialized are only
      // released after it ran (round 13 — lazy-checkpoint deferral)
      toUnpersist.foreach(_.unpersist()); toUnpersist = None
      baseToRelease.foreach(_.unpersist()); baseToRelease = None
      speculateDeep = ranDeep
      val deepFoundLayers = found.values.map(_.layer).filter(_ >= 2)
      if (deepFoundLayers.nonEmpty)
        deepCapLayer = math.min(attributes.size, deepFoundLayers.max + 1)
      active = found.keySet
      if (found.nonEmpty) {
        found.foreach { case (i, rc) =>
          results.getOrElseUpdate(i, collection.mutable.ArrayBuffer.empty) += rc
        }
        // remove every found cause's leaves with one instance-keyed filter
        val removeCond = found.map { case (i, rc) =>
          inst === i && rc.cuboid.zip(rc.elements.head.pairs.map(_._2))
            .map { case (a, v) => col(a) === v }.reduce(_ && _)
        }.reduce(_ || _)
        // checkpoint stays EAGER here: a lazy one materializes inside a
        // much later wave, after the source execution's weakly-referenced
        // metric accumulators are GC-cleaned — every checkpoint task then
        // logs an ERROR accumulator-update failure (observed round 13;
        // results unaffected, but 60 stack traces per run is not hygiene
        // worth one scheduler round-trip per iteration). Re-measured
        // round 14 (VERDICT #5): lazy read q47 7.99s vs eager 9.02s, but
        // the untouched q40 control moved by the same ratio in the same
        // window (5.62 vs 6.49 — window drift, not the checkpoint), and
        // the lazy run tripled the accumulator ERROR noise (288 vs 96
        // lines) because the materialization also races the next wave's
        // two concurrent first actions (the C8 duplicate-compute hazard).
        // Null result; eager kept.
        val next = df.filter(!removeCond).localCheckpoint(true)
        toUnpersist = Some(df)
        df = next
      }
    }
    df.unpersist()
    toUnpersist.foreach(_.unpersist())
    results.map { case (k, v) => k -> v.toSeq }.toMap
  }
}
