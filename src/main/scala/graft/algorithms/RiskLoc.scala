package graft.algorithms

import graft.model.{Element, RootCause}
import graft.operators.Snapshots
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** RiskLoc (arXiv:2205.10004) — weighted-risk root-cause localization.
  * Reference behavior: algorithms/riskloc.py.
  *
  * Spark-first design (SURVEY.md §4.2): instead of the reference's
  * per-cuboid `groupby` loop and per-candidate whole-table boolean masks,
  * each layer runs ONE multi-cuboid aggregation (an Expand: every leaf row
  * is emitted once per cuboid it belongs to, pre-filtered by the pruned
  * element set) and TWO batched passes computing every candidate's risk
  * statistics via conditional aggregation. The driver only handles small
  * per-candidate summaries and the search control flow, so the same plan
  * holds at 100 TB: shuffles are bounded by (#layers + 3·#found) passes,
  * never by candidate count.
  */
object RiskLoc {

  final case class Options(
      riskThreshold: Double = 0.5,
      pepThreshold: Double = 0.02,
      nRemove: Int = 5,
      removeRelative: Boolean = false,
      derived: Boolean = false,
      pruneElements: Boolean = true,
      maxCandidatesPerCuboid: Int = 10000,
      /** Per-layer/cuboid/candidate score tracing (the reference's
        * `debug=True` prints, riskloc.py:101-145). */
      trace: String => Unit = _ => ())

  private case class Candidate(cid: Int, key: Seq[String], ep: Double,
      wa: Double, wn: Double, sreal: Double, spred: Double, w2: Double, nNz: Long)

  /** Deviation cutoff: drop the n most extreme distinct deviations on each
    * side, take the nearest-to-zero survivor, negated
    * (reference get_cutoff, riskloc.py:35-49). */
  def cutoff(df: DataFrame, nRemove: Int, relative: Boolean): Double = {
    val devs = df.select("deviation").distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val n = if (relative) {
      val cnt = devs.count()
      math.ceil(cnt * nRemove / 100.0).toInt
    } else nRemove
    val smallest = devs.orderBy(asc("deviation")).limit(n + 1).collect().map(_.getDouble(0))
    val largest = devs.orderBy(desc("deviation")).limit(n + 1).collect().map(_.getDouble(0))
    devs.unpersist()
    val minVal = smallest.max
    val maxVal = largest.min
    // python min(a, b, key=abs): first wins ties
    val t = if (math.abs(minVal) <= math.abs(maxVal)) minVal else maxVal
    -t
  }

  /** Decorate the snapshot with ep/deviation/partition/weight/ep_z columns
    * (riskloc.py:9-32,163-187). Returns (scoredDf, adjEpThreshold, base);
    * `base` is persisted before the cutoff/ep-sum actions so the input
    * lineage (at scale: the raw leaf scan) is read once — the caller
    * unpersists it once the scored frame is materialized. */
  def score(df0: DataFrame, opt: Options): (DataFrame, Double, DataFrame) = {
    val base = Snapshots.withDeviation(Snapshots.withExplanatoryPower(df0, opt.derived))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var df = base
    val cut = cutoff(df, opt.nRemove, opt.removeRelative)
    val anomalyRight = math.copySign(1.0, cut) > 0

    val partitionCol =
      if (anomalyRight) when(col("deviation") > cut, 1).otherwise(0)
      else when(col("deviation") < cut, 1).otherwise(0)
    df = df.withColumn("partition", partitionCol)

    val baseWeight = abs(lit(cut) - col("deviation"))
    df = df.withColumn("weight",
      least(
        when(col("partition") === 1, abs(col("deviation")))
          .when(col("real") === 0 && col("predict") === 0, 0.0)
          .otherwise(baseWeight),
        lit(1.0)))

    // Negate EP when the anomalous partition's EP mass is negative.
    val epSumRow = df.filter(col("partition") === 1)
      .agg(graft.functions.Scores.pandasSum(col("ep"))).collect()(0)
    val epSum = if (epSumRow.isNullAt(0)) 0.0 else epSumRow.getDouble(0)
    val (dfSigned, anomalyEpSum) =
      if (epSum < 0) (df.withColumn("ep", -col("ep")), -epSum) else (df, epSum)
    val scored = dfSigned
      .withColumn("ep_z", when(col("ep") > 0, col("ep")).otherwise(0.0))
    (scored, anomalyEpSum * opt.pepThreshold, base)
  }

  private type PruneState = Map[String, Seq[String]]
  private case class Winner(cid: Int, key: Seq[String], ep: Double,
      high: Double, low: Double, risk: Double)

  private def pruneCond(c: Seq[String], state: PruneState) = c
    .flatMap(a => state.get(a).filter(_.nonEmpty).map(vs => !col(a).isin(vs: _*)))
    .reduceOption(_ && _).getOrElse(lit(true))

  /** Multi-cuboid expand: one `cb = {cid, key}` row per (leaf, cuboid),
    * rows pruned per cuboid (only prune keys within the cuboid apply --
    * riskloc.py:75-86). */
  private def expandCuboids(df: DataFrame, cuboids: Seq[(Seq[String], Int)],
      state: Int => PruneState): DataFrame = {
    val structs = cuboids.map { case (c, i) =>
      when(pruneCond(c, state(i)), struct(lit(i).as("cid"), array(c.map(col): _*).as("key")))
        .otherwise(lit(null))
    }
    df.withColumn("cb", explode(array(structs: _*))).filter(col("cb").isNotNull)
  }

  /** Two batched risk passes for every candidate at once, then the
    * per-cuboid EP-desc scan on the driver: each cuboid's winner is its
    * first risk-passing candidate (riskloc.py:120-159). */
  private def riskWinners(exploded: DataFrame, candKeys: DataFrame,
      opt: Options, cuboidOf: Int => Seq[String] = _ => Seq.empty): Map[Int, Winner] = {
    val nz = col("real") =!= 0 && col("predict") =!= 0

    // Pass 1: selection-level sums per candidate.
    val stats1 = exploded
      .join(broadcast(candKeys.select(col("cid").as("jcid"), col("key").as("jkey"))),
        col("cb.cid") === col("jcid") && col("cb.key") === col("jkey"))
      .groupBy(col("jcid").as("cid"), col("jkey").as("key"))
      .agg(
        sum(when(col("partition") === 1, col("weight")).otherwise(0.0)).as("wa"),
        sum(when(col("partition") === 0, col("weight")).otherwise(0.0)).as("wn"),
        sum(when(nz, col("real")).otherwise(0.0)).as("sreal"),
        sum(when(nz, col("predict")).otherwise(0.0)).as("spred"),
        avg(when(nz, abs(col("deviation")))).as("w2"),
        count(when(nz, lit(1))).as("n_nz"))

    // Pass 2: ripple-adjusted mean |d| per candidate, using pass-1 sums.
    // Op order replicates the reference exactly (riskloc.py:66-67):
    // a = (predict * sum(real)) / sum(predict) elementwise — NOT
    // predict * (sum(real)/sum(predict)); the two round differently and
    // low_risk sits right on the risk-threshold boundary for elements
    // whose d should be exactly 0. fillna(0) replaces only NaN (0/0 and
    // inf/inf); true ±Inf survives into the mean, as in pandas.
    val ratios = stats1.select(col("cid").as("rcid"), col("key").as("rkey"),
      col("sreal").as("rsreal"), col("spred").as("rspred"))
    val stats2 = exploded
      .join(broadcast(ratios),
        col("cb.cid") === col("rcid") && col("cb.key") === col("rkey"))
      .filter(nz)
      .withColumn("a",
        graft.functions.Scores.numpyDiv(col("predict") * col("rsreal"), col("rspred")))
      .withColumn("d0",
        graft.functions.Scores.numpyDiv(lit(2.0) * (col("a") - col("real")), col("a") + col("real")))
      .withColumn("d", when(isnan(col("d0")), 0.0).otherwise(col("d0")))
      .groupBy(col("rcid").as("cid"), col("rkey").as("key"))
      .agg(avg(abs(col("d"))).as("w1"))

    val collected = candKeys
      .join(stats1, Seq("cid", "key"))
      .join(stats2, Seq("cid", "key"), "left")
      .collect()

    collected.groupBy(_.getInt(0)).flatMap { case (cid, rows) =>
      opt.trace(s"Cuboid: ${cuboidOf(cid).mkString("[", ", ", "]")}")
      val ordered = rows.sortBy(r => (-r.getDouble(2), r.getSeq[String](1).mkString("\u0000")))
      ordered.iterator.map { r =>
        val ep = r.getDouble(2)
        val wa = r.getDouble(3); val wn = r.getDouble(4)
        // reference high_risk (riskloc.py:51-55): n_normal = wn + 1 is
        // rounded FIRST, then added to wa — (wa+wn)+1 rounds differently
        // and high sits exactly on 0.5 for the threshold-boundary cases
        val high = wa / (wa + (wn + 1.0))
        val w2 = if (r.isNullAt(7)) 0.0 else r.getDouble(7)
        val nNz = r.getLong(8)
        val w1 = if (!r.isNullAt(9)) r.getDouble(9) else 0.0
        val low = if (nNz > 0 && w2 != 0.0) w1 / w2 else 0.0
        val w = Winner(cid, r.getSeq[String](1), ep, high, low, high - low)
        opt.trace(s"element ${w.key.mkString("(", ", ", ")")} ep score ${w.ep} " +
          s"high ${w.high} low ${w.low} risk ${w.risk}")
        w
      }.find(_.risk >= opt.riskThreshold).map(cid -> _)
    }
  }

  /** One remove-and-repeat iteration (reference search_anomaly,
    * riskloc.py:99-159) in at most TWO multi-cuboid passes:
    *
    *  - stage 1 covers layer 1: one expand-aggregate yields every
    *    attribute's element sums (for candidates AND this iteration's
    *    prune additions), then the batched risk passes; a layer-1 winner
    *    ends the iteration -- the common case, and the early exit that
    *    matters at scale;
    *  - stage 2 (only when layer 1 has no winner) covers ALL deeper
    *    layers in one expand-aggregate + risk pass; the reference's
    *    layer-by-layer early exit becomes a driver-side selection order
    *    over the collected winners, costing zero extra Spark jobs.
    *
    * Prune-state visibility matches the reference exactly: layer-1
    * cuboids see the iteration-start state (additions for attr X only
    * land after X's own aggregation), deeper cuboids see this
    * iteration's additions (riskloc.py:108-117). */
  private def searchAnomaly(
      df: DataFrame,
      attributes: Seq[String],
      adjEpThreshold: Double,
      pruned: collection.mutable.Map[String, collection.mutable.ArrayBuffer[String]],
      usePrune: Boolean,
      opt: Options): Option[RootCause] = {

    val spark = df.sparkSession
    import spark.implicits._
    val nAttrs = attributes.size
    def snapshotState: PruneState = pruned.iterator.map { case (k, v) => k -> v.toSeq }.toMap
    val prunedOld: PruneState = if (usePrune) snapshotState else Map.empty

    // ---- stage 1: layer 1
    opt.trace("Layer: 1")
    val layer1 = attributes.map(Seq(_)).zipWithIndex
    val exploded1 = expandCuboids(df, layer1, _ => prunedOld)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val epsA = exploded1
      .groupBy(col("cb.cid").as("cid"), col("cb.key").as("key"))
      .agg(graft.functions.Scores.pandasSum(col("ep")).as("ep"),
        sum("ep_z").as("ep_z"), sum("partition").as("part_sum"))
      .collect()

    if (usePrune) {
      // riskloc.py:89-96: prune layer-1 elements that are entirely normal
      // or below the adjusted EP threshold
      epsA.foreach { r =>
        if (r.getDouble(3) < adjEpThreshold || r.getLong(4) == 0)
          pruned.getOrElseUpdate(attributes(r.getInt(0)),
            collection.mutable.ArrayBuffer.empty[String]) += r.getSeq[String](1).head
      }
    }
    val prunedNew: PruneState = if (usePrune) snapshotState else Map.empty

    val candL1 = epsA.toSeq
      .filter(r => r.getLong(4) > 0 && r.getDouble(2) > adjEpThreshold)
      .map(r => (r.getInt(0), r.getSeq[String](1), r.getDouble(2)))
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(-_._3).take(opt.maxCandidatesPerCuboid)
      }

    val winner1 =
      if (candL1.isEmpty) None
      else riskWinners(exploded1, candL1.toDF("cid", "key", "ep"), opt,
          cid => Seq(attributes(cid)))
        .values.toSeq.sortBy(w => (-w.ep, w.cid)).headOption
    exploded1.unpersist()
    winner1 match {
      case Some(w) =>
        val cuboid = Seq(attributes(w.cid))
        return Some(RootCause(Seq(Element(cuboid, w.key)), cuboid, 1,
          Map("ep" -> w.ep, "high_risk" -> w.high, "low_risk" -> w.low, "risk" -> w.risk)))
      case None => ()
    }
    if (nAttrs == 1) return None

    // ---- stage 2: every deeper layer in one pass
    opt.trace(s"Layers 2-$nAttrs (single batched pass)")
    val deep = (2 to nAttrs).flatMap(l => attributes.combinations(l).toSeq)
      .zipWithIndex.map { case (c, i) => (c, i + nAttrs) }
    val deepCuboids = deep.map(_._1)
    def layerOf(cid: Int): Int = deepCuboids(cid - nAttrs).size

    val exploded2 = expandCuboids(df, deep, _ => prunedNew)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val candsDeep = exploded2
      .groupBy(col("cb.cid").as("cid"), col("cb.key").as("key"))
      .agg(graft.functions.Scores.pandasSum(col("ep")).as("ep"), sum("partition").as("part_sum"))
      .filter(col("part_sum") > 0 && col("ep") > adjEpThreshold)
      .select("cid", "key", "ep")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("cid").orderBy(desc("ep"))))
      .filter(col("rn") <= opt.maxCandidatesPerCuboid)
      .drop("rn")
      .persist(StorageLevel.MEMORY_AND_DISK)

    val winners = riskWinners(exploded2, candsDeep, opt, cid => deepCuboids(cid - nAttrs))
    exploded2.unpersist(); candsDeep.unpersist()

    (2 to nAttrs).iterator
      .map(layer => winners.values.filter(w => layerOf(w.cid) == layer).toSeq
        .sortBy(w => (-w.ep, w.cid)).headOption)
      .collectFirst { case Some(w) =>
        val cuboid = deepCuboids(w.cid - nAttrs)
        RootCause(Seq(Element(cuboid, w.key)), cuboid, cuboid.size,
          Map("ep" -> w.ep, "high_risk" -> w.high, "low_risk" -> w.low, "risk" -> w.risk))
      }
  }

  /** Full RiskLoc: score, then remove-and-repeat search
    * (riskloc.py:162-215). */
  def run(df0: DataFrame, attributes: Seq[String], opt: Options = Options()): Seq[RootCause] = {
    val (scored0, adjEpThreshold, base) = score(df0, opt)
    var df = scored0.persist(StorageLevel.MEMORY_AND_DISK)
    df.count() // materialize before the loop
    base.unpersist()

    val pruned = collection.mutable.Map.empty[String, collection.mutable.ArrayBuffer[String]]
    val usePrune = opt.pruneElements
    val rootCauses = collection.mutable.ArrayBuffer.empty[RootCause]

    var continue = true
    while (continue) {
      val epSumRow = df.filter(col("partition") === 1)
        .agg(graft.functions.Scores.pandasSum(col("ep"))).collect()(0)
      val anomalyEpSum = if (epSumRow.isNullAt(0)) 0.0 else epSumRow.getDouble(0)
      opt.trace(s"Iteration ${rootCauses.size + 1}: anomalous ep sum $anomalyEpSum " +
        s"threshold $adjEpThreshold")
      if (anomalyEpSum < adjEpThreshold) continue = false
      else {
        val found = searchAnomaly(df, attributes, adjEpThreshold, pruned, usePrune, opt)
        found match {
          case None => continue = false
          case Some(rc) =>
            opt.trace(s"New best score: ${rc.labels.mkString(";")} risk ${rc.scores("risk")}")
            rootCauses += rc
            val mask = rc.cuboid.zip(rc.elements.head.pairs.map(_._2))
              .map { case (a, v) => col(a) === v }.reduce(_ && _)
            val next = df.filter(!mask).localCheckpoint(true)
            df.unpersist()
            df = next
        }
      }
    }
    df.unpersist()
    rootCauses.toSeq
  }

  /** Canonical prediction strings. */
  def predictions(rcs: Seq[RootCause]): Seq[String] =
    graft.model.Labels.canonicalPredictions(rcs.flatMap(_.labels))
}
