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
      maxCandidatesPerCuboid: Int = 10000)

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
    val epSumRow = df.filter(col("partition") === 1).agg(sum("ep")).collect()(0)
    val epSum = if (epSumRow.isNullAt(0)) 0.0 else epSumRow.getDouble(0)
    val (dfSigned, anomalyEpSum) =
      if (epSum < 0) (df.withColumn("ep", -col("ep")), -epSum) else (df, epSum)
    val scored = dfSigned
      .withColumn("ep_z", when(col("ep") > 0, col("ep")).otherwise(0.0))
    (scored, anomalyEpSum * opt.pepThreshold, base)
  }

  /** One layer's search over all its cuboids with a single expand-aggregate
    * plus two batched risk passes. Returns the best root cause (max EP among
    * each cuboid's first risk-passing candidate in EP-desc order), matching
    * the reference's sequential scan semantics (riskloc.py:99-159). */
  private def searchLayer(
      df: DataFrame,
      attributes: Seq[String],
      layer: Int,
      adjEpThreshold: Double,
      pruned: collection.mutable.Map[String, collection.mutable.ArrayBuffer[String]],
      opt: Options): Option[RootCause] = {

    val cuboids = attributes.combinations(layer).toSeq // lexicographic, = itertools order
    val spark = df.sparkSession

    // Expand: one array element per cuboid; null when the row is pruned for
    // that cuboid. Pruned lists stay small (bounded by layer-1 attribute
    // cardinality); swap isin for a broadcast anti-join if they ever grow.
    val structs = cuboids.zipWithIndex.map { case (c, i) =>
      val pruneOk = c
        .flatMap(a => pruned.get(a).filter(_.nonEmpty)
          .map(vals => !col(a).isin(vals.toSeq: _*)))
        .reduceOption(_ && _).getOrElse(lit(true))
      when(pruneOk, struct(lit(i).as("cid"), array(c.map(col): _*).as("key")))
        .otherwise(lit(null))
    }
    val exploded = df
      .withColumn("cb", explode(array(structs: _*)))
      .filter(col("cb").isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)

    val eps = exploded
      .groupBy(col("cb.cid").as("cid"), col("cb.key").as("key"))
      .agg(sum("ep").as("ep"), sum("ep_z").as("ep_z"), sum("partition").as("part_sum"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Layer-1 element pruning (riskloc.py:89-96): prune elements that are
    // entirely normal or below the adjusted EP threshold.
    if (layer == 1 && pruned != null) {
      eps.filter(col("ep_z") < adjEpThreshold || col("part_sum") === 0)
        .select(col("cid"), col("key").getItem(0))
        .collect()
        .foreach { r =>
          pruned.getOrElseUpdate(cuboids(r.getInt(0)).head,
            collection.mutable.ArrayBuffer.empty[String]) += r.getString(1)
        }
    }

    // Candidates: anomalous elements above the adjusted EP threshold,
    // capped PER CUBOID (highest-EP first — the reference scans each
    // cuboid's candidates in EP-desc order, so a cap only ever drops the
    // tail of that scan, never another cuboid's head).
    val candKeys = eps
      .filter(col("part_sum") > 0 && col("ep") > adjEpThreshold)
      .select("cid", "key", "ep")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("cid").orderBy(desc("ep"))))
      .filter(col("rn") <= opt.maxCandidatesPerCuboid)
      .drop("rn")
      .persist(StorageLevel.MEMORY_AND_DISK)

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

    // Pass 2: ripple-adjusted mean |d| per candidate, using pass-1 ratios.
    val ratios = stats1.select(col("cid").as("rcid"), col("key").as("rkey"),
      when(col("spred") =!= 0, col("sreal") / col("spred")).otherwise(0.0).as("ratio"))
    val stats2 = exploded
      .join(broadcast(ratios),
        col("cb.cid") === col("rcid") && col("cb.key") === col("rkey"))
      .filter(nz)
      .withColumn("a", col("predict") * col("ratio"))
      .withColumn("d",
        when(col("a") + col("real") === 0, 0.0)
          .otherwise(lit(2.0) * (col("a") - col("real")) / (col("a") + col("real"))))
      .groupBy(col("rcid").as("cid"), col("rkey").as("key"))
      .agg(avg(abs(col("d"))).as("w1"))

    val collected = candKeys
      .join(stats1, Seq("cid", "key"))
      .join(stats2, Seq("cid", "key"), "left")
      .collect()

    exploded.unpersist(); eps.unpersist(); candKeys.unpersist()

    // Driver: per cuboid, scan candidates in EP-desc order; first with
    // risk >= threshold wins the cuboid; global best = max EP.
    val byCuboid = collected.groupBy(_.getInt(0))
    val winners = byCuboid.flatMap { case (cid, rows) =>
      val ordered = rows.sortBy(r => (-r.getDouble(2), r.getSeq[String](1).mkString("\u0000")))
      ordered.iterator.map { r =>
        val ep = r.getDouble(2)
        val wa = r.getDouble(3); val wn = r.getDouble(4)
        val high = wa / (wa + wn + 1.0)
        val w2 = if (r.isNullAt(7)) 0.0 else r.getDouble(7)
        val nNz = r.getLong(8)
        val w1 = if (r.schema.fieldNames.contains("w1") && !r.isNullAt(9)) r.getDouble(9) else 0.0
        val low = if (nNz > 0 && w2 != 0.0) w1 / w2 else 0.0
        val risk = high - low
        (cid, r.getSeq[String](1), ep, high, low, risk)
      }.find(_._6 >= opt.riskThreshold)
    }
    if (winners.isEmpty) None
    else {
      val best = winners.minBy { case (cid, _, ep, _, _, _) => (-ep, cid) }
      val cuboid = cuboids(best._1)
      Some(RootCause(
        elements = Seq(Element(cuboid, best._2)),
        cuboid = cuboid,
        layer = layer,
        scores = Map("ep" -> best._3, "high_risk" -> best._4,
          "low_risk" -> best._5, "risk" -> best._6)))
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
      val epSumRow = df.filter(col("partition") === 1).agg(sum("ep")).collect()(0)
      val anomalyEpSum = if (epSumRow.isNullAt(0)) 0.0 else epSumRow.getDouble(0)
      if (anomalyEpSum < adjEpThreshold) continue = false
      else {
        val found = (1 to attributes.size).iterator
          .map(layer => searchLayer(df, attributes, layer, adjEpThreshold,
            if (usePrune) pruned else collection.mutable.Map.empty, opt))
          .collectFirst { case Some(rc) => rc }
        found match {
          case None => continue = false
          case Some(rc) =>
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
