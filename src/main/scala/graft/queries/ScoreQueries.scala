package graft.queries

import graft.core.Tables
import graft.functions.Scores
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gate queries for the per-leaf score formulas (SURVEY.md §2.8 F1-F8).
  * A "leaf snapshot" in the reference is one row per attribute-value
  * combination with `real`/`predict` measures; here we derive one from the
  * harness tables: attributes (l_returnflag, l_linestatus, p_brand),
  * real = extended price, predict = discounted price. Measures are named
  * vreal/vpred (REAL is a DuckDB type keyword).
  */
object ScoreQueries {

  /** Shared snapshot: ~150 leaves at any SF (3 × 2 × 25 brands). */
  def snapshot(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
        col("p_brand").as("brand"))
      .agg(
        sum("l_extendedprice").as("vreal"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("vpred"))

  private val snapSql: String =
    """WITH snap AS (
      |  SELECT l_returnflag AS rf, l_linestatus AS ls, p_brand AS brand,
      |         sum(l_extendedprice) AS vreal,
      |         sum(l_extendedprice * (1 - l_discount)) AS vpred
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1, 2, 3)
      |""".stripMargin

  /** Broadcast 1-row totals instead of an all-rows window (which would
    * single-partition the frame). */
  private def totalsOver(df: DataFrame): DataFrame =
    df.crossJoin(broadcast(df.agg(
      sum("vreal").as("ta"), sum("vpred").as("tf"), count(lit(1)).as("tn"))))

  val defs: Seq[GateQuery] = Seq(

    // F1: explanatory power (utils/element_scores.py:11-26).
    GateQuery(
      "q21_ep",
      snapSql +
      """SELECT rf, ls, brand,
        |       round((vreal - vpred) /
        |             (sum(vreal) OVER () - sum(vpred) OVER ()), 6) AS ep
        |FROM snap
        |ORDER BY rf, ls, brand""".stripMargin) { (s, dir) =>
      totalsOver(snapshot(s, dir))
        .select(col("rf"), col("ls"), col("brand"),
          round(Scores.explanatoryPower(col("vreal"), col("vpred"), col("ta"), col("tf")), 6).as("ep"))
        .orderBy("rf", "ls", "brand")
    },

    // F2: surprise / JS divergence (utils/element_scores.py:39-54).
    GateQuery(
      "q22_surprise",
      snapSql +
      """SELECT rf, ls, brand,
        |       round(0.5 * (
        |         CASE WHEN vpred = 0 THEN 0 ELSE
        |           (vpred / sum(vpred) OVER ()) *
        |           ln(2 * (vpred / sum(vpred) OVER ()) /
        |              (vpred / sum(vpred) OVER () + vreal / sum(vreal) OVER ())) END +
        |         CASE WHEN vreal = 0 THEN 0 ELSE
        |           (vreal / sum(vreal) OVER ()) *
        |           ln(2 * (vreal / sum(vreal) OVER ()) /
        |              (vpred / sum(vpred) OVER () + vreal / sum(vreal) OVER ())) END), 9) AS surprise
        |FROM snap
        |ORDER BY rf, ls, brand""".stripMargin) { (s, dir) =>
      totalsOver(snapshot(s, dir))
        .select(col("rf"), col("ls"), col("brand"),
          round(Scores.surprise(col("vreal"), col("vpred"), col("ta"), col("tf")), 9).as("surprise"))
        .orderBy("rf", "ls", "brand")
    },

    // F3: deviation score (utils/element_scores.py:58-65).
    GateQuery(
      "q23_deviation",
      snapSql +
      """SELECT rf, ls, brand,
        |       round(CASE WHEN vpred + vreal = 0 THEN 0
        |                  ELSE 2 * (vpred - vreal) / (vpred + vreal) END, 9) AS deviation
        |FROM snap
        |ORDER BY rf, ls, brand""".stripMargin) { (s, dir) =>
      snapshot(s, dir)
        .select(col("rf"), col("ls"), col("brand"),
          round(Scores.deviationScore(col("vreal"), col("vpred")), 9).as("deviation"))
        .orderBy("rf", "ls", "brand")
    },

    // F4: ripple-effect expected value within a selection
    // (algorithms/hotspot.py:21-37) — selection = the returnflag group.
    GateQuery(
      "q24_ripple",
      snapSql +
      """SELECT rf, ls, brand,
        |       round(CASE WHEN sum(vpred) OVER (PARTITION BY rf) = 0 THEN 0
        |                  ELSE vpred - (sum(vpred) OVER (PARTITION BY rf) -
        |                                sum(vreal) OVER (PARTITION BY rf)) *
        |                       vpred / sum(vpred) OVER (PARTITION BY rf) END, 2) AS ripple
        |FROM snap
        |ORDER BY rf, ls, brand""".stripMargin) { (s, dir) =>
      val sel = Window.partitionBy("rf")
      snapshot(s, dir)
        .withColumn("fsel", sum("vpred").over(sel))
        .withColumn("vsel", sum("vreal").over(sel))
        .select(col("rf"), col("ls"), col("brand"),
          round(Scores.rippleExpectation(col("vpred"), col("fsel"), col("vsel")), 2).as("ripple"))
        .orderBy("rf", "ls", "brand")
    },

    // F6: influence degree via leave-one-out means
    // (algorithms/robustspot/ID_CA.py:12-26).
    GateQuery(
      "q25_influence",
      snapSql +
      """SELECT rf, ls, brand,
        |       round(1 - 1 / (abs(
        |         CASE WHEN (sum(vreal) OVER () - vreal) / (count(*) OVER () - 1)
        |                 - (sum(vpred) OVER () - vpred) / (count(*) OVER () - 1) = 0
        |              THEN 0
        |              ELSE (vreal - vpred) /
        |                   ((sum(vreal) OVER () - vreal) / (count(*) OVER () - 1)
        |                  - (sum(vpred) OVER () - vpred) / (count(*) OVER () - 1)) END) + 1), 6)
        |       AS influence
        |FROM snap
        |ORDER BY rf, ls, brand""".stripMargin) { (s, dir) =>
      val avgVLoo = (col("ta") - col("vreal")) / (col("tn") - 1)
      val avgFLoo = (col("tf") - col("vpred")) / (col("tn") - 1)
      val ratio = Scores.safeDiv(col("vreal") - col("vpred"), avgVLoo - avgFLoo)
      totalsOver(snapshot(s, dir))
        .select(col("rf"), col("ls"), col("brand"),
          round(lit(1) - lit(1) / (abs(ratio) + 1), 6).as("influence"))
        .orderBy("rf", "ls", "brand")
    },

    // F8 + A5: per-group share of the global real-predict gap.
    GateQuery(
      "q26_contribution",
      snapSql +
      """SELECT rf, ls, brand,
        |       round(CASE WHEN sum(vreal - vpred) OVER (PARTITION BY rf) = 0 THEN 0
        |                  ELSE (vreal - vpred) /
        |                       sum(vreal - vpred) OVER (PARTITION BY rf) END, 6) AS contribution
        |FROM snap
        |ORDER BY rf, ls, brand""".stripMargin) { (s, dir) =>
      val sel = Window.partitionBy("rf")
      snapshot(s, dir)
        .withColumn("gap_sel", sum(col("vreal") - col("vpred")).over(sel))
        .select(col("rf"), col("ls"), col("brand"),
          round(Scores.safeDiv(col("vreal") - col("vpred"), col("gap_sel")), 6).as("contribution"))
        .orderBy("rf", "ls", "brand")
    },
  )
}
