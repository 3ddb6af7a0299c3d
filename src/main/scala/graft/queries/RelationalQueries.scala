package graft.queries

import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator inventory (SURVEY.md §2.1-2.8): scans, filters,
  * joins, aggregations, grouping sets, windows, sorts, set ops. Each gate
  * query exercises one operator family over the harness parquet tables and
  * carries a DuckDB oracle.
  */
object RelationalQueries {

  val defs: Seq[GateQuery] = Seq(

    // S1/P1/P6/P7: scan + predicate pushdown + projection.
    GateQuery(
      "q01_filter_project",
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |       round(l_extendedprice, 2) AS price
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity >= 30
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R" && col("l_quantity") >= 30)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          round(col("l_extendedprice"), 2).as("price"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // A1/A6: grouped aggregation (TPC-H Q1 shape) — partial+final agg.
    GateQuery(
      "q02_agg_sum",
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2)  AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       count(*) AS cnt
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // A1-cube: grouping sets over the attribute lattice — the Spark-native
    // replacement for the reference's per-cuboid groupby loop
    // (algorithms/riskloc.py:100-112).
    GateQuery(
      "q03_cube",
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |       coalesce(l_linestatus, 'ALL') AS ls,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       count(*) AS cnt
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .cube("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("cnt"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("cnt"))
        .orderBy("rf", "ls")
    },

    // J1 + join reordering + broadcast of small dims: 5-table star join.
    GateQuery(
      "q04_join_star",
      """SELECT r_name, n_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       count(*) AS cnt
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("cnt"))
        .orderBy("r_name", "n_name")
    },

    // J3/J4: anti join (the reference's pruned-element removal,
    // algorithms/riskloc.py:75-86) — customers with no orders.
    GateQuery(
      "q05_join_anti",
      """SELECT c_mktsegment, count(*) AS n_cust,
        |       round(sum(c_acctbal), 2) AS sum_bal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 2).as("sum_bal"))
        .orderBy("c_mktsegment")
    },

    // P2-as-semi-join: parts with any lineitem, by brand.
    GateQuery(
      "q06_join_semi",
      """SELECT p_brand, count(*) AS n_parts
        |FROM part
        |WHERE p_size > 25
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin) { (s, dir) =>
      Tables.part(s, dir)
        .filter(col("p_size") > 25)
        .join(Tables.lineitem(s, dir), col("p_partkey") === col("l_partkey"), "left_semi")
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_parts"))
        .orderBy("p_brand")
    },

    // W1: ordered cumulative sum (Adtributor's cumulative-EP scan,
    // algorithms/adtributor.py:31-35).
    GateQuery(
      "q07_window_cumsum",
      """SELECT o_custkey, o_orderkey,
        |       round(sum(o_totalprice) OVER (
        |         PARTITION BY o_custkey
        |         ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum("o_totalprice").over(w), 2).as("cum_spend"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // W2/O1: per-group top-n via ranking window.
    GateQuery(
      "q08_window_topn",
      """SELECT * FROM (
        |  SELECT l_orderkey, l_linenumber,
        |         row_number() OVER (
        |           PARTITION BY l_orderkey
        |           ORDER BY l_extendedprice DESC, l_linenumber) AS rn
        |  FROM lineitem) t
        |WHERE rn <= 3
        |ORDER BY l_orderkey, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("l_orderkey")
        .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("l_orderkey", "rn")
    },

    // W5/J5: trailing-window forecast — the RobustSpot "mean of previous 4
    // periods per leaf" (utils/robustspot_data_utils.py:33-39), as a window
    // instead of the reference's O(n²) python loop.
    GateQuery(
      "q09_forecast_lag",
      """SELECT event_id,
        |       round(coalesce(avg(value) OVER (
        |         PARTITION BY user_id, event_type
        |         ORDER BY ts, event_id
        |         ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING), 0), 4) AS forecast
        |FROM events
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
        .rowsBetween(-4, -1)
      Tables.events(s, dir)
        .select(col("event_id"),
          round(coalesce(avg("value").over(w), lit(0.0)), 4).as("forecast"))
        .orderBy("event_id")
    },

    // W4: rolling mean over an ordered aggregate (density smoothing analog,
    // algorithms/squeeze/clustering/density_cluster.py:11-15).
    GateQuery(
      "q10_rolling_daily",
      """WITH daily AS (
        |  SELECT CAST(l_shipdate AS DATE) AS day,
        |         round(sum(l_extendedprice), 2) AS rev
        |  FROM lineitem GROUP BY 1)
        |SELECT strftime(day, '%Y-%m-%d') AS day_s,
        |       round(avg(rev) OVER (
        |         ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS ma3
        |FROM daily
        |ORDER BY day_s""".stripMargin) { (s, dir) =>
      val daily = Tables.lineitem(s, dir)
        .groupBy(to_date(col("l_shipdate")).as("day"))
        .agg(round(sum("l_extendedprice"), 2).as("rev"))
      val w = Window.orderBy("day").rowsBetween(-2, Window.currentRow)
      daily
        .select(date_format(col("day"), "yyyy-MM-dd").as("day_s"),
          round(avg("rev").over(w), 2).as("ma3"))
        .orderBy("day_s")
    },

    // O1: global top-k with deterministic tie-break.
    GateQuery(
      "q11_topk",
      """SELECT c_custkey, c_name, round(c_acctbal, 2) AS bal
        |FROM customer
        |ORDER BY c_acctbal DESC, c_custkey
        |LIMIT 10""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("bal"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .limit(10)
    },

    // U1: vertical union of per-source aggregates (adtributor.py:13).
    GateQuery(
      "q12_union",
      """SELECT side, nationkey, n, round(bal, 2) AS bal FROM (
        |  SELECT 'customer' AS side, c_nationkey AS nationkey,
        |         count(*) AS n, sum(c_acctbal) AS bal
        |  FROM customer GROUP BY 1, 2
        |  UNION ALL
        |  SELECT 'supplier' AS side, s_nationkey AS nationkey,
        |         count(*) AS n, sum(s_acctbal) AS bal
        |  FROM supplier GROUP BY 1, 2) u
        |ORDER BY side, nationkey""".stripMargin) { (s, dir) =>
      val c = Tables.customer(s, dir).groupBy(col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n"), sum("c_acctbal").as("bal"))
        .withColumn("side", lit("customer"))
      val su = Tables.supplier(s, dir).groupBy(col("s_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n"), sum("s_acctbal").as("bal"))
        .withColumn("side", lit("supplier"))
      c.unionByName(su)
        .select(col("side"), col("nationkey"), col("n"), round(col("bal"), 2).as("bal"))
        .orderBy("side", "nationkey")
    },

    // A8/A10/U2: distinct tuples.
    GateQuery(
      "q13_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus
        |FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus")
    },

    // A5: conditional aggregation — sum(when(...)) replaces the reference's
    // per-candidate boolean-mask scans (algorithms/riskloc.py:51-52).
    GateQuery(
      "q14_conditional_agg",
      """SELECT l_linestatus,
        |       round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END), 2) AS qty_r,
        |       round(sum(l_quantity), 2) AS qty_all,
        |       count(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_disc
        |FROM lineitem
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_linestatus")
        .agg(
          round(sum(when(col("l_returnflag") === "R", col("l_quantity")).otherwise(0.0)), 2).as("qty_r"),
          round(sum("l_quantity"), 2).as("qty_all"),
          count(when(col("l_discount") > 0.05, lit(1))).as("n_disc"))
        .orderBy("l_linestatus")
    },

    // A4: global scalars in one pass.
    GateQuery(
      "q15_global_sums",
      """SELECT round(sum(l_quantity), 2) AS total_qty,
        |       round(sum(l_extendedprice), 2) AS total_price,
        |       count(*) AS n_rows,
        |       count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir).agg(
        round(sum("l_quantity"), 2).as("total_qty"),
        round(sum("l_extendedprice"), 2).as("total_price"),
        count(lit(1)).as("n_rows"),
        countDistinct("l_orderkey").as("n_orders"))
    },

    // A6: mean / population stddev (cluster statistics,
    // algorithms/squeeze/squeeze.py:246-247).
    GateQuery(
      "q16_mean_std",
      """SELECT l_returnflag,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(stddev_pop(l_quantity), 4) AS std_qty,
        |       round(avg(l_discount), 4) AS avg_disc
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(stddev_pop("l_quantity"), 4).as("std_qty"),
          round(avg("l_discount"), 4).as("avg_disc"))
        .orderBy("l_returnflag")
    },

    // A7: deterministic mode (most frequent value with count-desc,
    // value-asc tie-break) — RobustSpot's per-column mode itemsets
    // (algorithms/robustspot/mining.py:9-13).
    GateQuery(
      "q17_mode",
      """SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt FROM (
        |  SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
        |         row_number() OVER (
        |           PARTITION BY o_orderstatus
        |           ORDER BY count(*) DESC, o_orderpriority) AS rn
        |  FROM orders GROUP BY o_orderstatus, o_orderpriority) t
        |WHERE rn = 1
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val counts = Tables.orders(s, dir)
        .groupBy("o_orderstatus", "o_orderpriority").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("cnt").desc, col("o_orderpriority"))
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"), col("cnt"))
        .orderBy("o_orderstatus")
    },

    // A9: value-counts → support ratios (mining.py:33-52).
    GateQuery(
      "q18_value_counts",
      """SELECT event_type, count(*) AS cnt,
        |       round(count(*) * 1.0 / sum(count(*)) OVER (), 6) AS support
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      val counted = Tables.events(s, dir).groupBy("event_type").agg(count(lit(1)).as("cnt"))
      counted.crossJoin(broadcast(counted.agg(sum("cnt").as("__tot"))))
        .select(col("event_type"), col("cnt"),
          round(col("cnt") * lit(1.0) / col("__tot"), 6).as("support"))
        .orderBy("event_type")
    },

    // M7: row expansion via explode(array_repeat) — RobustSpot
    // oversampling (select_expand.py:72-81). Oracle uses the closed-form
    // weighted count, proving the expansion multiplicities.
    GateQuery(
      "q19_explode_repeat",
      """SELECT o_orderstatus,
        |       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 3
        |                     WHEN o_orderpriority = '2-HIGH' THEN 2
        |                     ELSE 1 END) AS BIGINT) AS n
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val times = when(col("o_orderpriority") === "1-URGENT", 3)
        .when(col("o_orderpriority") === "2-HIGH", 2).otherwise(1)
      Tables.orders(s, dir)
        .withColumn("dup", explode(array_repeat(lit(1), times)))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    },

    // F10: canonical root-cause label codec — sorted `&`-joined pairs,
    // `;`-separated elements (utils/evaluation.py:49-60).
    GateQuery(
      "q20_label_codec",
      """WITH elems AS (
        |  SELECT DISTINCT
        |    'l_linestatus=' || l_linestatus || '&' || 'l_returnflag=' || l_returnflag AS elem
        |  FROM lineitem)
        |SELECT string_agg(elem, ';' ORDER BY elem) AS label FROM elems""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .select(concat(lit("l_linestatus="), col("l_linestatus"),
          lit("&"), lit("l_returnflag="), col("l_returnflag")).as("elem"))
        .distinct()
        .agg(array_join(array_sort(collect_list("elem")), ";").as("label"))
    },
  )
}
