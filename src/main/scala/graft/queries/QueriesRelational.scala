package graft.queries

import graft.core.Tables
import graft.streaming.EventStreams
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational-surface entries (joins, aggregations, windows, set ops,
  * rollup) plus the streaming-shaped event aggregations, batch-replayed
  * for the oracle. Double aggregates are rounded to absorb
  * summation-order jitter; every query ends in a total ORDER BY.
  */
object QueriesRelational {
  import QueriesCore.Entry

  val entries: Seq[Entry] = Seq(

    // ===== Aggregation (TPC-H Q1 shape; partial agg + single shuffle) =====
    ("q1_agg",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_price,
        | round(avg(l_discount), 4) AS avg_disc,
        | CAST(count(*) AS BIGINT) AS n
        | FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        | GROUP BY l_returnflag, l_linestatus
        | ORDER BY l_returnflag, l_linestatus""".stripMargin.replace("\n", " "))),

    // ===== Join + agg + top-k (Q3 shape; customer side broadcastable) =====
    ("q3_top_orders",
      (s, d) => {
        val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy("l_orderkey")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        | FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        | WHERE c_mktsegment = 'BUILDING'
        | GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10"""
        .stripMargin.replace("\n", " "))),

    // ===== Multi-way join (Q5 shape; dim chain broadcast) =====
    ("q5_region_revenue",
      (s, d) => {
        val nat = Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        | FROM region
        |  JOIN nation ON n_regionkey = r_regionkey
        |  JOIN customer ON c_nationkey = n_nationkey
        |  JOIN orders ON o_custkey = c_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        | WHERE r_name = 'ASIA'
        | GROUP BY n_name ORDER BY revenue DESC, n_name"""
        .stripMargin.replace("\n", " "))),

    // ===== Window function (top-N per group) =====
    ("window_top_orders",
      (s, d) => Tables.orders(s, d)
        .withColumn("rnk", row_number().over(Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
        .filter(col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
        .orderBy("o_custkey", "rnk"),
      Some("""SELECT o_custkey, o_orderkey, rnk FROM (
        | SELECT o_custkey, o_orderkey,
        |  CAST(row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
        | FROM orders)
        | WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin.replace("\n", " "))),

    // ===== Set operation =====
    ("customers_without_orders",
      (s, d) => Tables.customer(s, d).select("c_custkey")
        .except(Tables.orders(s, d).select(col("o_custkey").as("c_custkey")))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey FROM customer
        | EXCEPT SELECT o_custkey FROM orders ORDER BY c_custkey"""
        .stripMargin.replace("\n", " "))),

    // ===== Rollup =====
    ("rollup_counts",
      (s, d) => Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("n"), col("sum_qty"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        | coalesce(l_linestatus, 'ALL') AS l_linestatus,
        | CAST(count(*) AS BIGINT) AS n,
        | round(sum(l_quantity), 2) AS sum_qty
        | FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        | ORDER BY l_returnflag, l_linestatus""".stripMargin.replace("\n", " "))),

    // ===== Streaming-shaped aggregations over events =====
    // (same transforms run on readStream; batch mode = the oracle path)
    ("events_tumbling",
      (s, d) => EventStreams.tumbling(
        EventStreams.withEventTime(Tables.events(s, d)))
        .orderBy("window_start", "event_type"),
      Some("""SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS window_start,
        | event_type, CAST(count(*) AS BIGINT) AS n,
        | round(sum(value), 4) AS sum_value
        | FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " "))),

    ("events_sliding",
      (s, d) => EventStreams.sliding(
        EventStreams.withEventTime(Tables.events(s, d)))
        .orderBy("window_start", "event_type"),
      Some("""SELECT ws AS window_start, event_type, CAST(count(*) AS BIGINT) AS n
        | FROM (SELECT (epoch_ns(ts) // 1800000000000) * 1800 - off AS ws, event_type
        |   FROM events CROSS JOIN (VALUES (0), (1800)) t(off))
        | GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " "))),

    ("events_distinct_users",
      (s, d) => Tables.events(s, d)
        .groupBy("event_type")
        .agg(count_distinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
        | CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        | CAST(count(*) AS BIGINT) AS n_events
        | FROM events GROUP BY event_type ORDER BY event_type"""
        .stripMargin.replace("\n", " "))),

    ("events_sessions",
      (s, d) => EventStreams.sessionCounts(
        EventStreams.withEventTime(Tables.events(s, d)))
        .orderBy("user_id"),
      Some("""WITH e2 AS (SELECT user_id, epoch_ns(ts) // 1000000000 AS sec
        |   FROM events),
        | m AS (SELECT user_id, sec,
        |  CASE WHEN sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec) > 1800
        |   THEN 1 ELSE 0 END AS brk FROM e2),
        | sess AS (SELECT user_id,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY sec
        |    ROWS UNBOUNDED PRECEDING) AS session_idx FROM m),
        | g AS (SELECT user_id, session_idx, COUNT(*) AS n_events
        |   FROM sess GROUP BY 1, 2)
        | SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |  CAST(SUM(n_events) AS BIGINT) AS n_events
        | FROM g GROUP BY user_id ORDER BY user_id""".stripMargin.replace("\n", " "))),
  )
}
