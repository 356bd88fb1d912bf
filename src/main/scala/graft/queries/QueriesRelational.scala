package graft.queries

import graft.core.Tables
import graft.pipeline.TimeSeries
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

  /** ONE query string, executed verbatim by BOTH engines — the
    * SQL-surface parity proof: `spark.sql` over a registered view and
    * the DuckDB oracle run the identical dialect-common text.
    */
  private val SqlSurfaceQuery: String =
    "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, " +
      "round(SUM(l_quantity), 2) AS qty " +
      "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"

  val entries: Seq[Entry] = Seq(

    // spark.sql(...) as the query surface (not the DataFrame DSL):
    // the oracle IS the same string.
    ("sql_surface",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
        s.sql(SqlSurfaceQuery)
      },
      Some(SqlSurfaceQuery)),

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

    // ===== Correlated EXISTS → left-semi join (Q4 shape) =====
    // Orders with ≥1 returned line, counted per priority: the EXISTS
    // decorrelates to a left-semi hash join on the FK — no row
    // explosion however many lines match, and the probe side carries
    // only the join key (ReadSchema is 1 column + the pushed
    // returnflag filter).
    ("q4_priority_exists",
      (s, d) => Tables.orders(s, d)
        .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
            .select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        | FROM orders WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        | GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " "))),

    // ===== Selective scan-aggregate (Q6 shape) =====
    // The pushdown showcase: both predicates and the two-column
    // projection reach the parquet scan (PushedFilters + ReadSchema),
    // and the only exchange is the single-row partial-agg gather —
    // at 100 TB this query's cost is IO after row-group pruning,
    // nothing else.
    ("q6_selective_revenue",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue")),
      Some("""SELECT round(SUM(l_extendedprice * l_discount), 2) AS revenue
        | FROM lineitem
        | WHERE l_discount BETWEEN CAST(0.05 AS DOUBLE) AND CAST(0.07 AS DOUBLE)
        |  AND l_quantity < 24""".stripMargin.replace("\n", " "))),

    // ===== Outer-join distribution (Q13 shape) =====
    // Orders-per-customer histogram INCLUDING zero-order customers:
    // left outer join preserves them (COUNT of the nullable FK counts
    // only matches), then a second, histogram-sized aggregation.
    ("q13_order_distribution",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc),
      Some("""SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
        | SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        | FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        | GROUP BY 1)
        | GROUP BY 1 ORDER BY custdist DESC, c_count DESC"""
        .stripMargin.replace("\n", " "))),

    // TPC-H Q18 shape (large-volume orders): the HAVING subquery is a
    // semi-join against the biggest table's own aggregate — at scale
    // the l_orderkey groupBy is the dominant shuffle and feeds BOTH
    // sides, so the plan aggregates lineitem ONCE, filters to the
    // qualifying keys, and joins orders + customer to the survivors
    // (orders co-keyed on the same key; customer is the broadcast dim).
    // Quantities are integral by generator contract — summed as LONG so
    // the oracle hash is order-independent.
    ("q18_large_orders",
      (s, d) => {
        val qty = Tables.lineitem(s, d)
          .groupBy("l_orderkey")
          .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
          .filter(col("sum_qty") > 250)
        Tables.orders(s, d)
          .join(qty, col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(Tables.customer(s, d)),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_totalprice"), col("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some("""SELECT c_name, c_custkey, o_orderkey, o_totalprice, sum_qty
        | FROM (SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |   FROM lineitem GROUP BY 1 HAVING sum_qty > 250) q
        | JOIN orders ON o_orderkey = l_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""
        .stripMargin.replace("\n", " "))),

    // One-pass table profiler (r8e): per-column row/non-null/distinct
    // counts + min/max — the data-quality snapshot every warehouse job
    // starts with. ONE aggregate over the scan computes every column's
    // stats (count-distinct plans via expand; at 100 TB swap in
    // approx_count_distinct / the KMV sketch, same contract as the
    // quantile entries), then a stack() unpivot to one row per column.
    ("table_profile",
      (s, d) => {
        val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
          "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
          "l_tax", "ship_us")
        val ld = Tables.lineitem(s, d)
          .withColumn("ship_us", unix_micros(col("l_shipdate")))
        val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
          count(col(c)).as(s"nn_$c"),
          count_distinct(col(c)).as(s"nd_$c"),
          round(min(col(c)).cast("double"), 4).as(s"mn_$c"),
          round(max(col(c)).cast("double"), 4).as(s"mx_$c")))
        val stackArgs = cols.map(c =>
          s"'$c', nn_$c, nd_$c, mn_$c, mx_$c").mkString(", ")
        ld.agg(aggs.head, aggs.tail: _*)
          .select(col("n_rows"), expr(s"stack(${cols.size}, $stackArgs) " +
            "AS (col_name, n_nonnull, n_distinct, min_val, max_val)"))
          .select("col_name", "n_rows", "n_nonnull", "n_distinct",
            "min_val", "max_val")
          .orderBy("col_name")
      },
      Some {
        val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
          "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
          "l_tax", "ship_us")
        val sels = cols.map(c =>
          s"SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
            s"CAST(COUNT($c) AS BIGINT) AS n_nonnull, " +
            s"CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct, " +
            s"round(CAST(MIN($c) AS DOUBLE), 4) AS min_val, " +
            s"round(CAST(MAX($c) AS DOUBLE), 4) AS max_val FROM ld")
          .mkString(" UNION ALL ")
        "WITH ld AS (SELECT *, epoch_us(l_shipdate) AS ship_us " +
          s"FROM lineitem) $sels ORDER BY col_name"
      }),

    // TPC-H Q2 shape (min-cost supplier): the argmin-per-group
    // join-back — aggregate lineitem once for the per-part minimum
    // price, join the (part, supplier) detail back on BOTH keys so
    // only argmin rows survive, then decorate with the broadcast
    // dims. MIN over doubles is order-independent (unlike SUM), and
    // the equality join compares the identical double — exact on any
    // partitioning. The fixture has no partsupp table; lineitem IS
    // the part↔supplier relation here.
    ("q2_min_price_supplier",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
        val minp = li.groupBy("l_partkey")
          .agg(min("l_extendedprice").as("min_price"))
          .withColumnRenamed("l_partkey", "mp_partkey")
        li.join(minp, col("l_partkey") === col("mp_partkey") &&
            col("l_extendedprice") === col("min_price"))
          .select(col("l_partkey").as("p_partkey"), col("l_suppkey"),
            round(col("min_price"), 2).as("min_price"))
          .distinct()
          .join(broadcast(Tables.part(s, d).filter(col("p_size") < 15)),
            Seq("p_partkey"))
          .join(broadcast(Tables.supplier(s, d)),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("p_partkey"), col("p_name"), col("s_name"),
            col("n_name"), col("min_price"))
          .orderBy("p_partkey", "s_name")
          .limit(200)
      },
      Some("""WITH mp AS (SELECT l_partkey, MIN(l_extendedprice) AS m
        |   FROM lineitem GROUP BY 1),
        | am AS (SELECT DISTINCT l.l_partkey AS p_partkey, l.l_suppkey,
        |   round(mp.m, 2) AS min_price
        |  FROM lineitem l JOIN mp ON mp.l_partkey = l.l_partkey
        |   AND l.l_extendedprice = mp.m)
        | SELECT p_partkey, p_name, s_name, n_name, min_price
        | FROM am JOIN part USING (p_partkey)
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON n_nationkey = s_nationkey
        | WHERE p_size < 15
        | ORDER BY p_partkey, s_name LIMIT 200"""
        .stripMargin.replace("\n", " "))),

    // Market-basket affinity (r8e): pair LIFT over order baskets —
    // lift(a,b) = P(a,b)/(P(a)·P(b)), the association-rule screen
    // behind every recommender bootstrap (and corpus_pmi's relational
    // twin). Pair generation is BASKET-LOCAL (the coPairs explode
    // shape — C(|basket|,2) per order, never a corpus self-join);
    // numerator/denominator are exact integer products, one final
    // division. Min support 3, top 30 by lift.
    ("basket_affinity",
      (s, d) => {
        val bp = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
          .distinct()
        val nBaskets = bp.select("ok").distinct().count() // one action
        val baskets = bp.groupBy("ok")
          .agg(sort_array(collect_set(col("p"))).as("ps"))
        val pc = baskets.select(explode(expr(
            """flatten(transform(ps, (x, i) ->
              | transform(slice(ps, i + 2, size(ps)),
              |   y -> struct(x AS pa, y AS pb))))""".stripMargin))
            .as("pr"))
          .groupBy(col("pr.pa").as("part_a"), col("pr.pb").as("part_b"))
          .agg(count(lit(1)).as("pair_cnt"))
          .filter(col("pair_cnt") >= 3)
        val cnt = bp.groupBy(col("p")).agg(count(lit(1)).as("c"))
        pc.join(cnt.select(col("p").as("part_a"), col("c").as("cnt_a")),
            Seq("part_a"))
          .join(cnt.select(col("p").as("part_b"), col("c").as("cnt_b")),
            Seq("part_b"))
          .select(col("part_a"), col("part_b"), col("pair_cnt"),
            col("cnt_a"), col("cnt_b"),
            round((col("pair_cnt") * lit(nBaskets)).cast("double") /
              (col("cnt_a") * col("cnt_b")).cast("double"), 6).as("lift"))
          .orderBy(col("lift").desc, col("part_a"), col("part_b"))
          .limit(30)
      },
      Some("""WITH bp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
        |   FROM lineitem),
        | n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS nb FROM bp),
        | cnt AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS c FROM bp GROUP BY 1),
        | pr AS (SELECT a.p AS pa, b.p AS pb FROM bp a
        |   JOIN bp b ON a.ok = b.ok AND a.p < b.p),
        | pc AS (SELECT pa, pb, CAST(COUNT(*) AS BIGINT) AS pair_cnt
        |   FROM pr GROUP BY 1, 2)
        | SELECT pa AS part_a, pb AS part_b, pair_cnt,
        |  ca.c AS cnt_a, cb.c AS cnt_b,
        |  round(CAST(pair_cnt * nb AS DOUBLE)
        |    / CAST(ca.c * cb.c AS DOUBLE), 6) AS lift
        | FROM pc JOIN cnt ca ON ca.p = pc.pa
        |  JOIN cnt cb ON cb.p = pc.pb CROSS JOIN n
        | WHERE pair_cnt >= 3
        | ORDER BY lift DESC, part_a, part_b LIMIT 30"""
        .stripMargin.replace("\n", " "))),

    // TPC-H Q7 shape (volume shipping between nation PAIRS): the
    // disjunctive cross-dimension join — customer nation and supplier
    // nation must form one of two ordered country pairs, expressed as
    // a predicate over the two broadcast dim chains (never a union of
    // two full scans). Integer-cents revenue by ship year.
    ("q7_nation_volume",
      (s, d) => {
        val cents = round(col("l_extendedprice") * (lit(1.0) -
          col("l_discount")) * 100, 0).cast("long")
        val custNation = broadcast(Tables.customer(s, d)
          .join(Tables.nation(s, d),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name").as("cust_nation")))
        val suppNation = broadcast(Tables.supplier(s, d)
          .join(Tables.nation(s, d),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation")))
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(custNation, col("o_custkey") === col("c_custkey"))
          .join(suppNation, col("l_suppkey") === col("s_suppkey"))
          .filter((col("cust_nation") === "NATION_0" &&
              col("supp_nation") === "NATION_1") ||
            (col("cust_nation") === "NATION_1" &&
              col("supp_nation") === "NATION_0"))
          .groupBy(col("cust_nation"), col("supp_nation"),
            year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(sum(cents).as("revenue_cents"), count(lit(1)).as("n"))
          .orderBy("cust_nation", "supp_nation", "l_year")
      },
      Some("""SELECT cust_nation, supp_nation, l_year,
        | CAST(SUM(CAST(round(l_extendedprice * (CAST(1.0 AS DOUBLE)
        |   - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        | CAST(COUNT(*) AS BIGINT) AS n
        | FROM (SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
        |   CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |   l_extendedprice, l_discount
        |  FROM lineitem
        |   JOIN orders ON o_orderkey = l_orderkey
        |   JOIN customer ON c_custkey = o_custkey
        |   JOIN nation cn ON cn.n_nationkey = c_nationkey
        |   JOIN supplier ON s_suppkey = l_suppkey
        |   JOIN nation sn ON sn.n_nationkey = s_nationkey
        |  WHERE (cn.n_name = 'NATION_0' AND sn.n_name = 'NATION_1')
        |   OR (cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_0'))
        | GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""
        .stripMargin.replace("\n", " "))),

    // TPC-H Q11 shape (important stock): per-key value share against a
    // GLOBAL scalar — the global (sum, count) broadcasts back into the
    // HAVING as a 1-row frame (never a single-partition window). Money
    // is summed as exact integer CENTS (per-row round then LONG) and
    // the "> 1.5× the average part value" cutoff is the all-integer
    // cross-multiplication 2·v·n > 3·total, so the comparison can
    // never flip on summation-order ulps AND stays scale-invariant
    // (an absolute share threshold empties as the part count grows).
    ("q11_important_parts",
      (s, d) => {
        val cents = round(col("l_extendedprice") * 100, 0).cast("long")
        val perPart = Tables.lineitem(s, d)
          .groupBy("l_partkey").agg(sum(cents).as("value_cents"))
        val total = perPart.agg(sum("value_cents").as("total_cents"),
          count(lit(1)).as("n_parts"))
        perPart.join(broadcast(total))
          .filter(col("value_cents") * col("n_parts") * 2L >
            col("total_cents") * 3L)
          .select(col("l_partkey"), col("value_cents"))
          .orderBy(col("value_cents").desc, col("l_partkey"))
          .limit(100)
      },
      Some("""WITH pp AS (SELECT l_partkey,
        |   CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
        |     AS BIGINT) AS value_cents
        |  FROM lineitem GROUP BY 1),
        | t AS (SELECT CAST(SUM(value_cents) AS BIGINT) AS total_cents,
        |   CAST(COUNT(*) AS BIGINT) AS n_parts FROM pp)
        | SELECT l_partkey, value_cents FROM pp CROSS JOIN t
        | WHERE value_cents * n_parts * 2 > total_cents * 3
        | ORDER BY value_cents DESC, l_partkey LIMIT 100"""
        .stripMargin.replace("\n", " "))),

    // TPC-H Q15 shape (top supplier, WITH TIES): revenue per supplier
    // over a ship-date window, keep every supplier matching the global
    // maximum — the max is a 1-row broadcast joined back (the Q11
    // pattern), not a sort or a single-partition window. Integer-cents
    // revenue makes "equals the max" exact on any partitioning.
    ("q15_top_supplier",
      (s, d) => {
        val cents = round(col("l_extendedprice") * (lit(1.0) -
          col("l_discount")) * 100, 0).cast("long")
        val rev = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= to_timestamp(lit("1995-01-01")) &&
            col("l_shipdate") < to_timestamp(lit("1996-04-01")))
          .groupBy("l_suppkey").agg(sum(cents).as("revenue_cents"))
        val mx = rev.agg(max("revenue_cents").as("max_cents"))
        rev.join(broadcast(mx), col("revenue_cents") === col("max_cents"))
          .join(broadcast(Tables.supplier(s, d)),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("revenue_cents"))
          .orderBy("s_suppkey")
      },
      Some("""WITH rev AS (SELECT l_suppkey,
        |   CAST(SUM(CAST(round(l_extendedprice * (CAST(1.0 AS DOUBLE)
        |     - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |   AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY 1)
        | SELECT s_suppkey, s_name, revenue_cents
        | FROM rev JOIN supplier ON s_suppkey = l_suppkey
        | WHERE revenue_cents = (SELECT MAX(revenue_cents) FROM rev)
        | ORDER BY s_suppkey""".stripMargin.replace("\n", " "))),

    // TPC-H Q17 shape (small-quantity revenue): the correlated
    // per-part AVG rewritten as aggregate-once + join-back. The
    // threshold 0.2·avg(qty) is derived from an exact integer SUM and
    // COUNT (quantities are integral by generator contract), so the
    // double division and compare are bit-identical in both engines.
    ("q17_small_quantity",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val avgQty = li.groupBy("l_partkey")
          .agg((sum(col("l_quantity").cast("long")).cast("double") /
            count(lit(1)).cast("double")).as("avg_qty"))
        val brandParts = broadcast(Tables.part(s, d)
          .filter(col("p_brand") === "Brand#1").select("p_partkey"))
        li.join(brandParts, col("l_partkey") === col("p_partkey"))
          .join(avgQty, Seq("l_partkey"))
          .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
          .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long"))
            .as("total_cents"))
          .select(expr("total_cents div 7").as("avg_yearly_cents"))
      },
      Some("""WITH aq AS (SELECT l_partkey,
        |   CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)
        |     / CAST(COUNT(*) AS DOUBLE) AS avg_qty
        |  FROM lineitem GROUP BY 1)
        | SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
        |   AS BIGINT) // 7 AS avg_yearly_cents
        | FROM lineitem l
        |  JOIN part p ON p.p_partkey = l.l_partkey AND p_brand = 'Brand#1'
        |  JOIN aq ON aq.l_partkey = l.l_partkey
        | WHERE l.l_quantity < CAST(0.2 AS DOUBLE) * aq.avg_qty"""
        .stripMargin.replace("\n", " "))),

    // TPC-H Q19 shape (disjunctive predicate pushdown): revenue under
    // an OR of three (brand, size-range, quantity-range) conjunctions.
    // Part is the broadcast dim; the disjunction stays a single
    // codegen'd predicate — no union-of-three-scans rewrite needed.
    ("q19_disjunctive_revenue",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val p = broadcast(Tables.part(s, d))
        val cond =
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(5, 20) &&
            col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(10, 40) &&
            col("l_quantity").between(20, 50))
        li.join(p, col("l_partkey") === col("p_partkey"))
          .filter(cond)
          .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long"))
            .as("revenue_cents"), count(lit(1)).as("n"))
      },
      Some("""SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
        |   AS BIGINT) AS revenue_cents, CAST(COUNT(*) AS BIGINT) AS n
        | FROM lineitem JOIN part ON p_partkey = l_partkey
        | WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity BETWEEN 1 AND 20)
        |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
        |    AND l_quantity BETWEEN 10 AND 30)
        |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40
        |    AND l_quantity BETWEEN 20 AND 50)"""
        .stripMargin.replace("\n", " "))),

    // TPC-H Q21 shape (the sole late supplier): EXISTS another
    // supplier in the order + NOT EXISTS another LATE supplier,
    // rewritten as ONE aggregation over (order, supplier, late)
    // flags joined back — lineitem shuffles once on l_orderkey
    // instead of three correlated probes. "Late" = shipped > 60 days
    // after the order date (the fixture has no commit/receipt dates).
    ("q21_waiting_supplier",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
            .select("o_orderkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_suppkey"),
            (col("l_shipdate") > col("o_orderdate") +
              expr("INTERVAL 60 DAYS")).as("late"))
        val perSupp = li.groupBy("l_orderkey", "l_suppkey")
          .agg(max(col("late")).as("late"))
        val perOrder = perSupp.groupBy("l_orderkey")
          .agg(count(lit(1)).as("n_supp"),
            sum(col("late").cast("long")).as("n_late"))
          .filter(col("n_supp") > 1 && col("n_late") === 1)
        perSupp.filter(col("late"))
          .join(perOrder, Seq("l_orderkey"))
          .join(broadcast(Tables.supplier(s, d)),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy("s_name").agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(50)
      },
      Some("""WITH f AS (SELECT l_orderkey, l_suppkey,
        |   MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
        |     THEN 1 ELSE 0 END) AS late
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  WHERE o_orderstatus = 'F' GROUP BY 1, 2),
        | po AS (SELECT l_orderkey, COUNT(*) AS n_supp,
        |   CAST(SUM(late) AS BIGINT) AS n_late FROM f GROUP BY 1)
        | SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        | FROM f JOIN po USING (l_orderkey)
        |  JOIN supplier ON s_suppkey = l_suppkey
        | WHERE f.late = 1 AND po.n_supp > 1 AND po.n_late = 1
        | GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 50"""
        .stripMargin.replace("\n", " "))),

    // TPC-H Q22 shape (lapsed wealthy customers): a GLOBAL scalar
    // threshold (avg positive balance, derived from exact integer
    // cents so the cutoff can't flip on summation order) broadcast
    // into the filter + LEFT ANTI join against RECENT orders (every
    // fixture customer has some order, so "idle" = none since
    // 2000-01-01 — the recency filter pushes into the orders scan),
    // rolled up by nation. The anti join is the scale shape for
    // NOT EXISTS.
    ("q22_idle_customers",
      (s, d) => {
        val cust = Tables.customer(s, d)
          .withColumn("bal_cents",
            round(col("c_acctbal") * 100, 0).cast("long"))
        val avgBal = cust.filter(col("bal_cents") > 0L)
          .agg((sum("bal_cents").cast("double") /
            count(lit(1)).cast("double")).as("avg_cents"))
        val recent = Tables.orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("2000-01-01")))
          .select(col("o_custkey"))
        cust.join(broadcast(avgBal))
          .filter(col("bal_cents").cast("double") > col("avg_cents"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .join(broadcast(Tables.nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("numcust"),
            sum("bal_cents").as("total_cents"))
          .orderBy("n_name")
      },
      Some("""WITH c AS (SELECT c_custkey, c_nationkey,
        |   CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer),
        | t AS (SELECT CAST(SUM(bal_cents) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS avg_cents
        |  FROM c WHERE bal_cents > 0)
        | SELECT n_name, CAST(COUNT(*) AS BIGINT) AS numcust,
        |  CAST(SUM(bal_cents) AS BIGINT) AS total_cents
        | FROM c CROSS JOIN t
        |  JOIN nation ON n_nationkey = c_nationkey
        | WHERE CAST(bal_cents AS DOUBLE) > avg_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2000-01-01')
        | GROUP BY n_name ORDER BY n_name"""
        .stripMargin.replace("\n", " "))),

    // Window-function surface in one entry (r8e): rank / dense_rank /
    // percent_rank / cume_dist / ntile / lag over the same per-customer
    // frame — every value either integer or an exact small-integer
    // rational (percent_rank = (rank−1)/(n−1)), so the doubles oracle
    // bit-for-bit. Output bounded to the top 3 orders per customer.
    ("window_functions_suite",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("rnk", rank().over(w).cast("long"))
          .withColumn("drnk", dense_rank().over(w).cast("long"))
          .withColumn("prnk", round(percent_rank().over(w), 6))
          .withColumn("cume", round(cume_dist().over(w), 6))
          .withColumn("quartile", ntile(4).over(w).cast("long"))
          .withColumn("price_drop",
            round(lag("o_totalprice", 1).over(w) - col("o_totalprice"), 2))
          .filter(col("rnk") <= 3)
          .orderBy("o_custkey", "rnk")
      },
      Some("""SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(rank() OVER w AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |  round(percent_rank() OVER w, 6) AS prnk,
        |  round(cume_dist() OVER w, 6) AS cume,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(lag(o_totalprice, 1) OVER w - o_totalprice, 2) AS price_drop
        | FROM orders
        | WINDOW w AS (PARTITION BY o_custkey
        |   ORDER BY o_totalprice DESC, o_orderkey))
        | WHERE rnk <= 3 ORDER BY o_custkey, rnk"""
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

    // Fixed-width histogram per event type: one partial-agg shuffle of
    // (type, bucket) — the distributed histogram shape (never a
    // per-group value buffer like exact percentiles need).
    ("events_histogram",
      (s, d) => Tables.events(s, d)
        .groupBy(col("event_type"),
          floor(col("value") / 10.0d).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "bucket"),
      Some("""SELECT event_type,
        | CAST(floor(value / CAST(10.0 AS DOUBLE)) AS BIGINT) AS bucket,
        | CAST(count(*) AS BIGINT) AS n
        | FROM events GROUP BY 1, 2 ORDER BY event_type, bucket"""
        .stripMargin.replace("\n", " "))),

    // ===== Cube =====
    ("cube_counts",
      (s, d) => Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
          col("n"))
        .orderBy("o_orderstatus", "o_orderpriority"),
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
        | coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
        | CAST(count(*) AS BIGINT) AS n
        | FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        | ORDER BY o_orderstatus, o_orderpriority"""
        .stripMargin.replace("\n", " "))),

    // GROUPING SETS (r8e): the general form rollup/cube specialize —
    // an explicit irregular set list ((status, priority), (status),
    // (segment), ()) that neither ROLLUP nor CUBE expresses, plus the
    // GROUPING() marker distinguishing "NULL because aggregated" from
    // a data NULL. Exact integer counts; grouping markers make the
    // sort total.
    ("grouping_sets_counts",
      (s, d) => {
        val j = Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)),
            col("o_custkey") === col("c_custkey"))
        j.groupingSets(
            Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
              Seq(col("o_orderstatus")), Seq(col("c_mktsegment")), Seq()),
            col("o_orderstatus"), col("o_orderpriority"),
            col("c_mktsegment"))
          .agg(count(lit(1)).as("n"),
            grouping(col("o_orderstatus")).cast("long").as("g_status"),
            grouping(col("o_orderpriority")).cast("long").as("g_prio"),
            grouping(col("c_mktsegment")).cast("long").as("g_seg"))
          .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
            col("n"), col("g_status"), col("g_prio"), col("g_seg"))
          .orderBy("g_status", "g_prio", "g_seg", "status", "priority",
            "segment")
      },
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | coalesce(c_mktsegment, 'ALL') AS segment,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        | CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
        | CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_seg
        | FROM orders JOIN customer ON o_custkey = c_custkey
        | GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |   (o_orderstatus), (c_mktsegment), ())
        | ORDER BY g_status, g_prio, g_seg, status, priority, segment"""
        .stripMargin.replace("\n", " "))),

    // ===== Pivot =====
    // Spark's relational pivot operator; the oracle replays it with
    // FILTERed counts. Missing combinations: Spark pivot yields NULL,
    // coalesced to 0 to match COUNT FILTER's semantics.
    ("pivot_status_counts",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
        | CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
        | CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
        | CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
        | FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""
        .stripMargin.replace("\n", " "))),

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

    // Windowed top-k ("trending"): rank over the tumbling agg, planned
    // as WindowGroupLimit per-partition heaps — output k·windows rows.
    ("events_window_topk",
      (s, d) => EventStreams.topKPerWindow(
        EventStreams.withEventTime(Tables.events(s, d)))
        .orderBy("window_start", "rnk"),
      Some("""WITH c AS (
        |  SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS window_start,
        |   event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        | r AS (SELECT window_start, event_type, n, row_number() OVER
        |   (PARTITION BY window_start ORDER BY n DESC, event_type) AS rnk
        |  FROM c)
        | SELECT window_start, event_type, n, rnk FROM r WHERE rnk <= 3
        | ORDER BY window_start, rnk""".stripMargin.replace("\n", " "))),

    ("events_sliding",
      (s, d) => EventStreams.sliding(
        EventStreams.withEventTime(Tables.events(s, d)))
        .orderBy("window_start", "event_type"),
      Some("""SELECT ws AS window_start, event_type, CAST(count(*) AS BIGINT) AS n
        | FROM (SELECT (epoch_ns(ts) // 1800000000000) * 1800 - off AS ws, event_type
        |   FROM events CROSS JOIN (VALUES (0), (1800)) t(off))
        | GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " "))),

    // The FIRST-CLASS session operator: Spark's native session_window
    // (merging interval windows, streaming-state-compatible), beside
    // the lag+cumsum formulation events_sessions verifies. Second
    // precision on both sides; a gap of exactly the 30-min width starts
    // a new session (session_window's strict [start, start+gap) merge).
    ("events_session_windows",
      (s, d) => Tables.eventsNorm(s, d)
        .withColumn("t", timestamp_seconds(expr("ts_ns div 1000000000")))
        .groupBy(session_window(col("t"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_timestamp(col("session_window.start")).as("session_start"),
          unix_timestamp(col("session_window.end")).as("session_end"),
          col("n_events"))
        .orderBy("user_id", "session_start"),
      Some("""WITH e2 AS (SELECT user_id, epoch_ns(ts) // 1000000000 AS sec
        |   FROM events),
        | m AS (SELECT user_id, sec,
        |  CASE WHEN sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec)
        |    >= 1800 THEN 1 ELSE 0 END AS brk FROM e2),
        | sess AS (SELECT user_id, sec,
        |  SUM(brk) OVER (PARTITION BY user_id ORDER BY sec
        |    ROWS UNBOUNDED PRECEDING) AS si FROM m)
        | SELECT user_id, MIN(sec) AS session_start,
        |  MAX(sec) + 1800 AS session_end,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        | FROM sess GROUP BY user_id, si
        | ORDER BY user_id, session_start""".stripMargin.replace("\n", " "))),

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

    // Event-type transition matrix (r7): per-user consecutive-event
    // bigram counts in (event_id) order — the Markov/sequence-model
    // statistic (next-action prediction, funnel discovery). One
    // user-partitioned lag window + one pair-count partial agg;
    // event_id is the fixture's arrival order, so no timestamp-type
    // pitfalls enter the oracle.
    ("events_transitions",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("event_id")
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNotNull)
          .groupBy(col("prev_type"), col("event_type").as("next_type"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy("prev_type", "next_type")
      },
      Some("""WITH t AS (SELECT user_id, event_id, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
        |    AS prev_type FROM events)
        | SELECT prev_type, event_type AS next_type,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        | FROM t WHERE prev_type IS NOT NULL
        | GROUP BY 1, 2 ORDER BY prev_type, next_type"""
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

    // ===== Skew machinery, value-parity-proven =====
    // saltedJoin must equal the plain equi-join exactly; the oracle IS
    // the plain join. (ScaleSpec separately proves the plan shape:
    // per-key fan-out, deterministic salt.)
    ("salted_join_agg",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("okey"), col("l_quantity"))
        val ords = Tables.orders(s, d)
          .select(col("o_orderkey").as("okey"), col("o_orderstatus"))
        graft.pipeline.Scale.saltedJoin(li, ords, "okey", saltFactor = 8)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 4).as("qty"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        | round(SUM(l_quantity), 4) AS qty
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " "))),

    // Bloom-filter semi-join reduction (r8e): the runtime-filter
    // pattern — hash the filtered dim keys d ways into an m-bit
    // bitmap (bit_or word fold, ≤ m/64 rows), broadcast it, test
    // every fact key map-side with shift-and-mask probes before the
    // exact join. The fact table never shuffles; output quantifies
    // the reduction (pass/match/false-positive counts, and n_missed
    // proves no false negatives).
    ("bloom_semi_join",
      (s, d) => graft.pipeline.Scale.bloomSemiJoin(
        Tables.orders(s, d), "o_custkey",
        Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING"),
        "c_custkey", mBits = 8192, nHashes = 3),
      Some(graft.pipeline.Scale.bloomSemiJoinSql(
        "orders", "o_custkey",
        "SELECT DISTINCT c_custkey AS dk FROM customer " +
          "WHERE c_mktsegment = 'BUILDING'",
        mBits = 8192, nHashes = 3))),

    // Z-order layout key: interleave (orderkey, custkey) bits so a
    // z-sorted table's row-group stats bound tight 2-D rectangles —
    // data skipping on BOTH dimensions at rest. Same bit positions
    // generated into both engines' expressions.
    ("zorder_layout",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          graft.pipeline.Scale.zValue(
            pmod(col("o_orderkey"), lit(65536)),
            pmod(col("o_custkey"), lit(65536))).as("z"))
        .orderBy("z", "o_orderkey"),
      Some(s"""SELECT o_orderkey,
        | ${graft.pipeline.Scale.zValueSql("(o_orderkey % 65536)", "(o_custkey % 65536)")} AS z
        | FROM orders ORDER BY z, o_orderkey""".stripMargin.replace("\n", " "))),

    // Bounded per-group top-k through the native TopKBy aggregate
    // (ObjectHashAggregate with partial heaps: the exchange carries at
    // most k pairs per group per map partition, vs the window form
    // shuffling every row — the scale path for "best k docs per
    // source"). The oracle replays it as the window formulation, so
    // value parity also proves the two shapes equivalent.
    ("agg_topk_group",
      (s, d) => graft.pipeline.Scale.topKPerGroup(
        Tables.documents(s, d), Seq("source"), "doc_id",
        col("n_chars"), k = 5)
        .orderBy("source", "pos"),
      Some("""WITH r AS (SELECT source, doc_id,
        | row_number() OVER (PARTITION BY source
        |   ORDER BY n_chars DESC, doc_id) AS rk FROM documents)
        | SELECT source, CAST(rk - 1 AS INT) AS pos, doc_id
        | FROM r WHERE rk <= 5 ORDER BY source, pos"""
        .stripMargin.replace("\n", " "))),

    // ===== Distribution statistics =====
    // Exact interpolated percentiles per event type. Spark `percentile`
    // buffers each group's values, so this is the CORRECTNESS surface;
    // the 100-TB path is the sketch variant below (approx_percentile,
    // mergeable partial state, no per-group buffering).
    ("events_quantiles",
      (s, d) => Tables.events(s, d)
        .groupBy("event_type")
        .agg(round(percentile(col("value"), lit(0.5)), 4).as("p50"),
          round(percentile(col("value"), lit(0.9)), 4).as("p90"),
          round(percentile(col("value"), lit(0.99)), 4).as("p99"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
        | round(quantile_cont(value, 0.5), 4) AS p50,
        | round(quantile_cont(value, 0.9), 4) AS p90,
        | round(quantile_cont(value, 0.99), 4) AS p99
        | FROM events GROUP BY event_type ORDER BY event_type"""
        .stripMargin.replace("\n", " "))),

    // Sketch-based quantiles + distinct counts: the mergeable
    // (map-side-combinable) shapes a 100-TB aggregation actually runs.
    // No SQL oracle — sketch internals aren't reproducible in DuckDB —
    // so the driver records the weaker rows-only check; the exact twin
    // above is the value-level gate for the same surface.
    ("events_sketch_stats",
      (s, d) => Tables.events(s, d)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
          round(element_at(approx_percentile(col("value"),
            array(lit(0.5), lit(0.9)), lit(10000)), 1), 4).as("p50_approx"))
        .orderBy("event_type"),
      None),

    // KMV (k-minimum-values) distinct sketch — the oracle-portable
    // sketch: md5-hash values into (0, 2^32], keep the k smallest
    // distinct per group (WindowGroupLimit k-heaps), estimate
    // (k-1)/r_k. Unlike the HLL/KLL entry above, every step is exact
    // integer + one rounded division → full value-level oracle for the
    // sketch family. KMV state is mergeable (union, keep k smallest) —
    // the map-side-combinable property that makes it a 100-TB shape.
    ("events_kmv_distinct",
      (s, d) => graft.pipeline.Sketches.kmvDistinct(
          Tables.events(s, d), Seq("event_type"), "user_id", k = 64)
        .orderBy("event_type"),
      Some(graft.pipeline.Sketches.kmvDistinctSql(
        "events", Seq("event_type"), "user_id", k = 64))),

    // HyperLogLog distinct sketch (r8e): the register-based member of
    // the portable sketch family — bucket = low p bits of the shared
    // md5 hash, rho by an unrolled INTEGER threshold chain (no float
    // log2), register = max rho, harmonic denominator as an exact
    // integer sum of powers of two. Unlike KMV it never materializes
    // a distinct set: one (group, bucket) partial-agg shuffle with at
    // most 2^p surviving rows per group — the true 100-TB cardinality
    // shape, twinning approx_count_distinct with a value-level oracle.
    ("events_hll_distinct",
      (s, d) => graft.pipeline.Sketches.hllDistinct(
          Tables.events(s, d), Seq("event_type"), "user_id", p = 6)
        .orderBy("event_type"),
      Some(graft.pipeline.Sketches.hllDistinctSql(
        "events", Seq("event_type"), "user_id", p = 6))),

    // Resample-to-grid + forward-fill (gap filling): per event type,
    // 10-minute buckets over the type's own [min, max] range, observed
    // sums where data exists, latest-preceding value carried into the
    // gaps — the densification step before windowed features/models.
    // ~63% of grid cells are gaps at this span, so the fill path is
    // genuinely exercised.
    ("events_gapfill",
      (s, d) => TimeSeries.gapFill(
          Tables.eventsNorm(s, d).withColumn("ts_us", expr("ts_ns div 1000")),
          keyCol = "event_type", tsCol = "ts_us", valCol = "value",
          bucketSpan = 600000000L)
        .orderBy("event_type", "bucket"),
      Some("""WITH o AS (SELECT event_type, epoch_us(ts) // 600000000 AS bucket,
        |   round(sum(value), 4) AS v_obs FROM events GROUP BY 1, 2),
        | b AS (SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
        |   FROM o GROUP BY 1),
        | g AS (SELECT event_type, unnest(range(lo, hi + 1)) AS bucket FROM b),
        | j AS (SELECT g.event_type, g.bucket, o.v_obs FROM g LEFT JOIN o
        |   ON o.event_type = g.event_type AND o.bucket = g.bucket)
        | SELECT event_type, bucket, v_obs,
        |  last_value(v_obs IGNORE NULLS) OVER (PARTITION BY event_type
        |    ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |   AS v_filled,
        |  v_obs IS NULL AS is_gap
        | FROM j ORDER BY event_type, bucket""".stripMargin.replace("\n", " "))),

    // Changepoint detection (Page's CUSUM chart): per type, cumulative
    // sum of deviations from the type mean in (ts, event_id) order; the
    // row where |CUSUM| peaks is the candidate changepoint. Every
    // double quantity derives from the ORDERED cumulative sum (frame
    // order is identical on both engines — the events_rolling
    // contract), the mean included (final cum / n, not an unordered
    // AVG), so the 4-dp rounding compares bit-for-bit. One window
    // shuffle + a per-type top-1 (WindowGroupLimit heap).
    // Per-type OLS linear trend (r8e): slope + R² of value over time
    // from FIVE exact 128-bit moment sums (DECIMAL(38,0) / HUGEINT) —
    // partition-order-independent where double Σxy would drift; the
    // only floats are two final divisions from exact operands. One
    // partial-agg shuffle of 7 counters per key — the mergeable-
    // moments shape (a 10^9-event key ships 7 numbers per partition).
    ("events_linear_trend",
      (s, d) => TimeSeries.linearTrend(
          Tables.eventsNorm(s, d).withColumn("ts_us", expr("ts_ns div 1000")),
          keyCol = "event_type", tsUsCol = "ts_us", valCol = "value")
        .orderBy("event_type"),
      Some(TimeSeries.linearTrendSql("event_type"))),

    // Period-over-period movers (r8e): weekly integer-cents revenue
    // per type, lag(1) delta over the AGGREGATED series (weeks ×
    // types rows — the window runs on the tiny rollup, never raw
    // events), ranked by |delta|. The change-detection report every
    // metrics review starts with; all-integer until the final ratio.
    // The rollup is EventStreams.periodCents — mergeable counters that
    // also run as a live streaming aggregation (TopMoversStreamSpec
    // pins stream ≡ batch across arbitrary micro-batch splits).
    ("events_top_movers",
      (s, d) => EventStreams.topMovers(
          EventStreams.periodCents(
            Tables.eventsNorm(s, d)
              .withColumn("ts_us", expr("ts_ns div 1000")),
            keyCol = "event_type", tsUsCol = "ts_us", valCol = "value"),
          k = 20)
        .select(col("key").as("event_type"), col("period").as("week"),
          col("cents"), col("prev_cents"), col("delta_cents"),
          col("pct_change")),
      Some("""WITH wk AS (SELECT event_type,
        |   epoch_us(ts) // 604800000000 AS week,
        |   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |     AS cents
        |  FROM events GROUP BY 1, 2),
        | lg AS (SELECT event_type, week, cents,
        |   lag(cents, 1) OVER (PARTITION BY event_type ORDER BY week)
        |     AS prev_cents FROM wk)
        | SELECT event_type, week, cents, prev_cents,
        |  cents - prev_cents AS delta_cents,
        |  CASE WHEN prev_cents = 0 THEN CAST(0.0 AS DOUBLE)
        |   ELSE round(CAST(cents - prev_cents AS DOUBLE)
        |     / CAST(prev_cents AS DOUBLE), 6) END AS pct_change
        | FROM lg WHERE prev_cents IS NOT NULL
        | ORDER BY abs(cents - prev_cents) DESC, event_type, week
        | LIMIT 20""".stripMargin.replace("\n", " "))),

    ("events_cusum",
      (s, d) => {
        val ord = Window.partitionBy("event_type")
          .orderBy(col("ts_us"), col("event_id"))
        val cumW = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val allW = ord.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
        val typW = Window.partitionBy("event_type")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val scored = Tables.eventsNorm(s, d)
          .withColumn("ts_us", expr("ts_ns div 1000"))
          .withColumn("cum", sum("value").over(cumW))
          .withColumn("rn", row_number().over(ord))
          .withColumn("n", count(lit(1)).over(typW))
          .withColumn("tot", last("cum").over(allW))
          .withColumn("cusum",
            round(col("cum") - col("rn") * (col("tot") / col("n")), 4))
        val rk = Window.partitionBy("event_type")
          .orderBy(abs(col("cusum")).desc, col("event_id"))
        scored.withColumn("rk", row_number().over(rk))
          .filter(col("rk") === 1)
          .select(col("event_type"), col("event_id").as("cp_event_id"),
            col("cusum").as("cp_cusum"))
          .orderBy("event_type")
      },
      Some("""WITH c0 AS (SELECT event_type, event_id, epoch_us(ts) AS ts_us,
        |   SUM(value) OVER (PARTITION BY event_type
        |     ORDER BY epoch_us(ts), event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |   row_number() OVER (PARTITION BY event_type
        |     ORDER BY epoch_us(ts), event_id) AS rn,
        |   COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        | c AS (SELECT event_type, event_id, cum, rn, n,
        |   last_value(cum) OVER (PARTITION BY event_type
        |     ORDER BY ts_us, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS tot
        |  FROM c0),
        | d AS (SELECT event_type, event_id,
        |   round(cum - rn * (tot / n), 4) AS cusum FROM c),
        | f AS (SELECT event_type, event_id, cusum, row_number() OVER (
        |   PARTITION BY event_type ORDER BY abs(cusum) DESC, event_id) AS rk
        |  FROM d)
        | SELECT event_type, event_id AS cp_event_id, cusum AS cp_cusum
        | FROM f WHERE rk = 1 ORDER BY event_type"""
        .stripMargin.replace("\n", " "))),

    // Robust anomaly detection: per-type outlier counts under the
    // median-absolute-deviation rule (|v − med| > 5·MAD) — the
    // monitoring pass a pipeline runs over every numeric feed. Median
    // and MAD are 4-dp-rounded interpolated percentiles (the parity
    // events_quantiles already proves), so the threshold compare is
    // deterministic on both engines; the two tiny per-type stats
    // tables broadcast back over the scan.
    ("events_outliers",
      (s, d) => {
        val e = Tables.events(s, d)
        val med = e.groupBy("event_type")
          .agg(round(percentile(col("value"), lit(0.5)), 4).as("med"))
        val withMed = e.join(broadcast(med), Seq("event_type"))
        val mad = withMed.groupBy("event_type")
          .agg(round(percentile(abs(col("value") - col("med")), lit(0.5)), 4)
            .as("mad"))
        withMed.join(broadcast(mad), Seq("event_type"))
          .filter(abs(col("value") - col("med")) > col("mad") * lit(5.0))
          .groupBy("event_type").agg(count(lit(1)).as("n_outliers"))
          .orderBy("event_type")
      },
      Some("""WITH med AS (SELECT event_type,
        |   round(quantile_cont(value, 0.5), 4) AS med
        |  FROM events GROUP BY 1),
        | m2 AS (SELECT e.event_type, e.value, med.med
        |  FROM events e JOIN med USING (event_type)),
        | mad AS (SELECT event_type,
        |   round(quantile_cont(abs(value - med), 0.5), 4) AS mad
        |  FROM m2 GROUP BY 1)
        | SELECT m2.event_type, CAST(COUNT(*) AS BIGINT) AS n_outliers
        | FROM m2 JOIN mad USING (event_type)
        | WHERE abs(m2.value - m2.med) > mad.mad * CAST(5.0 AS DOUBLE)
        | GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " "))),

    // Rolling-frame analytics: per-user moving average over the
    // current + 3 preceding events in (time, event_id) order — the
    // ROWS-BETWEEN frame shape (distinct from the rank and cumulative
    // windows elsewhere). The ≤4-row frame sums left-to-right in frame
    // order on both engines, so the rounded double matches exactly.
    ("events_rolling",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(expr("ts_ns div 1000"), col("event_id"))
          .rowsBetween(-3, 0)
        Tables.eventsNorm(s, d)
          .withColumn("roll_avg", round(avg("value").over(w), 4))
          .select("event_id", "user_id", "value", "roll_avg")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, value,
        | round(avg(value) OVER (PARTITION BY user_id
        |   ORDER BY epoch_us(ts), event_id
        |   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS roll_avg
        | FROM events ORDER BY event_id""".stripMargin.replace("\n", " "))),

    // Count-min frequency sketch: per-user event-count estimates as
    // min over d salted-hash counter rows — the frequency member of
    // the portable sketch family (always >= truth, mergeable by
    // addition; the d*w counter table broadcasts into the lookup).
    ("events_cms_counts",
      (s, d) => graft.pipeline.Sketches.cmsCounts(
          Tables.events(s, d), "user_id", d = 4, w = 256)
        .orderBy("val"),
      Some(graft.pipeline.Sketches.cmsCountsSql(
        "events", "user_id", d = 4, w = 256))),

    // Cohort retention: users bucketed by first-activity hour; for each
    // (cohort, periods-since) cell, how many of the cohort's users were
    // active. Two partial-agg shuffles (per-user min, then distinct
    // (cohort, period, user)) + one count — the standard retention
    // matrix, output cohorts × periods sized.
    // The activity dedup is EventStreams.userHourActivity — it also
    // runs as a streaming dropDuplicates (RetentionStreamSpec pins
    // stream ≡ batch across arbitrary micro-batch splits).
    ("events_retention",
      (s, d) => EventStreams.retentionMatrix(
          EventStreams.userHourActivity(
            Tables.eventsNorm(s, d)
              .withColumn("ts_us", expr("ts_ns div 1000"))))
        .orderBy("cohort", "period"),
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts) // 3600000000000 AS hr
        |   FROM events),
        | c AS (SELECT user_id, MIN(hr) AS cohort FROM e GROUP BY user_id),
        | a AS (SELECT DISTINCT c.cohort, e.hr - c.cohort AS period, e.user_id
        |   FROM e JOIN c ON e.user_id = c.user_id)
        | SELECT cohort, period, CAST(COUNT(*) AS BIGINT) AS n_users
        | FROM a GROUP BY 1, 2 ORDER BY cohort, period"""
        .stripMargin.replace("\n", " "))),

    // Histogram-sketch quantiles: per-type p50/p90/p99 estimated from
    // fixed-width bin counts with in-bin interpolation — the mergeable
    // quantile shape (bin counts add across partitions; one partial-agg
    // shuffle, no per-group value buffer), exactly reproducible in the
    // oracle. Twins approx_percentile the way events_kmv_distinct twins
    // approx_count_distinct; events_quantiles stays the exact gate.
    ("events_hist_quantiles",
      (s, d) => graft.pipeline.Sketches.histQuantiles(
          Tables.events(s, d), Seq("event_type"), "value", binWidth = 10.0)
        .orderBy("event_type"),
      Some(graft.pipeline.Sketches.histQuantilesSql(
        "events", Seq("event_type"), "value", binWidth = 10.0))),

    // Funnel / ordered-sequence matching (CEP shape): steps completed
    // per user under greedy earliest matching in (time, event_id) order.
    // One groupBy shuffle + a codegen'd array walk — no joins; the
    // oracle replays the equivalent per-step earliest-match join
    // formulation. The streaming twin (flatMapGroupsWithState carrying
    // the walk across micro-batches) is spec-pinned to this batch path.
    ("events_funnel",
      (s, d) => EventStreams.funnelSteps(
          Tables.eventsNorm(s, d).withColumn("ts_us", expr("ts_ns div 1000")))
        .orderBy("user_id"),
      Some(EventStreams.funnelSql())),

    // ===== Time-series joins (no first-class Spark operator) =====
    // As-of join: each purchase gets the user's most recent click at or
    // before it. The oracle replays the SAME union-tag-window shape in
    // ANSI SQL — the non-equi-join formulation would be the slow path on
    // both engines.
    // (timestamps are compared in µs: DuckDB's parquet reader truncates
    // TIMESTAMP(NANOS) to µs, so the oracle cannot see sub-µs digits)
    // Nearest-event join (r8e): the third as-of direction — for every
    // purchase, the click minimizing |dt| within the user, equidistant
    // ties backward. Two key-partitioned window passes (backward +
    // negated-ts forward) + a 1:1 pick; the |L|×|R| lateral argmin
    // lives only in the oracle.
    ("events_asof_nearest",
      (s, d) => {
        val e = Tables.eventsNorm(s, d)
          .withColumn("ts_us", expr("ts_ns div 1000"))
        TimeSeries.nearestJoin(
          e.filter(col("event_type") === "purchase")
            .select("event_id", "user_id", "ts_us"),
          e.filter(col("event_type") === "click")
            .select("event_id", "user_id", "ts_us", "value"),
          keyCol = "user_id", tsCol = "ts_us", tieCol = "event_id",
          leftIdCol = "event_id",
          payloadCols = Seq("event_id", "value"))
          .orderBy("event_id")
      },
      Some("""WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |   FROM events WHERE event_type = 'purchase'),
        | r AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
        |   FROM events WHERE event_type = 'click')
        | SELECT l.event_id, l.user_id, l.ts_us,
        |  n.event_id AS near_event_id, n.value AS near_value,
        |  n.ts_us AS near_ts_us, n.ts_us - l.ts_us AS near_dt
        | FROM l LEFT JOIN LATERAL (
        |  SELECT r.event_id, r.value, r.ts_us FROM r
        |  WHERE r.user_id = l.user_id
        |  ORDER BY abs(r.ts_us - l.ts_us), r.ts_us, r.event_id DESC
        |  LIMIT 1) n ON true
        | ORDER BY l.event_id""".stripMargin.replace("\n", " "))),

    ("events_asof_join",
      (s, d) => {
        val e = Tables.eventsNorm(s, d)
          .withColumn("ts_us", expr("ts_ns div 1000"))
        TimeSeries.asofJoin(
          e.filter(col("event_type") === "purchase")
            .select("event_id", "user_id", "ts_us"),
          e.filter(col("event_type") === "click")
            .select("event_id", "user_id", "ts_us", "value"),
          keyCol = "user_id", tsCol = "ts_us", tieCol = "event_id",
          payloadCols = Seq("event_id", "value", "ts_us"))
          .orderBy("event_id")
      },
      Some("""WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |   FROM events WHERE event_type = 'purchase'),
        | r AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
        |   FROM events WHERE event_type = 'click'),
        | u AS (SELECT user_id, ts_us, 1 AS side, event_id,
        |    CAST(NULL AS BIGINT) AS tie,
        |    CAST(NULL AS STRUCT(i BIGINT, v DOUBLE, t BIGINT)) AS rp FROM l
        |  UNION ALL
        |  SELECT user_id, ts_us, 0, NULL, event_id,
        |    struct_pack(i := event_id, v := value, t := ts_us) FROM r),
        | w AS (SELECT user_id, ts_us, side, event_id,
        |    last_value(rp IGNORE NULLS) OVER win AS p
        |  FROM u WINDOW win AS (PARTITION BY user_id
        |    ORDER BY ts_us, side, COALESCE(tie, -1)
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        | SELECT event_id, user_id, ts_us,
        |  struct_extract(p, 'i') AS asof_event_id,
        |  struct_extract(p, 'v') AS asof_value,
        |  struct_extract(p, 't') AS asof_ts_us
        | FROM w WHERE side = 1 ORDER BY event_id"""
        .stripMargin.replace("\n", " "))),

    // Range self-join: ordered event pairs per user within one hour.
    // Spark side is the bucketed equi-join (x2 fan-out, never |E|x|E|);
    // the oracle is the plain inequality join, fine at oracle scale.
    ("events_range_pairs",
      (s, d) => TimeSeries.rangeSelfJoin(
        Tables.eventsNorm(s, d)
          .withColumn("ts_us", expr("ts_ns div 1000"))
          .select("user_id", "ts_us", "event_id"),
        keyCol = "user_id", tsCol = "ts_us", idCol = "event_id",
        windowSpan = 3600000000L)
        .orderBy("a_id", "b_id"),
      Some("""SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
        | epoch_us(b.ts) - epoch_us(a.ts) AS dt
        | FROM events a JOIN events b ON a.user_id = b.user_id
        |  AND epoch_us(b.ts) >= epoch_us(a.ts)
        |  AND epoch_us(b.ts) - epoch_us(a.ts) <= 3600000000
        |  AND (epoch_us(a.ts) < epoch_us(b.ts) OR a.event_id < b.event_id)
        | ORDER BY a_id, b_id""".stripMargin.replace("\n", " "))),

    // Click→purchase attribution: the SAME attributionJoin function is
    // a true watermark-bounded stream-stream join under Structured
    // Streaming (EventStreamsSpec); here it runs batch against the
    // oracle. Equi-join on user_id + time-range residual — one shuffle.
    ("events_attribution",
      (s, d) => {
        val ev = EventStreams.withEventTime(Tables.events(s, d))
        EventStreams.attributionJoin(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"))
          .orderBy("click_id", "purchase_id")
      },
      Some("""SELECT l.user_id, l.event_id AS click_id,
        | r.event_id AS purchase_id,
        | epoch_us(r.ts) - epoch_us(l.ts) AS delay_us
        | FROM events l JOIN events r ON r.user_id = l.user_id
        |  AND epoch_us(r.ts) >= epoch_us(l.ts)
        |  AND epoch_us(r.ts) <= epoch_us(l.ts) + 3600000000
        | WHERE l.event_type = 'click' AND r.event_type = 'purchase'
        | ORDER BY click_id, purchase_id""".stripMargin.replace("\n", " "))),
  )
}
