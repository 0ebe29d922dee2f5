package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Fns._

/** Relational layer — the completion of the reference's vendored-but-unwired
  * SQLite design (SURVEY.md §0, §2.5–§2.8): star-schema joins, numeric
  * aggregation, grouping sets, window functions, set operations, subqueries,
  * and the scalar-function surface, all on the TPC-H-ish corpus.
  *
  * Scale notes (100 TB):
  *  - Only bounded-cardinality dimensions (region: 5 rows, nation: 25 —
  *    fixed by the schema at any scale factor) carry explicit
  *    `broadcast()` hints. customer/supplier/part grow linearly with data
  *    size, so their joins shuffle on the key and AQE upgrades them to
  *    broadcast at runtime only when the (filtered) side is actually
  *    small — a compile-time hint there would OOM the driver at 100×.
  *  - Fact-fact joins (lineitem ⋈ orders) shuffle on the join key once and
  *    let AQE pick sort-merge vs shuffled-hash at runtime.
  *  - All aggregations are partial+final (map-side combine) by construction;
  *    money math is exact DECIMAL so merge order never changes results.
  *  - Windows partition by bounded keys (custkey), never a global ORDER BY
  *    without partitioning.
  */
object RelationalOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: full-scan aggregate, partial+final.
    "rel_q1_pricing" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" <= to_timestamp(lit("1999-06-30 00:00:00")))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum(dec2($"l_quantity")).cast("double").as("sum_qty"),
          sumMoney($"l_extendedprice").as("sum_base_price"),
          sum(revenue($"l_extendedprice", $"l_discount")).cast("double")
            .as("sum_disc_price"),
          sum(revenue($"l_extendedprice", $"l_discount") *
              (lit(1) + rate($"l_tax"))).cast("double").as("sum_charge"),
          (sum(dec2($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
          avgMoney($"l_extendedprice").as("avg_price"),
          (sum(rate($"l_discount")).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // TPC-H Q3-style: fact-fact join + filtered customer join + top-k
    // revenue. customer scales with SF, so no broadcast hint — the join
    // shuffles on custkey and AQE picks broadcast iff the filtered side
    // is small at runtime.
    "rel_q3_shipping" -> ((s, dir) => {
      import s.implicits._
      val cust = Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
      val ord = Tables.orders(s, dir)
        .filter($"o_orderdate" < to_timestamp(lit("1998-01-01 00:00:00")))
      val li = Tables.lineitem(s, dir)
        .filter($"l_shipdate" > to_timestamp(lit("1998-01-01 00:00:00")))
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey",
          date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"),
          $"o_orderpriority")
        .agg(sum(revenue($"l_extendedprice", $"l_discount")).cast("double")
          .as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    }),

    // TPC-H Q5-style: 6-way snowflake join, revenue per nation in a region.
    "rel_q5_region_volume" -> ((s, dir) => {
      import s.implicits._
      val region = Tables.region(s, dir).filter($"r_name" === "ASIA")
      val nation = Tables.nation(s, dir)
      val cust = Tables.customer(s, dir)
      val supp = Tables.supplier(s, dir)
      val ord = Tables.orders(s, dir)
        .filter($"o_orderdate" >= to_timestamp(lit("1997-01-01 00:00:00")) &&
                $"o_orderdate" < to_timestamp(lit("1999-01-01 00:00:00")))
      // nation/region are fixed-cardinality → broadcast hints stay;
      // supplier/customer scale with SF → shuffle joins, AQE decides.
      Tables.lineitem(s, dir)
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .join(supp, $"l_suppkey" === $"s_suppkey")
        .join(cust, $"o_custkey" === $"c_custkey" &&
          $"c_nationkey" === $"s_nationkey")
        .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(sum(revenue($"l_extendedprice", $"l_discount")).cast("double")
          .as("revenue"))
        .orderBy($"revenue".desc, $"n_name")
    }),

    // TPC-H Q4-style: order-priority counts for orders with at least one
    // over-taxed lineitem (corpus lacks commit/receipt dates; the
    // fact-to-fact LEFT SEMI shape — EXISTS in join form — is the point;
    // the SQL-interface EXISTS lives in rel_exists_correlated).
    "rel_q4_order_priority" -> ((s, dir) => {
      import s.implicits._
      val late = Tables.lineitem(s, dir)
        .filter($"l_tax" > $"l_discount")
        .select($"l_orderkey")
      Tables.orders(s, dir)
        .join(late, $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy($"o_orderpriority")
    }),

    // TPC-H Q10-style: revenue lost to returned items per customer,
    // top 20 — 3-way join where only the nation dim keeps a broadcast
    // hint (bounded cardinality).
    "rel_q10_returns" -> ((s, dir) => {
      import s.implicits._
      val ret = Tables.lineitem(s, dir).filter($"l_returnflag" === "R")
      Tables.orders(s, dir)
        .join(ret, $"o_orderkey" === $"l_orderkey")
        .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, dir)),
          $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"n_name")
        .agg(sum(revenue($"l_extendedprice", $"l_discount")).cast("double")
          .as("revenue"))
        .orderBy($"revenue".desc, $"c_custkey")
        .limit(20)
    }),

    // TPC-H Q18-style: large-quantity orders — HAVING subquery feeding a
    // fact join, top-100 by value. The having-aggregate runs FIRST and
    // shrinks the fact before the join (semi-join-like shape at scale).
    "rel_q18_large_orders" -> ((s, dir) => {
      import s.implicits._
      val big = Tables.lineitem(s, dir)
        .groupBy($"l_orderkey")
        .agg(sum(dec2($"l_quantity")).as("sum_qty"))
        .filter($"sum_qty" > 150)
      Tables.orders(s, dir)
        .join(big, $"o_orderkey" === $"l_orderkey")
        .select($"o_orderkey", $"o_custkey",
          date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"),
          dec2($"o_totalprice").cast("double").as("totalprice"),
          $"sum_qty".cast("double").as("sum_qty"))
        .orderBy($"totalprice".desc, $"o_orderkey")
        .limit(100)
    }),

    // Value histogram — the analytic the reference's vendored ImPlot
    // histogram layer implied (SURVEY.md §2.3): fixed 20-bucket binning
    // of event values, exact integer bucket math in both engines.
    "ev_value_histogram" -> ((s, dir) => {
      import s.implicits._
      EventOps.events(s, dir)
        .withColumn("bucket",
          least(greatest(floor($"value" / 50.0), lit(0.0)), lit(19.0))
            .cast("int"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"),
          sumMoney($"value").as("sum_value"))
        .orderBy($"bucket")
    }),

    // Broadcast hash join: fact ⋈ dim aggregated by brand. part scales
    // with SF, so the broadcast is AQE's runtime decision (it picks BHJ
    // here whenever the dim is actually small), not a compile-time hint
    // that would OOM at 100×.
    "rel_join_broadcast" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .join(Tables.part(s, dir), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n_items"),
          sum(revenue($"l_extendedprice", $"l_discount")).cast("double")
            .as("revenue"))
        .orderBy($"p_brand")
    }),

    // Left-semi join: customers having at least one finished order.
    "rel_join_semi" -> ((s, dir) => {
      import s.implicits._
      val finished = Tables.orders(s, dir)
        .filter($"o_orderstatus" === "F").select($"o_custkey")
      Tables.customer(s, dir)
        .join(finished, $"c_custkey" === $"o_custkey", "left_semi")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n_customers"))
        .orderBy($"c_mktsegment")
    }),

    // Left-anti join: customers with no orders at all.
    "rel_join_anti" -> ((s, dir) => {
      import s.implicits._
      val ord = Tables.orders(s, dir).select($"o_custkey")
      Tables.customer(s, dir)
        .join(ord, $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n_customers"))
        .orderBy($"c_mktsegment")
    }),

    // Ranking window: top-3 orders per customer by totalprice.
    "rel_window_rank" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"rn", $"o_orderkey", $"o_totalprice")
        .orderBy($"o_custkey", $"rn")
    }),

    // Running-frame window: cumulative count + exact cumulative sum.
    // RANGE-frame window: value-based frame bounds (all rows within 5
    // quantity units below the current row's quantity, per supplier).
    // Unlike ROWS frames, RANGE frames include ALL peers of the current
    // value, so the result is deterministic under ORDER BY ties with no
    // explicit tie-break column. Partitioned by supplier — a key whose
    // cardinality grows with the data — NOT by the 3-value return flag,
    // which would funnel a third of the table through one sort task at
    // 100 TB.
    "rel_window_range" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
        .select($"l_orderkey", $"l_linenumber", $"l_suppkey",
          $"l_quantity".cast("int").as("qty"))
      val w = Window.partitionBy($"l_suppkey").orderBy($"qty")
        .rangeBetween(-5, Window.currentRow)
      li.withColumn("n_in_range", count(lit(1)).over(w))
        .withColumn("sum_in_range", sum($"qty").over(w))
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    "rel_window_running" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, dir)
        .withColumn("run_cnt", count(lit(1)).over(w))
        .withColumn("run_total", sum(dec2($"o_totalprice")).over(w)
          .cast("double"))
        .select($"o_custkey", $"o_orderkey", $"run_cnt", $"run_total")
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // lag() window: gap in ms since the customer's previous order.
    // Distribution windows: ntile buckets + percent_rank (exact rational
    // arithmetic → bit-identical doubles across engines).
    "rel_window_ntile" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      Tables.orders(s, dir)
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pr", percent_rank().over(w))
        .select($"o_orderpriority", $"o_orderkey", $"quartile", $"pr")
        .orderBy($"o_orderpriority", $"o_orderkey")
    }),

    "rel_window_lag" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
      Tables.orders(s, dir)
        .withColumn("prev_ms",
          lag(unix_millis($"o_orderdate".cast("timestamp")), 1).over(w))
        .select($"o_custkey", $"o_orderkey",
          (unix_millis($"o_orderdate".cast("timestamp")) - $"prev_ms")
            .as("gap_ms"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // The distribution windows rel_window_ntile leaves out: dense_rank
    // over the DATE axis (many genuine ties per priority — gapless rank
    // semantics actually exercised, unlike a unique-key ordering where
    // dense_rank degenerates to row_number), cume_dist over the same
    // peer groups (#peers-at-or-before / n — exact small-int rational,
    // the division computes on identical operands in both engines so
    // the doubles are bit-identical), and nth_value(3) over its own
    // TOTALLY-ordered window with an explicit full-partition frame:
    // the default frame stops at the current row, which would leave
    // the first two rows NULL — "this order vs the partition's
    // 3rd-highest price" needs UNBOUNDED FOLLOWING, and ties on the
    // double price are broken by the unique key so row 3 is the same
    // row everywhere. Both windows share one partition key (one
    // exchange, two in-partition sorts).
    "rel_window_distribution" -> ((s, dir) => {
      import s.implicits._
      val wDate = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_orderdate")
      val wPrice = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir)
        .withColumn("dr", dense_rank().over(wDate).cast("int"))
        .withColumn("cd", cume_dist().over(wDate))
        .withColumn("third_price", nth_value($"o_totalprice", 3).over(wPrice))
        .filter($"o_orderkey" % 10 === 0)
        .select($"o_orderpriority", $"o_orderkey", $"dr", $"cd",
          $"third_price")
        .orderBy($"o_orderpriority", $"o_orderkey")
    }),

    // ROLLUP over region → nation customer account balances.
    "rel_rollup" -> ((s, dir) => {
      import s.implicits._
      Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, dir)),
          $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name")
        .agg(count(lit(1)).as("n"), sumMoney($"c_acctbal").as("sum_bal"),
          grouping($"r_name").cast("int").as("g_region"),
          grouping($"n_name").cast("int").as("g_nation"))
        .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
    }),

    // CUBE over lineitem flag/status.
    "rel_cube" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), sum(dec2($"l_quantity")).cast("double")
          .as("sum_qty"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    }),

    // Set op: UNION (distinct) of two customer-key selections.
    "rel_set_union" -> ((s, dir) => {
      import s.implicits._
      val a = Tables.customer(s, dir)
        .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      val b = Tables.orders(s, dir)
        .filter($"o_totalprice" > 300000.0)
        .select($"o_custkey".as("c_custkey"))
      a.union(b).distinct().orderBy($"c_custkey")
    }),

    // Set op: INTERSECT.
    "rel_set_intersect" -> ((s, dir) => {
      import s.implicits._
      val a = Tables.customer(s, dir)
        .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      val b = Tables.orders(s, dir)
        .filter($"o_totalprice" > 300000.0)
        .select($"o_custkey".as("c_custkey"))
      a.intersect(b).orderBy($"c_custkey")
    }),

    // Set op: EXCEPT.
    "rel_set_except" -> ((s, dir) => {
      import s.implicits._
      val a = Tables.customer(s, dir)
        .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      val b = Tables.orders(s, dir)
        .filter($"o_totalprice" > 300000.0)
        .select($"o_custkey".as("c_custkey"))
      a.except(b).orderBy($"c_custkey")
    }),

    // Bag-semantics set ops: INTERSECT ALL / EXCEPT ALL keep duplicate
    // multiplicity (min/difference of per-row counts).
    "rel_set_intersect_all" -> ((s, dir) => {
      import s.implicits._
      val a = Tables.orders(s, dir).select($"o_custkey")
      val b = Tables.customer(s, dir)
        .filter($"c_mktsegment" === "BUILDING")
        .select($"c_custkey".as("o_custkey"))
      a.intersectAll(b)
        .groupBy($"o_custkey").agg(count(lit(1)).as("n"))
        .orderBy($"o_custkey")
    }),

    "rel_set_except_all" -> ((s, dir) => {
      import s.implicits._
      val a = Tables.orders(s, dir).select($"o_custkey")
      val b = Tables.customer(s, dir)
        .filter($"c_mktsegment" === "BUILDING")
        .select($"c_custkey".as("o_custkey"))
      a.exceptAll(b)
        .groupBy($"o_custkey").agg(count(lit(1)).as("n"))
        .orderBy($"o_custkey")
    }),

    // unionByName: schema aligned by COLUMN NAME, not position — the
    // safe union for heterogeneous-but-compatible sources.
    "rel_union_by_name" -> ((s, dir) => {
      import s.implicits._
      val a = Tables.customer(s, dir)
        .select($"c_custkey".as("id"), $"c_nationkey".as("nat"))
      val b = Tables.supplier(s, dir)
        .select($"s_nationkey".as("nat"), $"s_suppkey".as("id"))
      a.unionByName(b)
        .groupBy($"nat").agg(count(lit(1)).as("n"))
        .orderBy($"nat")
    }),

    // Correlated EXISTS through the SQL interface (temp views +
    // spark.sql) — the engine's full-SQL surface, completing the
    // reference's vendored-but-unwired SQLite intent.
    "rel_exists_correlated" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("customer_v")
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT c_mktsegment, count(*) AS n_with_urgent
        FROM customer_v c
        WHERE EXISTS (
          SELECT 1 FROM orders_v o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    }),

    // Exact distinct counting per group (expand-based in Spark).
    "rel_distinct_count" -> ((s, dir) => {
      import s.implicits._
      Tables.customer(s, dir)
        .groupBy($"c_mktsegment")
        .agg(countDistinct($"c_nationkey").as("n_nations"),
          count(lit(1)).as("n_customers"))
        .orderBy($"c_mktsegment")
    }),

    // GROUP BY + HAVING: nations with more than 30 customers.
    "rel_having" -> ((s, dir) => {
      import s.implicits._
      Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name").agg(count(lit(1)).as("n"))
        .filter($"n" > 30)
        .orderBy($"n_name")
    }),

    // Scalar subquery: parts priced above the global average
    // (average via exact decimal sum / count → deterministic threshold).
    "rel_scalar_subquery" -> ((s, dir) => {
      import s.implicits._
      val part = Tables.part(s, dir)
      val avgDf = part.agg(
        (sum(dec2($"p_retailprice")).cast("double") / count(lit(1)))
          .as("avg_price"))
      part.crossJoin(avgDf)
        .filter($"p_retailprice" > $"avg_price")
        .groupBy($"p_brand").agg(count(lit(1)).as("n_above"))
        .orderBy($"p_brand")
    }),

    // Scalar-function surface parity: string / date / math built-ins.
    "rel_scalar_funcs" -> ((s, dir) => {
      import s.implicits._
      Tables.part(s, dir)
        .orderBy($"p_partkey").limit(100)
        .select(
          $"p_partkey",
          upper($"p_name").as("name_upper"),
          lower($"p_brand").as("brand_lower"),
          substring($"p_type", 1, 3).as("type_pre"),
          length($"p_name").as("name_len"),
          concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
          ($"p_size" % 7).as("size_mod"),
          abs($"p_size" - 25).as("size_dist"),
          floor(dec2($"p_retailprice")).cast("long").as("price_floor"),
          ceil(dec2($"p_retailprice")).cast("long").as("price_ceil"),
          regexp_replace($"p_name", "[aeiou]", "_").as("name_mask"))
    }),

    // Conditional aggregation (CASE WHEN inside agg) by order year.
    "rel_case_when" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .groupBy(year($"o_orderdate").as("order_year"))
        .agg(
          count(lit(1)).as("n"),
          sum(when($"o_orderstatus" === "F", 1).otherwise(0)).as("n_f"),
          sum(when($"o_orderpriority" === "1-URGENT", dec2($"o_totalprice"))
            .otherwise(dec2(lit(0)))).cast("double").as("urgent_total"))
        .orderBy($"order_year")
    }),

    // Multi-key per-direction ORDER BY with deterministic tie-break.
    "rel_orderby_multi" -> ((s, dir) => {
      import s.implicits._
      Tables.supplier(s, dir)
        .select($"s_suppkey", $"s_name", $"s_nationkey", $"s_acctbal")
        .orderBy($"s_nationkey".asc, $"s_acctbal".desc, $"s_suppkey".asc)
        .limit(50)
    }),

    // TPC-H Q15-shape: top supplier(s) by quarterly revenue — a derived
    // aggregate compared against ITS OWN max via scalar subquery (the
    // CREATE VIEW + max(total_revenue) form of the spec). The revenue
    // agg computes once; the 1-row max broadcasts back against it, so
    // the plan is agg → broadcast-scalar semi-filter → dim join, never
    // a re-aggregation. Equality compares EXACT decimals (sum of
    // decimal money), so ties and hash parity are safe cross-engine.
    "rel_q15_top_supplier" -> ((s, dir) => {
      import s.implicits._
      val rev = Tables.lineitem(s, dir)
        .filter($"l_shipdate" >= to_timestamp(lit("1998-01-01 00:00:00")) &&
                $"l_shipdate" < to_timestamp(lit("1998-04-01 00:00:00")))
        .groupBy($"l_suppkey")
        .agg(sum(revenue($"l_extendedprice", $"l_discount")).as("total_rev"))
      val maxRev = rev.agg(max($"total_rev").as("mr"))
      rev.join(broadcast(maxRev), $"total_rev" === $"mr")
        .join(Tables.supplier(s, dir), $"l_suppkey" === $"s_suppkey")
        .select($"s_suppkey", $"s_name",
          $"total_rev".cast("double").as("total_revenue"))
        .orderBy($"s_suppkey")
    }),

    // TPC-H Q22-shape ("global sales opportunity"): customers from a
    // fixed set of country codes (nationkey here — the corpus has no
    // phone column) with above-average positive balances and no RECENT
    // order (every corpus customer has some order, so the spec's
    // "no orders" anti becomes "lapsed since 1999" — an anti join on a
    // FILTERED subquery, the same quantified shape). The above-average
    // filter compares bal·n > Σbal in EXACT decimals (multiplying
    // through by the count instead of dividing), so no cross-engine
    // avg-rounding can flip a boundary row. Shape at scale: one tiny
    // stats aggregate broadcasts; the anti join keys on custkey;
    // everything else is map-side.
    "rel_q22_untapped" -> ((s, dir) => {
      import s.implicits._
      val codes = Seq(1, 3, 5, 7, 9, 11, 13)
      val cust = Tables.customer(s, dir)
        .filter($"c_nationkey".isin(codes: _*))
      val stats = cust.filter($"c_acctbal" > 0.0)
        .agg(sum(dec2($"c_acctbal")).as("s"), count(lit(1)).as("n"))
      cust
        .join(Tables.orders(s, dir)
          .filter($"o_orderdate" >= to_timestamp(lit("1999-01-01 00:00:00")))
          .select($"o_custkey"),
          $"c_custkey" === $"o_custkey", "left_anti")
        .crossJoin(broadcast(stats))
        .filter(dec2($"c_acctbal") * $"n" > $"s")
        .groupBy($"c_nationkey")
        .agg(count(lit(1)).as("numcust"), sumMoney($"c_acctbal").as("totacctbal"))
        .orderBy($"c_nationkey")
    }),

    // TPC-H Q21-shape: suppliers who kept a finished multi-supplier order
    // waiting — the classic multi-correlated quantified-predicate chain
    // (EXISTS + NOT EXISTS against the SAME fact at different aliases).
    // "Late" is the corpus's l_tax > l_discount analog (it lacks
    // commit/receipt dates, same substitution as rel_q4). Shape at scale:
    // both quantified predicates compile to semi/anti joins keyed on
    // l_orderkey, the same key the probe side is keyed on — one shuffle
    // layout serves all three fact legs (no cartesian, no re-key);
    // supplier is a shuffle join AQE may broadcast at small SF.
    "rel_q21_waiting" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val l1 = li.filter($"l_tax" > $"l_discount")
        .join(Tables.orders(s, dir).filter($"o_orderstatus" === "F")
          .select($"o_orderkey"), $"l_orderkey" === $"o_orderkey")
        .select($"l_orderkey", $"l_suppkey")
      val l2 = li.select($"l_orderkey".as("l2_orderkey"),
        $"l_suppkey".as("l2_suppkey"))
      val l3 = li.filter($"l_tax" > $"l_discount")
        .select($"l_orderkey".as("l3_orderkey"),
          $"l_suppkey".as("l3_suppkey"))
      l1
        .join(l2, $"l_orderkey" === $"l2_orderkey" &&
          $"l_suppkey" =!= $"l2_suppkey", "left_semi")
        .join(l3, $"l_orderkey" === $"l3_orderkey" &&
          $"l_suppkey" =!= $"l3_suppkey", "left_anti")
        .join(Tables.supplier(s, dir), $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy($"numwait".desc, $"s_name")
        .limit(100)
    })
  )

  val oracles: Map[String, String] = Map(
    "rel_q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        | CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
        | CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1999-06-30 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "rel_q3_shipping" ->
      """SELECT l_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "rel_q5_region_volume" ->
      """SELECT n_name,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "rel_join_broadcast" ->
      """SELECT p_brand, count(*) AS n_items,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "rel_join_semi" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "rel_join_anti" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "rel_window_rank" ->
      """SELECT o_custkey, CAST(rn AS INTEGER) AS rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |   row_number() OVER (PARTITION BY o_custkey
        |                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "rel_window_range" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, qty,
        | count(*) OVER w AS n_in_range,
        | CAST(sum(qty) OVER w AS BIGINT) AS sum_in_range
        |FROM (SELECT l_orderkey, l_linenumber, l_suppkey,
        |       CAST(l_quantity AS INTEGER) AS qty FROM lineitem)
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY qty
        |             RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "rel_window_running" ->
      """SELECT o_custkey, o_orderkey,
        | count(*) OVER w AS run_cnt,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS run_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "rel_window_ntile" ->
      """SELECT o_orderpriority, o_orderkey,
        | CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        | percent_rank() OVER w AS pr
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    "rel_window_lag" ->
      """SELECT o_custkey, o_orderkey,
        | epoch_ms(o_orderdate) - lag(epoch_ms(o_orderdate))
        |   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS gap_ms
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "rel_window_distribution" ->
      """SELECT o_orderpriority, o_orderkey, dr, cd, third_price FROM (
        |  SELECT o_orderpriority, o_orderkey,
        |   CAST(dense_rank() OVER wd AS INTEGER) AS dr,
        |   cume_dist() OVER wd AS cd,
        |   nth_value(o_totalprice, 3) OVER (
        |     PARTITION BY o_orderpriority
        |     ORDER BY o_totalprice DESC, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |     AS third_price
        |  FROM orders
        |  WINDOW wd AS (PARTITION BY o_orderpriority ORDER BY o_orderdate))
        |WHERE o_orderkey % 10 = 0
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    "rel_rollup" ->
      """SELECT r_name, n_name, count(*) AS n,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal,
        | CAST(grouping(r_name) AS INTEGER) AS g_region,
        | CAST(grouping(n_name) AS INTEGER) AS g_nation
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

    "rel_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "rel_set_union" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000.0
        |ORDER BY c_custkey""".stripMargin,

    "rel_set_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000.0
        |ORDER BY c_custkey""".stripMargin,

    "rel_q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem WHERE l_tax > l_discount)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "rel_q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |   sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "rel_q22_untapped" ->
      """WITH cust AS (
        |  SELECT * FROM customer
        |  WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
        |stats AS (
        |  SELECT sum(CAST(c_acctbal AS DECIMAL(12,2))) AS s, count(*) AS n
        |  FROM cust WHERE c_acctbal > 0.0)
        |SELECT c_nationkey, count(*) AS numcust,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        |FROM cust, stats
        |WHERE c_custkey NOT IN (
        |  SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |  AND CAST(c_acctbal AS DECIMAL(12,2)) * n > s
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,

    "rel_q21_waiting" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE l1.l_tax > l1.l_discount
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_tax > l3.l_discount)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,

    "rel_q10_returns" ->
      """SELECT c_custkey, c_name, n_name,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey AND l_returnflag = 'R'
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "rel_q18_large_orders" ->
      """SELECT o_orderkey, o_custkey,
        | strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d') AS orderdate,
        | CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS totalprice,
        | CAST(sum_qty AS DOUBLE) AS sum_qty
        |FROM orders JOIN (
        |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 150
        |) ON o_orderkey = l_orderkey
        |ORDER BY totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "ev_value_histogram" ->
      """SELECT CAST(least(greatest(floor(value / 50.0), 0), 19) AS INTEGER) AS bucket,
        | count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,

    "rel_set_intersect_all" ->
      """SELECT o_custkey, count(*) AS n FROM (
        |  SELECT o_custkey FROM orders
        |  INTERSECT ALL
        |  SELECT c_custkey AS o_custkey FROM customer
        |  WHERE c_mktsegment = 'BUILDING')
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "rel_set_except_all" ->
      """SELECT o_custkey, count(*) AS n FROM (
        |  SELECT o_custkey FROM orders
        |  EXCEPT ALL
        |  SELECT c_custkey AS o_custkey FROM customer
        |  WHERE c_mktsegment = 'BUILDING')
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "rel_union_by_name" ->
      """SELECT nat, count(*) AS n FROM (
        |  SELECT c_custkey AS id, c_nationkey AS nat FROM customer
        |  UNION ALL BY NAME
        |  SELECT s_nationkey AS nat, s_suppkey AS id FROM supplier)
        |GROUP BY nat ORDER BY nat""".stripMargin,

    "rel_exists_correlated" ->
      """SELECT c_mktsegment, count(*) AS n_with_urgent
        |FROM customer c
        |WHERE EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "rel_set_except" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000.0
        |ORDER BY c_custkey""".stripMargin,

    "rel_distinct_count" ->
      """SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations,
        | count(*) AS n_customers
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "rel_having" ->
      """SELECT n_name, count(*) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name HAVING count(*) > 30 ORDER BY n_name""".stripMargin,

    "rel_scalar_subquery" ->
      """SELECT p_brand, count(*) AS n_above FROM part
        |WHERE p_retailprice > (
        |  SELECT CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / count(*)
        |  FROM part)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "rel_scalar_funcs" ->
      """SELECT p_partkey,
        | upper(p_name) AS name_upper,
        | lower(p_brand) AS brand_lower,
        | substr(p_type, 1, 3) AS type_pre,
        | CAST(length(p_name) AS INTEGER) AS name_len,
        | concat_ws('|', p_brand, p_type) AS brand_type,
        | p_size % 7 AS size_mod,
        | abs(p_size - 25) AS size_dist,
        | CAST(floor(CAST(p_retailprice AS DECIMAL(12,2))) AS BIGINT) AS price_floor,
        | CAST(ceil(CAST(p_retailprice AS DECIMAL(12,2))) AS BIGINT) AS price_ceil,
        | regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_mask
        |FROM part ORDER BY p_partkey LIMIT 100""".stripMargin,

    "rel_case_when" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year, count(*) AS n,
        | CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        | CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
        |               THEN CAST(o_totalprice AS DECIMAL(12,2))
        |               ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS urgent_total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "rel_orderby_multi" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
        |ORDER BY s_nationkey ASC, s_acctbal DESC, s_suppkey ASC
        |LIMIT 50""".stripMargin
  )
}
