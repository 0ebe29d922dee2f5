package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Fns._

/** Relational layer, part 3: the remaining corpus-expressible TPC-H join
  * shapes (SURVEY.md §2.5) — Q7 and Q8 are LITERAL on this corpus (every
  * referenced column exists); Q13/Q17/Q19 keep the spec's plan shape with
  * the documented column substitutions (the corpus lacks o_comment,
  * p_container, l_shipmode/l_shipinstruct — same substitution policy as
  * rel_q4/rel_q21's l_tax>l_discount lateness analog).
  *
  * Why these shapes matter beyond checkbox coverage — each exercises a
  * distinct optimizer/runtime path the rest of the relational family
  * doesn't:
  *  - Q7: a DISJUNCTIVE cross-table nation predicate over a double
  *    nation-dim self-join (n1 supplier-side, n2 customer-side) — the
  *    filter can't be pushed to either dim alone, only the 2-value IN
  *    prefilter can.
  *  - Q8: the widest snowflake on the corpus (7 joins incl. the nation
  *    dim joined TWICE in different roles) + a conditional-share
  *    aggregate.
  *  - Q13: outer-join-preserving aggregation — the filter lives on the
  *    JOIN's right side, so customers with zero surviving orders must
  *    still appear (count=0); a WHERE would silently drop them.
  *  - Q17: correlated scalar aggregate (per-part avg) consumed by the
  *    OUTER query's row filter — the decorrelated plan must aggregate the
  *    fact once and join back on the same key layout.
  *  - Q19: disjunction-of-conjunctions spanning BOTH join sides — tests
  *    that common-conjunct extraction still pushes the per-side prefix
  *    (partkey equality stays a hash join key, never a cartesian).
  *
  * Scale notes (100 TB), same contract as [[RelationalOps]]:
  *  - nation (25 rows) and region (5) are the only compile-time
  *    broadcasts — fixed by the schema at ANY scale factor.
  *  - part/customer/supplier grow with SF: their joins shuffle on the key
  *    and AQE upgrades to broadcast at runtime iff the filtered side is
  *    actually small.
  *  - Q17's correlated aggregate is computed over the part-filtered
  *    lineitem subset ONLY (the correlation key's filter is part-side, so
  *    the per-part avg over the subset equals the avg over the full
  *    fact), and the agg + join-back share one shuffle layout on
  *    l_partkey.
  *  - All money/quantity boundaries compare EXACT decimals; Q17
  *    multiplies the avg comparison through by the count
  *    (5·qty·n < Σqty ⟺ qty < 0.2·avg) so no cross-engine division
  *    rounding can flip a row.
  */
object RelationalOps3 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q7 (literal): volume shipped between two nations, by
    // direction and ship year. The two-sided nation disjunction is
    // narrowed per-dim with an IN prefilter (each side can only ever be
    // one of the two nations), then the exact pair predicate applies
    // post-join — the plan Catalyst's constraint propagation would
    // otherwise have to infer.
    "rel_q7_volume" -> ((s, dir) => {
      import s.implicits._
      val pair = Seq("NATION_3", "NATION_7")
      val n1 = broadcast(Tables.nation(s, dir)
        .filter($"n_name".isin(pair: _*))
        .select($"n_nationkey".as("n1_key"), $"n_name".as("supp_nation")))
      val n2 = broadcast(Tables.nation(s, dir)
        .filter($"n_name".isin(pair: _*))
        .select($"n_nationkey".as("n2_key"), $"n_name".as("cust_nation")))
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" >= to_timestamp(lit("1997-01-01 00:00:00")) &&
                $"l_shipdate" < to_timestamp(lit("1999-01-01 00:00:00")))
        .join(Tables.orders(s, dir).select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .join(Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey"),
          $"l_suppkey" === $"s_suppkey")
        .join(Tables.customer(s, dir).select($"c_custkey", $"c_nationkey"),
          $"o_custkey" === $"c_custkey")
        .join(n1, $"s_nationkey" === $"n1_key")
        .join(n2, $"c_nationkey" === $"n2_key")
        .filter(($"supp_nation" === "NATION_3" && $"cust_nation" === "NATION_7") ||
                ($"supp_nation" === "NATION_7" && $"cust_nation" === "NATION_3"))
        .groupBy($"supp_nation", $"cust_nation",
          year($"l_shipdate").cast("int").as("l_year"))
        .agg(sum(revenue($"l_extendedprice", $"l_discount")).cast("double")
          .as("revenue"))
        .orderBy($"supp_nation", $"cust_nation", $"l_year")
    }),

    // TPC-H Q8 (literal): a supplier nation's market share inside a
    // customer region, per order year, over one part type. The widest
    // snowflake on the corpus — nation joins twice (customer-side for the
    // region gate, supplier-side for the share label). Share = double of
    // two EXACT decimal sums (the rel_q14 idiom), computed in one
    // conditional aggregate pass — never two scans.
    "rel_q8_market_share" -> ((s, dir) => {
      import s.implicits._
      val asiaNations = broadcast(Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter($"r_name" === "ASIA")),
          $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey".as("cn_key")))
      val suppNation = broadcast(Tables.nation(s, dir)
        .select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation")))
      Tables.lineitem(s, dir)
        .join(Tables.part(s, dir).filter($"p_type" === "PROMO")
          .select($"p_partkey"), $"l_partkey" === $"p_partkey")
        .join(Tables.orders(s, dir)
          .filter($"o_orderdate" >= to_timestamp(lit("1996-01-01 00:00:00")) &&
                  $"o_orderdate" < to_timestamp(lit("1998-01-01 00:00:00")))
          .select($"o_orderkey", $"o_custkey", $"o_orderdate"),
          $"l_orderkey" === $"o_orderkey")
        .join(Tables.customer(s, dir).select($"c_custkey", $"c_nationkey"),
          $"o_custkey" === $"c_custkey")
        .join(asiaNations, $"c_nationkey" === $"cn_key", "left_semi")
        .join(Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey"),
          $"l_suppkey" === $"s_suppkey")
        .join(suppNation, $"s_nationkey" === $"sn_key")
        .groupBy(year($"o_orderdate").cast("int").as("o_year"))
        .agg(
          sum(when($"supp_nation" === "NATION_3",
            revenue($"l_extendedprice", $"l_discount"))
            .otherwise(lit(0).cast("decimal(12,2)"))).as("tgt"),
          sum(revenue($"l_extendedprice", $"l_discount")).as("total"))
        .select($"o_year",
          ($"tgt".cast("double") / $"total".cast("double")).as("mkt_share"))
        .orderBy($"o_year")
    }),

    // TPC-H Q13-shape: customer order-count distribution. The priority
    // filter replaces the spec's o_comment NOT LIKE (corpus has no
    // comment column) but sits in the same place — on the join's RIGHT
    // side, not a WHERE — so zero-order customers survive with count 0.
    // count(o_orderkey) counts only matched rows (nulls skipped), which
    // is exactly the outer-join-preserving aggregate the spec tests.
    "rel_q13_custdist" -> ((s, dir) => {
      import s.implicits._
      val ord = Tables.orders(s, dir)
        .filter($"o_orderpriority" =!= "1-URGENT")
        .select($"o_orderkey", $"o_custkey")
      Tables.customer(s, dir).select($"c_custkey")
        .join(ord, $"c_custkey" === $"o_custkey", "left_outer")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("c_count"))
        .groupBy($"c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy($"custdist".desc, $"c_count".desc)
    }),

    // TPC-H Q17-shape: revenue impact of small-quantity orders —
    // correlated scalar avg per part (p_size<10 stands in for the absent
    // p_container). Decorrelation: the per-part aggregate runs over the
    // part-filtered lineitem subset only (valid because the correlation
    // filter is part-side), and the agg + join-back reuse one l_partkey
    // shuffle. The 0.2·avg boundary is multiplied through by the count so
    // both engines compare exact decimals.
    "rel_q17_small_qty" -> ((s, dir) => {
      import s.implicits._
      val p = Tables.part(s, dir)
        .filter($"p_brand" === "Brand#1" && $"p_size" < 10)
        .select($"p_partkey")
      val relevant = Tables.lineitem(s, dir)
        .select($"l_partkey", $"l_quantity", $"l_extendedprice")
        .join(p, $"l_partkey" === $"p_partkey")
      val perPart = relevant.groupBy($"l_partkey".as("a_partkey"))
        .agg(sum(dec2($"l_quantity")).as("qty_sum"), count(lit(1)).as("qty_n"))
      relevant.join(perPart, $"l_partkey" === $"a_partkey")
        .filter(dec2($"l_quantity") * lit(5) * $"qty_n" < $"qty_sum")
        .agg((sumMoney($"l_extendedprice") / lit(7.0)).as("avg_yearly"),
          count(lit(1)).as("n_small"))
    }),

    // Market-basket pair mining (frequent itemsets at k=2, the Apriori
    // base case): parts co-occurring in one order, support ≥ 2, top-20.
    // ONE order-keyed aggregation builds the per-basket distinct part
    // SET (collect_set dedups duplicate part lines in the same pass —
    // baskets are bounded by order size, ≤13 on this corpus), the
    // sorted set expands to its C(b,2) ordered pairs MAP-SIDE, and the
    // pair aggregate combines with map-side partials. The former shape
    // paid a distinct() exchange plus a self-join (two more exchanges
    // of item rows) for the same Σ basket² fan-out — measured 2.4 vs
    // 2.0 s steady at sf0.1, identical top-20. Global top-20 is
    // ORDER BY + LIMIT → TakeOrderedAndProject.
    "rel_basket_pairs" -> ((s, dir) => {
      import s.implicits._
      val baskets = Tables.lineitem(s, dir)
        .groupBy($"l_orderkey")
        .agg(sort_array(collect_set($"l_partkey")).as("parts"))
        .filter(size($"parts") >= 2)
      baskets.select(explode_outer(expr(
          "flatten(transform(parts, (x, i) -> " +
            "transform(slice(parts, i + 2, size(parts) - i - 1), " +
            "y -> struct(x AS part_a, y AS part_b))))")).as("p"))
        .groupBy($"p.part_a".as("part_a"), $"p.part_b".as("part_b"))
        .agg(count(lit(1)).as("support"))
        .filter($"support" >= 2)
        .orderBy($"support".desc, $"part_a", $"part_b").limit(20)
    }),

    // Join-key skew diagnostic: the report you run BEFORE deciding to
    // salt (GraftPipelines.saltedJoin) or lean on AQE skew-split.
    // skew_x1000 = max_n·n_keys·1000 div total_rows (= 1000 for a
    // perfectly uniform key, grows with the heaviest key's excess) in
    // exact DECIMAL; the heaviest key is found by a broadcast-1-row
    // equality filter (min key among those at max_n) — deterministic
    // and scale-safe, never a global-sort window over the key space.
    "rel_skew_report" -> ((s, dir) => {
      import s.implicits._
      def report(df: DataFrame, keyName: String): DataFrame = {
        val counts = df.groupBy(col(keyName).as("k")).agg(count(lit(1)).as("n"))
        val agg = counts.agg(count(lit(1)).as("n_keys"),
          sum($"n").as("total_rows"), max($"n").as("max_n"))
        val top = counts.crossJoin(broadcast(agg))
          .filter($"n" === $"max_n").agg(min($"k").as("top_key"))
        agg.crossJoin(broadcast(top))
          .select(lit(keyName).as("key_col"), $"n_keys", $"total_rows",
            $"max_n", $"top_key",
            expr("(CAST(max_n AS DECIMAL(38,0)) * n_keys * 1000) div total_rows")
              .as("skew_x1000"))
      }
      report(Tables.orders(s, dir), "o_custkey")
        .unionByName(report(Tables.lineitem(s, dir), "l_partkey"))
        .orderBy($"key_col")
    }),

    // Bucketed CO-LOCATED join, promoted from GraftIOSpec to the oracle
    // surface: customer and orders are laid out ONCE as bucketed tables
    // on the join key (the offline layout job a 100 TB deployment runs
    // when a fact is joined repeatedly — rel_zorder orders data WITHIN
    // files for skipping; bucketing co-locates rows ACROSS tables for
    // shuffle-free equi-joins), then the per-query read joins the two
    // bucketed scans with NO exchange on either side — the join cost
    // that stops scaling with cluster bisection bandwidth. The
    // zero-Exchange plan is asserted in GraftIOSpec; hash equality with
    // the plain-table oracle proves the layout is lossless. The write
    // is guarded per (corpus, mtime, JVM) like rel_compact's fixture —
    // pid-keyed so concurrent JVMs never race on one warehouse dir
    // (the in-memory catalog is per-session anyway).
    "rel_join_bucketed" -> ((s, dir) => {
      import s.implicits._
      // SHA-256 corpus key, not (dir, stamp).hashCode: a 32-bit tuple
      // hash collides silently between corpus dirs in one JVM and
      // would serve another corpus's bucketed tables as this one's —
      // the same wrong-answer failure GraftIO.fixtureDir documents.
      // pid suffix kept: concurrent JVMs never race on one warehouse.
      val key = graft.sources.GraftIO
        .corpusKey(dir, "orders.parquet", "bkt=16") +
        "_" + ProcessHandle.current().pid()
      val (cT, oT) = (s"cust_bkt_$key", s"ord_bkt_$key")
      if (!s.catalog.tableExists(cT)) {
        graft.sources.GraftIO.writeBucketed(
          Tables.customer(s, dir).select($"c_custkey", $"c_mktsegment"),
          cT, "c_custkey", 16)
        graft.sources.GraftIO.writeBucketed(
          Tables.orders(s, dir).select($"o_custkey", $"o_totalprice"),
          oT, "o_custkey", 16)
      }
      s.table(cT).join(s.table(oT), $"c_custkey" === $"o_custkey")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(dec2($"o_totalprice")).cast("double").as("total_price"))
        .orderBy($"c_mktsegment")
    }),

    // Running COUNT(DISTINCT) over a window — the classic SQL surface
    // Spark does not support directly (DISTINCT aggregates are invalid
    // in window frames). The scalable idiom: mark each customer's FIRST
    // order per priority (row_number = 1 on a (prio, custkey) window),
    // aggregate new-customer counts per month, then a plain running sum
    // over the bounded month axis. Both windows are partition-bounded;
    // nothing sorts globally.
    "rel_running_distinct" -> ((s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir).select($"o_orderpriority".as("prio"),
        (year($"o_orderdate") * 100 + month($"o_orderdate")).cast("int")
          .as("ym"),
        $"o_custkey", $"o_orderkey")
      val wFirst = Window.partitionBy($"prio", $"o_custkey")
        .orderBy($"ym", $"o_orderkey")
      val monthly = o.withColumn("rn", row_number().over(wFirst))
        .withColumn("is_new", when($"rn" === 1, 1L).otherwise(0L))
        .groupBy($"prio", $"ym")
        .agg(sum($"is_new").as("new_cust"), count(lit(1)).as("n_orders"))
      val wRun = Window.partitionBy($"prio").orderBy($"ym")
      monthly.withColumn("cum_cust", sum($"new_cust").over(wRun))
        .orderBy($"prio", $"ym")
    }),

    // Ordered string aggregation (LISTAGG, SQL:2016): the top-3
    // customers per market segment by balance, concatenated in rank
    // order. Spark has no ordered string_agg — the deterministic twin
    // is array_sort(collect_list(struct(rank, name))) then join: the
    // struct sort pins the order the oracle's string_agg(... ORDER BY)
    // declares. The rank window is segment-partitioned (WindowGroupLimit
    // top-k per partition, no global sort).
    "rel_listagg" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"c_acctbal".desc, $"c_name")
      Tables.customer(s, dir)
        .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).cast("int").as("n_top"),
          expr("array_join(transform(array_sort(collect_list(struct(rn, c_name))), x -> x.c_name), ',')")
            .as("top_names"))
        .orderBy($"c_mktsegment")
    }),

    // TPC-H Q19-shape: disjunction of brand/size/quantity conjunctions
    // spanning both join sides (size/quantity bands stand in for the
    // absent container/shipmode lists). The partkey equality is a
    // common conjunct of every disjunct, so the plan stays a hash join
    // with the residual OR as a post-join filter — never a cartesian;
    // the per-side prefixes (p_size<=15, quantity<=30) still prune.
    "rel_q19_disjunctive" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
        .select($"l_partkey", $"l_quantity", $"l_extendedprice", $"l_discount")
      val p = Tables.part(s, dir).select($"p_partkey", $"p_brand", $"p_size")
      li.join(p, $"l_partkey" === $"p_partkey" && (
          ($"p_brand" === "Brand#1" && $"p_size".between(1, 5) &&
            $"l_quantity".between(1, 11)) ||
          ($"p_brand" === "Brand#2" && $"p_size".between(1, 10) &&
            $"l_quantity".between(10, 20)) ||
          ($"p_brand" === "Brand#3" && $"p_size".between(1, 15) &&
            $"l_quantity".between(20, 30))))
        .agg(sum(revenue($"l_extendedprice", $"l_discount")).cast("double")
          .as("revenue"), count(lit(1)).as("n_items"))
    })
  )

  val oracles: Map[String, String] = Map(
    "rel_q7_volume" ->
      """SELECT supp_nation, cust_nation, l_year,
        | CAST(sum(vol) AS DOUBLE) AS revenue
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |   CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |   CAST(l_extendedprice AS DECIMAL(12,2))
        |     * (1 - CAST(l_discount AS DECIMAL(4,2))) AS vol
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation n1 ON s_nationkey = n1.n_nationkey
        | JOIN nation n2 ON c_nationkey = n2.n_nationkey
        | WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |     OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "rel_q8_market_share" ->
      """SELECT o_year,
        | CAST(tgt AS DOUBLE) / CAST(total AS DOUBLE) AS mkt_share
        |FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |   sum(CASE WHEN n2.n_name = 'NATION_3'
        |     THEN CAST(l_extendedprice AS DECIMAL(12,2))
        |          * (1 - CAST(l_discount AS DECIMAL(4,2)))
        |     ELSE CAST(0 AS DECIMAL(12,2)) END) AS tgt,
        |   sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |       * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation n1 ON c_nationkey = n1.n_nationkey
        | JOIN region ON n1.n_regionkey = r_regionkey
        | JOIN nation n2 ON s_nationkey = n2.n_nationkey
        | WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        | GROUP BY 1)
        |ORDER BY o_year""".stripMargin,

    "rel_q13_custdist" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        | FROM customer LEFT OUTER JOIN
        |  (SELECT o_orderkey, o_custkey FROM orders
        |   WHERE o_orderpriority <> '1-URGENT') o
        |  ON c_custkey = o_custkey
        | GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "rel_q17_small_qty" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
        |   AS avg_yearly,
        | count(*) AS n_small
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |JOIN (SELECT l_partkey AS a_partkey,
        |   sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty_sum,
        |   count(*) AS qty_n
        |  FROM lineitem GROUP BY 1) a ON l_partkey = a_partkey
        |WHERE p_brand = 'Brand#1' AND p_size < 10
        | AND CAST(l_quantity AS DECIMAL(12,2)) * 5 * qty_n < qty_sum""".stripMargin,

    "rel_basket_pairs" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem)
        |SELECT a.pkey AS part_a, b.pkey AS part_b, count(*) AS support
        |FROM items a JOIN items b
        |  ON a.okey = b.okey AND a.pkey < b.pkey
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY support DESC, part_a, part_b LIMIT 20""".stripMargin,

    // plain-table join+agg: the bucketed layout must be lossless
    "rel_join_bucketed" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        |   AS total_price
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "rel_skew_report" ->
      """WITH oc AS (SELECT o_custkey AS k, count(*) AS n FROM orders GROUP BY 1),
        |oagg AS (SELECT count(*) AS n_keys, sum(n) AS total_rows,
        |          max(n) AS max_n FROM oc),
        |otop AS (SELECT min(k) AS top_key FROM oc CROSS JOIN oagg
        |         WHERE n = max_n),
        |lc AS (SELECT l_partkey AS k, count(*) AS n FROM lineitem GROUP BY 1),
        |lagg AS (SELECT count(*) AS n_keys, sum(n) AS total_rows,
        |          max(n) AS max_n FROM lc),
        |ltop AS (SELECT min(k) AS top_key FROM lc CROSS JOIN lagg
        |         WHERE n = max_n)
        |SELECT * FROM (
        | SELECT 'l_partkey' AS key_col, n_keys,
        |  CAST(total_rows AS BIGINT) AS total_rows, max_n, top_key,
        |  CAST((CAST(max_n AS HUGEINT) * n_keys * 1000) // total_rows
        |    AS BIGINT) AS skew_x1000
        | FROM lagg CROSS JOIN ltop
        | UNION ALL
        | SELECT 'o_custkey', n_keys, CAST(total_rows AS BIGINT), max_n,
        |  top_key,
        |  CAST((CAST(max_n AS HUGEINT) * n_keys * 1000) // total_rows
        |    AS BIGINT)
        | FROM oagg CROSS JOIN otop)
        |ORDER BY key_col""".stripMargin,

    "rel_running_distinct" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS prio,
        |   CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INTEGER)
        |     AS ym,
        |   o_custkey, o_orderkey FROM orders),
        |m AS (
        |  SELECT prio, ym,
        |   sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS new_cust,
        |   count(*) AS n_orders
        |  FROM (SELECT *, row_number() OVER (PARTITION BY prio, o_custkey
        |          ORDER BY ym, o_orderkey) AS rn FROM o)
        |  GROUP BY 1, 2)
        |SELECT prio, ym, CAST(new_cust AS BIGINT) AS new_cust, n_orders,
        | CAST(sum(new_cust) OVER (PARTITION BY prio ORDER BY ym) AS BIGINT)
        |   AS cum_cust
        |FROM m ORDER BY prio, ym""".stripMargin,

    "rel_listagg" ->
      """SELECT c_mktsegment, CAST(count(*) AS INTEGER) AS n_top,
        | string_agg(c_name, ',' ORDER BY rn) AS top_names
        |FROM (
        |  SELECT c_mktsegment, c_name,
        |   row_number() OVER (PARTITION BY c_mktsegment
        |     ORDER BY c_acctbal DESC, c_name) AS rn
        |  FROM customer)
        |WHERE rn <= 3 GROUP BY 1 ORDER BY 1""".stripMargin,

    "rel_q19_disjunctive" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |   * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin
  )
}
