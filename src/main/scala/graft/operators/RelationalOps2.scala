package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Fns._

/** Relational layer, part 2: arg-max, pivot/unpivot, the wider scalar
  * function surface (string/date/array), and approximate aggregates
  * (SURVEY.md §2.3/§2.8).
  */
object RelationalOps2 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Arg-max per group via max + equality self-join + deterministic
    // tie-break (a different plan shape than the window-rank form).
    "rel_argmax" -> ((s, dir) => {
      import s.implicits._
      val cn = Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          $"c_nationkey" === $"n_nationkey")
        .select($"n_name", $"c_custkey", $"c_acctbal")
      val mx = cn.groupBy($"n_name".as("mn")).agg(max($"c_acctbal").as("max_bal"))
      cn.join(mx, $"n_name" === $"mn" && $"c_acctbal" === $"max_bal")
        .groupBy($"n_name", $"max_bal")
        .agg(min($"c_custkey").as("top_custkey"))
        .select($"n_name", $"top_custkey", $"max_bal")
        .orderBy($"n_name")
    }),

    // Pivot: returnflag categories to columns.
    "rel_pivot" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(dec2($"l_quantity")).cast("double"))
        .orderBy($"l_linestatus")
    }),

    // Unpivot: wide part attributes to (attr, val) rows.
    "rel_unpivot" -> ((s, dir) => {
      import s.implicits._
      Tables.part(s, dir)
        .select($"p_partkey", $"p_size".cast("double").as("size"),
          $"p_retailprice".as("retailprice"))
        .unpivot(Array($"p_partkey"), Array($"size", $"retailprice"),
          "attr", "val")
        .orderBy($"p_partkey", $"attr")
        .limit(200)
    }),

    // Wider string-function surface.
    "rel_string_funcs2" -> ((s, dir) => {
      import s.implicits._
      Tables.customer(s, dir)
        .orderBy($"c_custkey").limit(100)
        .select(
          $"c_custkey",
          concat(upper(substring($"c_mktsegment", 1, 1)),
            lower(substring($"c_mktsegment", 2, 64))).as("seg_initcap"),
          reverse($"c_name").as("name_rev"),
          translate($"c_name", "#0", "_o").as("name_tr"),
          instr($"c_name", "#").as("hash_pos"),
          expr("split_part(c_name, '#', 2)").as("name_num"),
          expr("left(c_name, 8)").as("name_left"),
          expr("right(c_name, 3)").as("name_right"),
          rpad($"c_mktsegment", 12, ".").as("seg_pad"),
          repeat(expr("left(c_name, 2)"), 3).as("name_rep"))
    }),

    // Date/time function surface (NTZ-safe, string/int outputs).
    "rel_date_funcs" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .orderBy($"o_orderkey").limit(100)
        .select(
          $"o_orderkey",
          quarter($"o_orderdate").as("q"),
          month($"o_orderdate").as("m"),
          dayofmonth($"o_orderdate").as("dom"),
          (dayofweek($"o_orderdate") - 1).as("dow_sun0"),
          weekofyear($"o_orderdate").as("iso_week"),
          date_format(last_day($"o_orderdate"), "yyyy-MM-dd").as("month_end"),
          date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd")
            .as("month_start"),
          date_format(date_add($"o_orderdate", 45), "yyyy-MM-dd")
            .as("plus45"))
    }),

    // TPC-H Q6-style forecasting: pure filter + single-value aggregate —
    // the fully-pushed-down scan shape.
    "rel_q6_forecast" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" >= to_timestamp(lit("1997-01-01 00:00:00")) &&
                $"l_shipdate" < to_timestamp(lit("1998-01-01 00:00:00")) &&
                $"l_discount" >= 0.05 && $"l_discount" <= 0.07 &&
                $"l_quantity" < 24)
        .agg(sum(dec2($"l_extendedprice") * rate($"l_discount"))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Exact percentiles (interpolated), min/max spread per priority —
    // routed through the one pipeline body with the documented
    // exact/approx switch. exact=true is the oracle-parity choice here
    // (5 bounded groups); approx_percentile is the production default at
    // high group cardinality (see GraftPipelines.groupedPercentiles).
    // Data profile (Deequ-style observability panel): per-column row /
    // null / distinct counts and min-max, ONE pass over the table —
    // the check a pipeline runs before trusting a new source.
    "rel_profile" -> ((s, dir) => {
      import s.implicits._
      graft.api.GraftPipelines.profile(Tables.orders(s, dir),
          numericCols = Seq("o_orderkey", "o_custkey", "o_totalprice"),
          stringCols = Seq("o_orderstatus", "o_orderpriority"))
        .orderBy($"column")
    }),

    // TPC-H Q14 shape on the testdata's type vocabulary: per ship
    // month, the percentage of revenue from ECONOMY-type parts —
    // join + conditional-revenue ratio. Sums are exact decimal
    // (order-independent); only the final ratio is double, with the
    // identical expression in both engines.
    "rel_q14_type_share" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir).select($"p_partkey", $"p_type")
      li.join(p, $"l_partkey" === $"p_partkey")
        .withColumn("m", month($"l_shipdate".cast("timestamp")).cast("int"))
        .groupBy($"m")
        .agg(
          sum(when($"p_type" === "ECONOMY",
            revenue($"l_extendedprice", $"l_discount"))
            .otherwise(lit(0).cast("decimal(12,2)"))).as("econ_rev"),
          sum(revenue($"l_extendedprice", $"l_discount")).as("total_rev"))
        .select($"m",
          ((lit(100.0) * $"econ_rev".cast("double")) /
            $"total_rev".cast("double")).as("econ_share_pct"))
        .orderBy($"m")
    }),

    "rel_percentile" -> ((s, dir) => {
      import s.implicits._
      graft.api.GraftPipelines.groupedPercentiles(
          Tables.orders(s, dir), "o_orderpriority", "o_totalprice",
          Seq(0.5, 0.9), exact = true,
          extraAggs = Seq(min($"o_totalprice").as("min_price"),
            max($"o_totalprice").as("max_price")))
        .withColumnsRenamed(Map("p50" -> "median_price", "p90" -> "p90_price"))
        .orderBy($"o_orderpriority")
    }),

    // GROUPING SETS (explicit set list, not rollup/cube).
    "rel_grouping_sets" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .groupingSets(
          Seq(Seq($"o_orderstatus"), Seq($"o_orderpriority")),
          $"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), sumMoney($"o_totalprice").as("total"))
        .orderBy($"o_orderstatus".asc_nulls_first,
          $"o_orderpriority".asc_nulls_first)
    }),

    // Pearson correlation per segment from EXACT decimal moments (built-in
    // corr() streams doubles → partition-order-dependent low bits; the
    // moment form is deterministic and oracle-identical).
    "rel_corr" -> ((s, dir) => {
      import s.implicits._
      Tables.customer(s, dir)
        .groupBy($"c_mktsegment")
        .agg(
          count(lit(1)).as("n"),
          sum(dec2($"c_acctbal")).cast("double").as("sx"),
          sum($"c_nationkey".cast("long")).as("sy"),
          sum(dec2($"c_acctbal") * dec2($"c_acctbal")).cast("double").as("sxx"),
          sum($"c_nationkey".cast("long") * $"c_nationkey").as("syy"),
          sum(dec2($"c_acctbal") * $"c_nationkey").cast("double").as("sxy"))
        .withColumn("corr_xy",
          (($"n" * $"sxy") - ($"sx" * $"sy")) /
            (sqrt(($"n" * $"sxx") - ($"sx" * $"sx")) *
             sqrt(($"n" * $"syy".cast("double")) - ($"sy".cast("double") * $"sy"))))
        .select($"c_mktsegment", $"n", $"corr_xy")
        .orderBy($"c_mktsegment")
    }),

    // Production-default twins of rel_profile / rel_percentile: the
    // exact paths above are what the hash-compared oracle needs; these
    // sketch paths (HLL distinct, approx_percentile) are the switch the
    // 100 TB user actually runs — benched as headline entries so the
    // production config has a recorded figure, with accuracy pinned in
    // ScalaTest (like rel_approx, sketches are engine-specific → the
    // driver records a rows-only check).
    "rel_profile_approx" -> ((s, dir) => {
      import s.implicits._
      graft.api.GraftPipelines.profile(Tables.orders(s, dir),
          numericCols = Seq("o_orderkey", "o_custkey", "o_totalprice"),
          stringCols = Seq("o_orderstatus", "o_orderpriority"),
          exactDistinct = false)
        .orderBy($"column")
    }),

    "rel_percentile_approx" -> ((s, dir) => {
      import s.implicits._
      graft.api.GraftPipelines.groupedPercentiles(
          Tables.orders(s, dir), "o_orderpriority", "o_totalprice",
          Seq(0.5, 0.9), exact = false,
          extraAggs = Seq(min($"o_totalprice").as("min_price"),
            max($"o_totalprice").as("max_price")))
        .withColumnsRenamed(Map("p50" -> "median_price", "p90" -> "p90_price"))
        .orderBy($"o_orderpriority")
    }),

    // The vendored-SQLite completion exercised END-TO-END as an oracle
    // row (GraftIOSpec covers the connector mechanics; this makes it a
    // green CORRECTNESS entry): stage the nation dimension in an
    // embedded relational store over JDBC, read it back with a
    // pushed-down predicate, aggregate — hash-matched against the same
    // relation read directly, so any JDBC type/value mangling breaks
    // the compare. jdbc:derby:memory lives in this JVM: exercised in
    // local mode; a cluster deployment points the same connector at a
    // networked store.
    "rel_jdbc_roundtrip" -> ((s, dir) => {
      import s.implicits._
      System.setProperty("derby.stream.error.file", "/tmp/derby.log")
      val url = "jdbc:derby:memory:graftq;create=true"
      graft.sources.GraftIO.writeJdbc(Tables.nation(s, dir), url,
        "nation_store")
      graft.sources.GraftIO.readJdbc(s, url, "nation_store")
        .filter($"n_regionkey" < 3)
        .groupBy($"n_regionkey")
        .agg(count(lit(1)).as("n_nations"),
          array_join(array_sort(collect_list($"n_name")), ",").as("nations"))
        .orderBy($"n_regionkey")
    }),

    // Data-quality constraint gate (Deequ-style verification suite) —
    // the decision layer on top of rel_profile's observability panel:
    // a declarative rule set evaluated as ONE aggregate pass per table
    // plus one anti-join per referential rule, emitting (rule, metric,
    // passed) so a pipeline can gate promotion of a new source on
    // `min(passed) = 1`. Shape at 100 TB: the row-level rules ride a
    // single map-side-combined scan of the fact; uniqueness is one
    // distinct agg on the dim; referential integrity is a left-anti
    // keyed on the join key — the same shuffle layout the downstream
    // joins need anyway. The 1-row aggregate crossJoins are the audited
    // bounded-scalar pattern.
    "rel_constraints" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      val liAgg = li.agg(
        count(lit(1)).as("n"),
        sum(when($"l_quantity".isNull, 1L).otherwise(0L)).as("n_null_qty"),
        sum(when($"l_discount" >= 0.0 && $"l_discount" <= 0.1, 1L)
          .otherwise(0L)).as("n_disc_ok"),
        sum(when($"l_extendedprice" >= 0.0, 1L).otherwise(0L))
          .as("n_price_ok"))
      val ordAgg = ord.agg(count(lit(1)).as("n_ord"),
        countDistinct($"o_orderkey").as("n_ord_keys"))
      val orphans = li.select($"l_orderkey")
        .join(ord.select($"o_orderkey"),
          $"l_orderkey" === $"o_orderkey", "left_anti")
        .agg(count(lit(1)).as("n_orphan"))
      val facts = liAgg.crossJoin(ordAgg).crossJoin(orphans)
      def rule(name: String, metric: Column, passed: Column) =
        facts.select(lit(name).as("rule"),
          metric.cast("double").as("metric"), passed.cast("int").as("passed"))
      rule("complete_l_quantity",
          $"n_null_qty".cast("double") / $"n", $"n_null_qty" === 0)
        .unionAll(rule("nonneg_l_extendedprice",
          $"n_price_ok".cast("double") / $"n", $"n_price_ok" === $"n"))
        .unionAll(rule("range_l_discount",
          $"n_disc_ok".cast("double") / $"n", $"n_disc_ok" === $"n"))
        .unionAll(rule("ri_lineitem_orders",
          $"n_orphan".cast("double"), $"n_orphan" === 0))
        .unionAll(rule("unique_o_orderkey",
          $"n_ord_keys".cast("double") / $"n_ord", $"n_ord_keys" === $"n_ord"))
        .orderBy($"rule")
    }),

    // Approximate aggregates — no SQL oracle (HLL/quantile sketches are
    // engine-specific); accuracy is asserted against exact counts in
    // ScalaTest instead, and the driver records a rows-only check.
    // Distinct uses DataSketches hll_sketch_agg (lgK=14, ~0.8% error,
    // one BINARY buffer per group) for the same reason profile() does:
    // legacy approx_count_distinct at rsd 0.01 expands to ~1.5k long
    // agg-buffer attributes PER GROUP and collapses the codegen'd
    // update path on any multi-partition scan (measured in DevHll).
    "rel_approx" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .groupBy($"o_orderpriority")
        .agg(
          hll_sketch_estimate(hll_sketch_agg($"o_custkey", lit(14)))
            .as("approx_custs"),
          percentile_approx($"o_totalprice", lit(0.5), lit(1000))
            .as("approx_median"))
        .orderBy($"o_orderpriority")
    })
  )

  val oracles: Map[String, String] = Map(
    "rel_constraints" ->
      """WITH li AS (
        |  SELECT count(*) AS n,
        |   sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS n_null_qty,
        |   sum(CASE WHEN l_discount >= 0.0 AND l_discount <= 0.1
        |       THEN 1 ELSE 0 END) AS n_disc_ok,
        |   sum(CASE WHEN l_extendedprice >= 0.0 THEN 1 ELSE 0 END) AS n_price_ok
        |  FROM lineitem),
        |o AS (SELECT count(*) AS n_ord,
        |       count(DISTINCT o_orderkey) AS n_ord_keys FROM orders),
        |orph AS (SELECT count(*) AS n_orphan FROM lineitem
        |         WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        |SELECT 'complete_l_quantity' AS rule,
        |  CAST(n_null_qty AS DOUBLE) / n AS metric,
        |  CAST(n_null_qty = 0 AS INTEGER) AS passed FROM li
        |UNION ALL SELECT 'nonneg_l_extendedprice',
        |  CAST(n_price_ok AS DOUBLE) / n, CAST(n_price_ok = n AS INTEGER) FROM li
        |UNION ALL SELECT 'range_l_discount',
        |  CAST(n_disc_ok AS DOUBLE) / n, CAST(n_disc_ok = n AS INTEGER) FROM li
        |UNION ALL SELECT 'ri_lineitem_orders',
        |  CAST(n_orphan AS DOUBLE), CAST(n_orphan = 0 AS INTEGER) FROM orph
        |UNION ALL SELECT 'unique_o_orderkey',
        |  CAST(n_ord_keys AS DOUBLE) / n_ord,
        |  CAST(n_ord_keys = n_ord AS INTEGER) FROM o
        |ORDER BY rule""".stripMargin,

    // the oracle reads nation directly: if the JDBC round-trip mangles
    // a type or value, the hashes diverge
    "rel_jdbc_roundtrip" ->
      """SELECT n_regionkey, count(*) AS n_nations,
        | string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation WHERE n_regionkey < 3
        |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,

    "rel_argmax" ->
      """SELECT n_name, min(c_custkey) AS top_custkey, max_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN (SELECT n_name AS mn, max(c_acctbal) AS max_bal
        |      FROM customer JOIN nation ON c_nationkey = n_nationkey
        |      GROUP BY 1) ON n_name = mn AND c_acctbal = max_bal
        |GROUP BY n_name, max_bal ORDER BY n_name""".stripMargin,

    "rel_pivot" ->
      """SELECT l_linestatus,
        | CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS A,
        | CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS N,
        | CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS R
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "rel_unpivot" ->
      """SELECT p_partkey, attr, val FROM (
        |  SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS val FROM part)
        |ORDER BY p_partkey, attr LIMIT 200""".stripMargin,

    "rel_q6_forecast" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "rel_corr" ->
      """SELECT c_mktsegment, n,
        | ((n * sxy) - (sx * sy)) /
        | (sqrt((n * sxx) - (sx * sx)) *
        |  sqrt((n * CAST(syy AS DOUBLE)) - (CAST(sy AS DOUBLE) * sy))) AS corr_xy
        |FROM (
        |  SELECT c_mktsegment, count(*) AS n,
        |   CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sx,
        |   CAST(sum(CAST(c_nationkey AS BIGINT)) AS BIGINT) AS sy,
        |   CAST(sum(CAST(c_acctbal AS DECIMAL(12,2)) * CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
        |   CAST(sum(CAST(c_nationkey AS BIGINT) * c_nationkey) AS BIGINT) AS syy,
        |   CAST(sum(CAST(c_acctbal AS DECIMAL(12,2)) * c_nationkey) AS DOUBLE) AS sxy
        |  FROM customer GROUP BY c_mktsegment)
        |ORDER BY c_mktsegment""".stripMargin,

    "rel_profile" -> {
      def num(c: String) =
        s"""SELECT '$c' AS "column", count(*) AS n,
           | count(*) - count($c) AS n_null,
           | count(DISTINCT $c) AS n_distinct,
           | CAST(min($c) AS DOUBLE) AS min_num,
           | CAST(max($c) AS DOUBLE) AS max_num,
           | CAST(NULL AS VARCHAR) AS min_str,
           | CAST(NULL AS VARCHAR) AS max_str
           |FROM orders""".stripMargin
      def str(c: String) =
        s"""SELECT '$c' AS "column", count(*) AS n,
           | count(*) - count($c) AS n_null,
           | count(DISTINCT $c) AS n_distinct,
           | CAST(NULL AS DOUBLE) AS min_num,
           | CAST(NULL AS DOUBLE) AS max_num,
           | min($c) AS min_str, max($c) AS max_str
           |FROM orders""".stripMargin
      (Seq("o_orderkey", "o_custkey", "o_totalprice").map(num) ++
        Seq("o_orderstatus", "o_orderpriority").map(str))
        .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    },

    "rel_q14_type_share" ->
      """SELECT m,
        | (100.0 * CAST(econ_rev AS DOUBLE)) / CAST(total_rev AS DOUBLE)
        |   AS econ_share_pct
        |FROM (
        |  SELECT CAST(month(CAST(l_shipdate AS TIMESTAMP)) AS INTEGER) AS m,
        |   sum(CASE WHEN p_type = 'ECONOMY'
        |        THEN CAST(l_extendedprice AS DECIMAL(12,2))
        |             * (1 - CAST(l_discount AS DECIMAL(4,2)))
        |        ELSE CAST(0 AS DECIMAL(12,2)) END) AS econ_rev,
        |   sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |       * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1)
        |ORDER BY m""".stripMargin,

    "rel_percentile" ->
      """SELECT o_orderpriority,
        | quantile_cont(o_totalprice, 0.5) AS median_price,
        | quantile_cont(o_totalprice, 0.9) AS p90_price,
        | min(o_totalprice) AS min_price,
        | max(o_totalprice) AS max_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "rel_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        | o_orderpriority ASC NULLS FIRST""".stripMargin,

    "rel_string_funcs2" ->
      """SELECT c_custkey,
        | upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2, 64)) AS seg_initcap,
        | reverse(c_name) AS name_rev,
        | translate(c_name, '#0', '_o') AS name_tr,
        | CAST(instr(c_name, '#') AS INTEGER) AS hash_pos,
        | split_part(c_name, '#', 2) AS name_num,
        | left(c_name, 8) AS name_left,
        | right(c_name, 3) AS name_right,
        | rpad(c_mktsegment, 12, '.') AS seg_pad,
        | repeat(left(c_name, 2), 3) AS name_rep
        |FROM customer ORDER BY c_custkey LIMIT 100""".stripMargin,

    "rel_date_funcs" ->
      """SELECT o_orderkey,
        | CAST(quarter(o_orderdate) AS INTEGER) AS q,
        | CAST(month(o_orderdate) AS INTEGER) AS m,
        | CAST(day(o_orderdate) AS INTEGER) AS dom,
        | CAST(dayofweek(o_orderdate) AS INTEGER) AS dow_sun0,
        | CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
        | strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
        | strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        | strftime(o_orderdate + INTERVAL 45 DAY, '%Y-%m-%d') AS plus45
        |FROM orders ORDER BY o_orderkey LIMIT 100""".stripMargin
  )
}
