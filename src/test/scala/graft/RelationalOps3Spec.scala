package graft

import org.apache.spark.sql.functions._

/** Specs for the round-8 TPC-H shapes (RelationalOps3): plan-shape
  * assertions pin the 100 TB join strategies (broadcast off where the
  * at-scale shape matters), micro-fixtures pin the semantics the oracle
  * hash alone can under-determine (outer-join preservation, strict
  * boundary of the correlated-avg filter).
  */
class RelationalOps3Spec extends SparkSpec {
  import spark.implicits._

  test("rel_q7_volume: nation dims broadcast, disjunction stays equi-keyed") {
    val df = q("rel_q7_volume", "/root/testdata/sf0.01")
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "two-sided nation disjunction must not degrade the equi joins")
    // both nation legs are compile-time broadcasts (25-row dim at any SF)
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"expected both nation joins broadcast in:\n${plan.take(2000)}")
    val rows = df.collect()
    assert(rows.length == 4, s"expected 4 direction×year groups, got ${rows.length}")
    // both directions present
    val dirs = rows.map(r => (r.getString(0), r.getString(1))).distinct
    assert(dirs.toSet == Set(("NATION_3", "NATION_7"), ("NATION_7", "NATION_3")))
  }

  test("rel_q8_market_share: one conditional-agg pass, single fact scan") {
    val df = q("rel_q8_market_share", "/root/testdata/sf0.01")
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
    // share numerator and denominator come from ONE aggregate over ONE
    // lineitem scan — never a per-term re-scan of the snowflake.
    val factScans = "lineitem\\.parquet".r.findAllIn(plan).size
    assert(factScans == 1, s"expected 1 lineitem scan, got $factScans")
    val rows = df.collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1996, 1997))
    rows.foreach { r =>
      val share = r.getDouble(1)
      assert(share > 0.0 && share < 1.0, s"share out of range: $share")
    }
  }

  test("rel_q13_custdist: right-side filter preserves zero-order customers") {
    // c1: no orders at all; c2: only URGENT orders (all filtered by the
    // join-side predicate); c3: two surviving orders. A WHERE instead of
    // a join-side filter would drop c1/c2 — the spec's classic trap.
    val dir = tempSfDir(
      "customer" -> Seq(1L, 2L, 3L).toDF("c_custkey"),
      "orders" -> Seq(
        (10L, 2L, "1-URGENT"),
        (11L, 2L, "1-URGENT"),
        (12L, 3L, "5-LOW"),
        (13L, 3L, "2-HIGH")
      ).toDF("o_orderkey", "o_custkey", "o_orderpriority"))
    val rows = q("rel_q13_custdist", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows == Map(0L -> 2L, 2L -> 1L),
      s"zero-order customers must survive with c_count=0; got $rows")
  }

  test("rel_q17_small_qty: strict 0.2·avg boundary in exact decimals") {
    // part 1 (qualifying brand+size): quantities 1,1,1,1,26 -> avg 6,
    // threshold 1.2 -> the four qty=1 rows qualify. part 2 fails the
    // size gate with a qty that WOULD qualify; part 3 fails the brand
    // gate. part 4 pins strictness: quantities 1,1,1,17 -> avg 5,
    // threshold exactly 1.0 -> qty=1 sits ON the boundary and must be
    // EXCLUDED (spec's l_quantity < 0.2*avg is strict).
    val dir = tempSfDir(
      "part" -> Seq(
        (1L, "Brand#1", 5),
        (2L, "Brand#1", 20),
        (3L, "Brand#2", 5),
        (4L, "Brand#1", 3)
      ).toDF("p_partkey", "p_brand", "p_size"),
      "lineitem" -> Seq(
        (1L, 1.0, 10.0), (1L, 1.0, 10.0), (1L, 1.0, 10.0), (1L, 1.0, 10.0),
        (1L, 26.0, 99.0),
        (2L, 1.0, 777.0), (2L, 49.0, 777.0),
        (3L, 1.0, 888.0), (3L, 49.0, 888.0),
        (4L, 1.0, 55.0), (4L, 1.0, 55.0), (4L, 1.0, 55.0), (4L, 17.0, 55.0)
      ).toDF("l_partkey", "l_quantity", "l_extendedprice"))
    val row = q("rel_q17_small_qty", dir).collect().head
    assert(row.getLong(1) == 4L, s"expected the 4 sub-threshold rows, got $row")
    assert(math.abs(row.getDouble(0) - 40.0 / 7.0) < 1e-9, s"got $row")
  }

  test("rel_q17_small_qty: correlated agg reuses one l_partkey shuffle layout") {
    val old = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = q("rel_q17_small_qty", "/root/testdata/sf0.01")
      val plan = df.queryExecution.executedPlan.toString()
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"))
      // the per-part aggregate and its join-back both key on l_partkey /
      // a_partkey — decorrelation must not introduce an extra re-key of
      // the probe side beyond the agg + two join legs.
      val partKeyExchanges =
        "hashpartitioning\\((?:l_partkey|a_partkey|p_partkey)".r
          .findAllIn(plan).size
      assert(partKeyExchanges <= 4,
        s"expected ≤4 partkey exchanges, got $partKeyExchanges:\n$plan")
    } finally old match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("rel_basket_pairs: per-order co-occurrence, duplicate lines count once") {
    val li = Seq(
      (1L, 100L), (1L, 100L), (1L, 200L), (1L, 300L), // dup line: once
      (2L, 100L), (2L, 200L),
      (3L, 200L), (3L, 100L))
      .toDF("l_orderkey", "l_partkey")
    val dir = tempSfDir("lineitem" -> li)
    val out = q("rel_basket_pairs", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // only (100,200) reaches support 2 (appears in all three orders)
    assert(out == Map((100L, 200L) -> 3L))
  }

  test("rel_skew_report: hand-computed skew factor and heaviest key") {
    val orders = (1 to 8).map(i => (i.toLong, 1L)) ++
      Seq((9L, 2L), (10L, 3L))
    val li = Seq((1L, 7L), (2L, 7L), (3L, 9L), (4L, 9L))
    val dir = tempSfDir(
      "orders" -> orders.toDF("o_orderkey", "o_custkey"),
      "lineitem" -> li.toDF("l_orderkey", "l_partkey"))
    val out = q("rel_skew_report", dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val oc = out("o_custkey")
    // custkey: 3 keys over 10 rows, max 8 → skew = 8·3·1000 div 10 = 2400
    assert(oc.getAs[Long]("n_keys") == 3L)
    assert(oc.getAs[Long]("max_n") == 8L)
    assert(oc.getAs[Long]("top_key") == 1L)
    assert(oc.getAs[Long]("skew_x1000") == 2400L)
    val lp = out("l_partkey")
    // perfectly uniform partkey → skew factor exactly 1000; tie on
    // max_n=2 → smallest key 7 reported
    assert(lp.getAs[Long]("skew_x1000") == 1000L)
    assert(lp.getAs[Long]("top_key") == 7L)
  }

  test("rel_running_distinct: first-occurrence marks accumulate, repeats don't") {
    val orders = Seq(
      (1L, 10L, "2024-01-05", "P1"), (2L, 10L, "2024-01-20", "P1"),
      (3L, 10L, "2024-02-01", "P1"), (4L, 20L, "2024-02-10", "P1"),
      (5L, 30L, "2024-01-15", "P2"))
      .toDF("o_orderkey", "o_custkey", "d", "o_orderpriority")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
    val dir = tempSfDir("orders" -> orders)
    val out = q("rel_running_distinct", dir).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // P1 Jan: cust 10 first seen (2 orders); Feb: cust 20 new, cust 10 repeat
    assert(out(("P1", 202401)) == ((1L, 2L, 1L)))
    assert(out(("P1", 202402)) == ((1L, 2L, 2L)))
    assert(out(("P2", 202401)) == ((1L, 1L, 1L)))
  }

  test("rel_listagg: rank-ordered concatenation with balance ties by name") {
    val cust = Seq(
      ("nA", 50.0, "SEG1"), ("nB", 40.0, "SEG1"), ("nC", 40.0, "SEG1"),
      ("nD", 10.0, "SEG1"), ("nE", 5.0, "SEG2"))
      .toDF("c_name", "c_acctbal", "c_mktsegment")
    val dir = tempSfDir("customer" -> cust)
    val out = q("rel_listagg", dir).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(out("SEG1") == ((3, "nA,nB,nC")))
    assert(out("SEG2") == ((1, "nE")))
  }

  test("rel_q19_disjunctive: OR-of-conjunctions stays a partkey hash join") {
    val old = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = q("rel_q19_disjunctive", "/root/testdata/sf0.01")
      val plan = df.queryExecution.executedPlan.toString()
      // the partkey equality is a common conjunct of every disjunct: the
      // join must remain equi-keyed with the OR as a residual, never a
      // nested-loop over the fact.
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected an equi join in:\n${plan.take(1500)}")
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        "disjunction must ride the equi join as a residual condition")
      val row = df.collect().head
      assert(row.getLong(1) > 0L, "expected matching items at sf0.01")
    } finally old match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
