package graft

/** Relational layer invariants (SURVEY.md §5.3 property strategy). */
class RelationalOpsSpec extends SparkSpec {

  test("rel_q1_pricing: group keys partition the filtered lineitem") {
    val rows = q("rel_q1_pricing").collect()
    assert(rows.nonEmpty && rows.length <= 6)
    rows.foreach { r =>
      val n = r.getAs[Long]("count_order")
      val sumQty = r.getAs[Double]("sum_qty")
      val avgQty = r.getAs[Double]("avg_qty")
      assert(math.abs(avgQty - sumQty / n) < 1e-9)
    }
  }

  test("semi + anti partition the customer table") {
    val semi = q("rel_join_semi").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_customers")).toMap
    val anti = q("rel_join_anti").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_customers")).toMap
    val total = spark.read.parquet(s"$sf/customer.parquet").count()
    val semiTotal = semi.values.sum
    val orderless = anti.values.sum
    // every customer either has an F order, has only non-F orders, or none;
    // semi(F) + complement must not exceed the table
    assert(semiTotal + orderless <= total)
    assert(semiTotal > 0)
  }

  test("rel_window_rank: at most 3 rows per customer, rn dense from 1") {
    val rows = q("rel_window_rank").collect()
    val byCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    byCust.values.foreach { rs =>
      val rns = rs.map(_.getAs[Int]("rn")).sorted
      assert(rns.length <= 3)
      assert(rns.sameElements(1 to rns.length))
      // prices non-increasing with rank
      val prices = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("o_totalprice"))
      assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
    }
  }

  test("set algebra: intersect ⊆ union, except ∩ intersect = ∅") {
    val union = q("rel_set_union").collect().map(_.getLong(0)).toSet
    val inter = q("rel_set_intersect").collect().map(_.getLong(0)).toSet
    val except = q("rel_set_except").collect().map(_.getLong(0)).toSet
    assert(inter.subsetOf(union))
    assert((except & inter).isEmpty)
    assert((except | inter).subsetOf(union))
  }

  test("rel_rollup: grand-total row equals sum of leaf rows") {
    val rows = q("rel_rollup").collect()
    val grand = rows.filter(r => r.getAs[Int]("g_region") == 1 &&
      r.getAs[Int]("g_nation") == 1)
    assert(grand.length == 1)
    val leaves = rows.filter(r => r.getAs[Int]("g_region") == 0 &&
      r.getAs[Int]("g_nation") == 0)
    val leafN = leaves.map(_.getAs[Long]("n")).sum
    assert(grand.head.getAs[Long]("n") == leafN)
    val leafBal = leaves.map(_.getAs[Double]("sum_bal")).sum
    assert(math.abs(grand.head.getAs[Double]("sum_bal") - leafBal) < 1e-6)
  }

  test("rel_window_running: final running total equals group sum") {
    val rows = q("rel_window_running").collect()
      .groupBy(_.getAs[Long]("o_custkey"))
    rows.values.foreach { rs =>
      val last = rs.maxBy(_.getAs[Long]("run_cnt"))
      assert(last.getAs[Long]("run_cnt") == rs.length)
    }
  }

  test("rel_profile_approx: HLL distincts within 2% of exact, rest identical") {
    def byCol(name: String) = q(name).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    val exact = byCol("rel_profile")
    val approx = byCol("rel_profile_approx")
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (c, e) =>
      val a = approx(c)
      // only the distinct count is sketched — everything else is the
      // same one-pass aggregate and must match exactly
      assert(a.getAs[Long]("n") == e.getAs[Long]("n"))
      assert(a.getAs[Long]("n_null") == e.getAs[Long]("n_null"))
      assert(a.getAs[Double]("min_num") == e.getAs[Double]("min_num") ||
        (a.isNullAt(a.fieldIndex("min_num")) && e.isNullAt(e.fieldIndex("min_num"))))
      val ed = e.getAs[Long]("n_distinct").toDouble
      val ad = a.getAs[Long]("n_distinct").toDouble
      assert(math.abs(ad - ed) / ed <= 0.02, s"$c: approx=$ad exact=$ed")
    }
  }

  test("approx sketches ride ObjectHashAggregate binary buffers, not the " +
      "legacy per-word column expansion") {
    // regression guard for the driver-round-8 DevHll finding: legacy
    // approx_count_distinct at rsd 0.01 expands to ~1.5k long buffer
    // attributes per sketch and collapses codegen on multi-partition
    // scans; the DataSketches path keeps one binary buffer per sketch
    // and plans as ObjectHashAggregate
    for (name <- Seq("rel_profile_approx", "rel_approx")) {
      val plan = q(name).queryExecution.executedPlan.toString
      assert(plan.contains("ObjectHashAggregate"),
        s"$name must aggregate sketches via ObjectHashAggregate")
      assert(!plan.contains("approx_count_distinct"),
        s"$name must not use the legacy per-word-buffer HLL")
    }
  }

  test("profile sketch counts -0.0 and 0.0 as one distinct (string-cast " +
      "normalization)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // grouping/countDistinct normalize -0.0 == 0.0 but their string
    // forms differ; the sketch path adds +0 before the cast to keep
    // the distinct count identical to the exact switch
    val df = Seq(0.0, -0.0, 1.5, Double.NaN).toDF("v")
    def nd(exact: Boolean) = graft.api.GraftPipelines
      .profile(df, numericCols = Seq("v"), stringCols = Nil,
        exactDistinct = exact)
      .select(col("n_distinct")).collect().head.getLong(0)
    assert(nd(exact = true) == nd(exact = false),
      "sketch distinct must match exact distinct on ±0.0/NaN inputs")
  }

  test("rel_percentile_approx: sketch medians within 2.5% of the exact query") {
    def byPrio(name: String) = q(name).collect()
      .map(r => r.getAs[String]("o_orderpriority") ->
        (r.getAs[Double]("median_price"), r.getAs[Double]("p90_price"))).toMap
    val exact = byPrio("rel_percentile")
    val approx = byPrio("rel_percentile_approx")
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, (e50, e90)) =>
      val (a50, a90) = approx(k)
      // tolerance dominated by interpolate-vs-member semantics at this
      // SF (see the groupedPercentiles spec below), not sketch error
      assert(math.abs(a50 - e50) / e50 < 0.025, s"$k p50: $a50 vs $e50")
      assert(math.abs(a90 - e90) / e90 < 0.025, s"$k p90: $a90 vs $e90")
    }
  }

  test("groupedPercentiles: approx sketch path stays within 2.5% of exact") {
    // exact percentile() is the oracle-parity/bounded-groups tool; the
    // approx sketch is the 100 TB path (docs/PLANS.md rel_percentile) —
    // this pins the accuracy contract that makes the swap safe
    val orders = Tables.orders(spark, sf)
    val ps = Seq(0.5, 0.9)
    def collectPs(exact: Boolean) =
      api.GraftPipelines
        .groupedPercentiles(orders, "o_orderpriority", "o_totalprice", ps,
          exact = exact)
        .collect()
        .map(r => r.getAs[String]("o_orderpriority") ->
          (r.getAs[Double]("p50"), r.getAs[Double]("p90")))
        .toMap
    val ex = collectPs(exact = true)
    val ap = collectPs(exact = false)
    assert(ex.keySet == ap.keySet)
    // tolerance is dominated by semantics, not sketch error, at this SF:
    // exact percentile() interpolates between members, approx returns an
    // actual member — with ~30 values/group one inter-member gap is ~2%
    ex.foreach { case (k, (e50, e90)) =>
      val (a50, a90) = ap(k)
      assert(math.abs(a50 - e50) / e50 < 0.025, s"$k p50: $a50 vs $e50")
      assert(math.abs(a90 - e90) / e90 < 0.025, s"$k p90: $a90 vs $e90")
    }
  }

  test("rel_constraints: clean corpus passes all rules; a planted orphan " +
      "fails exactly the referential rule") {
    val clean = q("rel_constraints").collect()
      .map(r => r.getAs[String]("rule") -> r.getAs[Int]("passed")).toMap
    assert(clean.size == 5 && clean.values.forall(_ == 1),
      s"driver corpus must satisfy every rule: $clean")
    // corrupt fixture: one lineitem row pointing at a nonexistent order
    val li = Tables.lineitem(spark, sf)
    val orphan = li.limit(1).withColumn("l_orderkey",
      org.apache.spark.sql.functions.lit(-999L))
    val dir = tempSfDir(
      "lineitem" -> li.unionByName(orphan),
      "orders" -> Tables.orders(spark, sf))
    val bad = SparkEntry.queries("rel_constraints")(spark, dir).collect()
      .map(r => r.getAs[String]("rule") ->
        (r.getAs[Double]("metric"), r.getAs[Int]("passed"))).toMap
    assert(bad("ri_lineitem_orders") == ((1.0, 0)),
      s"orphan must fail RI with metric 1: ${bad("ri_lineitem_orders")}")
    assert(bad.filter(_._1 != "ri_lineitem_orders").values.forall(_._2 == 1),
      s"only the RI rule may fail: $bad")
  }

  test("rel_q21_waiting: at-scale plan is semi+anti on one shuffle key, no cartesian") {
    // At bench SFs Catalyst broadcasts the column-pruned fact legs (fine
    // and fast there). This pins the 100 TB shape: with broadcast off,
    // both quantified predicates become sort-merge semi/anti joins keyed
    // on l_orderkey — the probe shuffles ONCE and the anti join consumes
    // the semi join's partitioning with no re-exchange — and nothing
    // degenerates to a cartesian (the non-equality suppkey predicate
    // rides the equi-join as a residual condition).
    val old = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = q("rel_q21_waiting")
      val plan = df.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin") && plan.contains("LeftSemi"),
        s"expected a sort-merge LeftSemi in:\n${plan.take(1500)}")
      assert(plan.contains("LeftAnti"),
        s"expected a LeftAnti in:\n${plan.take(1500)}")
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        "quantified predicates must stay equi-join-keyed")
      // probe-side partitioning reuse: 3 fact legs + 1 orders leg shuffle
      // on the order key; the anti join adds NO extra probe exchange.
      val orderKeyExchanges =
        "hashpartitioning\\((?:l_orderkey|o_orderkey|l2_orderkey|l3_orderkey)"
          .r.findAllIn(plan).size
      assert(orderKeyExchanges <= 4,
        s"expected ≤4 order-key exchanges (no probe re-shuffle), got $orderKeyExchanges:\n$plan")
      assert(df.collect().nonEmpty)
    } finally old match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("rel_window_distribution: cume_dist stays in (0,1], third_price is " +
      "the partition's true 3rd-highest, dense ranks are date-bounded") {
    val rows = q("rel_window_distribution").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0))
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderpriority", "o_totalprice", "o_orderdate").collect()
    // 3rd-highest price per priority under (price desc, key) — price
    // alone suffices here because we only compare the price value
    val third = ord.groupBy(_.getString(0)).map { case (p, rs) =>
      p -> rs.map(-_.getDouble(1)).sorted.apply(2) * -1
    }
    assert(rows.forall(r => r.getDouble(4) == third(r.getString(0))))
    // dense_rank ranges over DISTINCT dates, not rows — the tie
    // semantics rel_window_rank's row_number can't show
    val nDates = ord.groupBy(_.getString(0)).map { case (p, rs) =>
      p -> rs.map(_.get(2)).distinct.length
    }
    assert(rows.forall(r => r.getInt(2) >= 1 &&
      r.getInt(2) <= nDates(r.getString(0))))
    val rowsPerPartition = ord.groupBy(_.getString(0))
      .map { case (p, rs) => p -> rs.length }
    assert(nDates.exists { case (p, d) => d < rowsPerPartition(p) },
      "no partition had date ties — dense_rank degenerated to row_number")
  }
}
