package graft

import org.apache.spark.sql.functions._

/** The five rows-only sketch entries' accuracy contracts, asserted at
  * the 10× sf1 corpus (`target/sf1`, written by `graft.DevScale`) —
  * the scale the sketches exist FOR. The per-entry specs in
  * JoinOpsSpec / RelationalOpsSpec / AnalyticsOpsSpec /
  * MaintenanceOpsSpec pin the same tolerances at test scale on every
  * run; this sweep re-asserts each `SparkEntry.rowsOnlyMeta` twin at
  * sf1 so the accuracy story holds where the exact twin stops being
  * affordable. Guarded by `assume`: on a checkout without the
  * generated sf1 corpus the sweep cancels (with the DevScale pointer)
  * rather than fails — the driver's containers and the round sweeps
  * always have it.
  */
class SketchAccuracySf1Spec extends SparkSpec {
  import spark.implicits._

  private val sf1 = "target/sf1"
  private def sf1Present: Boolean =
    new java.io.File(s"$sf1/orders.parquet").exists()

  private def assumeSf1(): Unit =
    assume(sf1Present, s"$sf1 missing - generate with `runMain graft.DevScale`")

  test("rel_approx @ sf1: HLL distincts within 5% of exact, per group") {
    assumeSf1()
    val approx = q("rel_approx", sf1).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("approx_custs")).toMap
    val exact = spark.read.parquet(s"$sf1/orders.parquet")
      .groupBy("o_orderpriority")
      .agg(countDistinct("o_custkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(exact.keySet == approx.keySet && exact.nonEmpty)
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n < 0.05,
        s"$k: approx=${approx(k)} exact=$n")
    }
  }

  test("rel_profile_approx @ sf1: HLL distincts within 2% of exact, " +
      "rest identical") {
    assumeSf1()
    def byCol(name: String) = q(name, sf1).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    val exact = byCol("rel_profile")
    val approx = byCol("rel_profile_approx")
    assert(exact.keySet == approx.keySet && exact.nonEmpty)
    exact.foreach { case (c, e) =>
      val a = approx(c)
      assert(a.getAs[Long]("n") == e.getAs[Long]("n"))
      assert(a.getAs[Long]("n_null") == e.getAs[Long]("n_null"))
      assert(a.getAs[Double]("min_num") == e.getAs[Double]("min_num") ||
        (a.isNullAt(a.fieldIndex("min_num")) &&
          e.isNullAt(e.fieldIndex("min_num"))))
      val ed = e.getAs[Long]("n_distinct").toDouble
      val ad = a.getAs[Long]("n_distinct").toDouble
      assert(math.abs(ad - ed) / ed <= 0.02, s"$c: approx=$ad exact=$ed")
    }
  }

  test("rel_percentile_approx @ sf1: sketch p50/p90 within 2.5% of exact, " +
      "per group") {
    assumeSf1()
    def byPrio(name: String) = q(name, sf1).collect()
      .map(r => r.getAs[String]("o_orderpriority") ->
        ((r.getAs[Double]("median_price"), r.getAs[Double]("p90_price"))))
      .toMap
    val exact = byPrio("rel_percentile")
    val approx = byPrio("rel_percentile_approx")
    assert(exact.keySet == approx.keySet && exact.nonEmpty)
    exact.foreach { case (k, (e50, e90)) =>
      val (a50, a90) = approx(k)
      assert(math.abs(a50 - e50) / e50 < 0.025, s"$k p50: $a50 vs $e50")
      assert(math.abs(a90 - e90) / e90 < 0.025, s"$k p90: $a90 vs $e90")
    }
  }

  test("ev_sliding_distinct @ sf1: sliding HLL unions within 5% of exact, " +
      "merge arity bounded") {
    assumeSf1()
    val got = q("ev_sliding_distinct", sf1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.nonEmpty && got.values.forall(_._2 <= 6),
      "a window must merge at most 6 hourly states")
    val exact = operators.EventOps.events(spark, sf1)
      .select(graft.functions.Fns.floorDiv("ts_ms", 3600000L).as("h"),
        col("user_id"))
      .select(explode(expr("sequence(h, h + 5)")).as("w"), col("user_id"))
      .groupBy(col("w"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == exact.keySet)
    got.foreach { case (w, (approx, _)) =>
      val e = exact(w)
      assert(math.abs(approx - e) <= math.max(1L, e / 20),
        s"window $w: approx $approx vs exact $e")
    }
  }

  test("rel_distinct_incremental @ sf1: merged batch states equal the " +
      "single-pass sketch, both within 2% of exact") {
    assumeSf1()
    val merged = q("rel_distinct_incremental", sf1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val single = Tables.orders(spark, sf1)
      .groupBy($"o_orderpriority")
      .agg(hll_sketch_estimate(hll_sketch_agg($"o_custkey", 14)).as("est"),
        countDistinct($"o_custkey").as("exact"))
      .collect()
    assert(single.length == merged.size && merged.nonEmpty)
    single.foreach { r =>
      val (prio, est, exact) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(merged(prio) == est, s"$prio merged=${merged(prio)} single=$est")
      assert(math.abs(est - exact).toDouble / exact <= 0.02,
        s"$prio est=$est exact=$exact")
    }
  }
}
