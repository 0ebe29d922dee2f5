package graft

/** Temporal joins + part-2 relational ops. */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000L // 1s in ns

  test("ev_asof_join: error matches most recent signup at-or-before") {
    val events = Seq(
      (1L, 100 * S, 7L, "signup", 1.0, "{}"),
      (2L, 200 * S, 7L, "error", 1.0, "{}"),   // → signup@100
      (3L, 300 * S, 7L, "signup", 1.0, "{}"),
      (4L, 300 * S, 7L, "error", 1.0, "{}"),   // same instant → signup@300
      (5L, 400 * S, 8L, "error", 1.0, "{}"))   // user 8: no signup → null
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tempSfDir("events" -> events)
    val got = q("ev_asof_join", dir).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toMap
    assert(got(2L) == 100 * S / 1000000)
    assert(got(4L) == 300 * S / 1000000)
    assert(got(5L) == -1L)
  }

  test("ev_range_join: counts events strictly within (t, t+1h]") {
    val events = Seq(
      (1L, 0 * S, 7L, "signup", 1.0, "{}"),
      (2L, 1800 * S, 7L, "click", 1.0, "{}"),   // inside
      (3L, 3600 * S, 7L, "click", 1.0, "{}"),   // boundary: inside (<=)
      (4L, 3601 * S, 7L, "click", 1.0, "{}"),   // outside
      (5L, 1800 * S, 8L, "click", 1.0, "{}"))   // other user
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tempSfDir("events" -> events)
    val got = q("ev_range_join", dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L))
  }

  test("ev_follow_band: batch twin emits exactly the in-band pairs at " +
      "µs precision") {
    val events = Seq(
      (1L, 0 * S, 7L, "signup", 1.0, "{}"),
      (2L, 1800 * S, 7L, "click", 1.0, "{}"),   // inside
      (3L, 3600 * S, 7L, "view", 1.0, "{}"),    // boundary: inside (<=)
      (4L, 3601 * S, 7L, "click", 1.0, "{}"),   // outside
      (5L, 1800 * S, 8L, "click", 1.0, "{}"),   // other user, no signup
      (6L, 60 * S, 7L, "signup", 1.0, "{}"))    // 2nd signup: in band of 1st
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tempSfDir("events" -> events)
    val got = q("ev_follow_band", dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("sig_ms"),
        r.getAs[Long]("ev_ms"), r.getAs[String]("event_type"))).toSet
    // signup@0: follows at 60s (the 2nd signup event), 1800s, 3600s;
    // signup@60: follows at 1800s, 3600s (3661 > 60+3600 band? no:
    // 3600s <= 60+3600 → in; 3601s <= 3660 → in too)
    assert(got == Set(
      (7L, 0L, 60000L, "signup"),
      (7L, 0L, 1800000L, "click"),
      (7L, 0L, 3600000L, "view"),
      (7L, 60000L, 1800000L, "click"),
      (7L, 60000L, 3600000L, "view"),
      (7L, 60000L, 3601000L, "click")), got.toString)
  }

  test("rel_argmax: picks the max-balance customer with min-key tie-break") {
    val rows = q("rel_argmax").collect()
    assert(rows.length == 25)
    val cust = spark.read.parquet(s"$sf/customer.parquet").collect()
      .map(r => (r.getAs[Long]("c_custkey"), r.getAs[Int]("c_nationkey"),
        r.getAs[Double]("c_acctbal")))
    rows.foreach { r =>
      val nk = r.getString(0).stripPrefix("NATION_").toInt
      val inNation = cust.filter(_._2 == nk)
      val maxBal = inNation.map(_._3).max
      assert(r.getAs[Double]("max_bal") == maxBal)
      val expectKey = inNation.filter(_._3 == maxBal).map(_._1).min
      assert(r.getAs[Long]("top_custkey") == expectKey)
    }
  }

  test("rel_approx: sketches within 5% of exact") {
    val approx = q("rel_approx").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("approx_custs")).toMap
    val exact = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_orderpriority")
      .agg(org.apache.spark.sql.functions.countDistinct("o_custkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n < 0.05,
        s"$k: approx=${approx(k)} exact=$n")
    }
  }

  test("ev_interval_join: cell-bucketed overlap matches hand math") {
    import spark.implicits._
    val h = 3600000000000L // 1h in ns
    // user 1: one session 00:30–01:30 (events 30 min apart stay joined);
    // errors at 00:10 and 01:40 → incident hours 0 and 1
    val m20 = 1200000000000L // 20 min in ns — gaps stay under 30 min
    val events = Seq(
      (1L, h / 2, 1L, "click", 0.0, "{}"),
      (2L, h / 2 + m20, 1L, "click", 0.0, "{}"),
      (3L, h / 2 + 2 * m20, 1L, "click", 0.0, "{}"),
      (4L, h / 2 + 3 * m20, 1L, "click", 0.0, "{}"),
      (5L, h / 6, 99L, "error", 0.0, "{}"),
      (6L, h + 2 * h / 3, 99L, "error", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tempSfDir("events" -> events)
    val out = q("ev_interval_join", dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // hour 0: sessions of user 1 (00:30–01:30 clipped to 00:30–01:00 =
    // 30 min) and user 99 (error events are sessions too: 00:10, len 0)
    assert(out(0L) == (2L, 1800000L))
    // hour 1: user 1 clipped 01:00–01:30 + user 99's 01:40 point session
    assert(out(3600000L) == (2L, 1800000L))
  }

  test("rel_pivot: cells equal the filtered sums") {
    val rows = q("rel_pivot").collect()
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    rows.foreach { r =>
      val status = r.getString(0)
      val a = li.filter(s"l_linestatus = '$status' AND l_returnflag = 'A'")
        .agg(org.apache.spark.sql.functions.sum("l_quantity")).collect()(0)
      val cell = if (r.isNullAt(1)) null else r.getDouble(1)
      if (a.isNullAt(0)) assert(cell == null)
      else assert(math.abs(cell.asInstanceOf[Double] - a.getDouble(0)) < 1e-6)
    }
  }

  test("ev_asof_nearest: picks are truly nearest within tolerance with " +
      "backward ties, and agree with a brute-force scan") {
    import org.apache.spark.sql.functions.col
    val tol = 1800000000000L
    val got = q("ev_asof_nearest").collect().map(r => r.getLong(0) ->
      ((r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    val ev = operators.EventOps.events(spark, sf)
      .filter(col("event_type").isin("signup", "error"))
      .select("event_id", "user_id", "ts_ns", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val sigsByUser = ev.filter(_._4 == "signup").groupBy(_._2)
      .view.mapValues(_.map(_._3).sorted).toMap
    val want = ev.filter(_._4 == "error").map { case (id, u, ts, _) =>
      val sigs = sigsByUser.getOrElse(u, Array.empty[Long])
      val back = sigs.filter(_ <= ts).lastOption.filter(ts - _ <= tol)
      val fwd = sigs.filter(_ > ts).headOption.filter(_ - ts <= tol)
      val pick = (back, fwd) match {
        case (Some(b), Some(f)) =>
          if (ts - b <= f - ts) ("back", b / 1000000L, (ts - b) / 1000000L)
          else ("fwd", f / 1000000L, (f - ts) / 1000000L)
        case (Some(b), None) => ("back", b / 1000000L, (ts - b) / 1000000L)
        case (None, Some(f)) => ("fwd", f / 1000000L, (f - ts) / 1000000L)
        case _ => ("none", -1L, -1L)
      }
      id -> pick
    }.toMap
    assert(got == want, "nearest picks must equal the brute-force scan")
    val picks = got.values.map(_._1).toSet
    assert(picks == Set("back", "fwd", "none"),
      s"fixture degenerate: need all three outcomes, got $picks")
    assert(got.values.forall(p => p._1 == "none" ||
      p._3 <= tol / 1000000L))
  }
}
