package graft

/** Hand-computed fixtures for the monitoring analytics family
  * (AnalyticsOps): drift TVD, damped stationary rank, EWMA fold.
  */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  private def eventsDf(rows: Seq[(Long, Long, Long, String, Double, String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("ev_ewma: hand-computed fold incl. negative-delta truncation") {
    // type "a": hourly counts 2, 6, 2 (hours 0,1,2).
    //   e1 = 2e6
    //   e2 = 2e6 + (6e6-2e6) div 4          = 3_000_000
    //   e3 = 3e6 + (2e6-3e6) div 4          = 3e6 - 250_000 = 2_750_000
    // the last step divides a NEGATIVE delta: trunc(-1e6/4) = -250000 on
    // both engines (Spark div, DuckDB //, BigInt all truncate to zero).
    val H = 3600L * 1000000000L
    val rows = (1 to 2).map(i => (i.toLong, 0L + i, 1L, "a", 1.0, "{}")) ++
      (3 to 8).map(i => (i.toLong, H + i, 1L, "a", 1.0, "{}")) ++
      (9 to 10).map(i => (i.toLong, 2 * H + i, 1L, "a", 1.0, "{}"))
    val dir = tempSfDir("events" -> eventsDf(rows))
    val out = q("ev_ewma", dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("event_type") == "a")
    assert(r.getAs[Int]("n_hours") == 3)
    assert(r.getAs[Long]("first_n") == 2L)
    assert(r.getAs[Long]("last_n") == 2L)
    assert(r.getAs[Long]("ewma_scaled") == 2750000L)
    assert(r.getAs[Double]("ewma") == 2.75)
  }

  test("ev_markov_rank: matches a plain-BigInt reference on a tiny graph") {
    // u1: a,b,a,b -> a->b x2, b->a x1 ; u2: a,c -> a->c x1.
    // out(a)=3, out(b)=1, c is DANGLING (no out edges).
    val rows = Seq(
      (1L, 1000L, 1L, "a", 1.0, "{}"),
      (2L, 2000L, 1L, "b", 1.0, "{}"),
      (3L, 3000L, 1L, "a", 1.0, "{}"),
      (4L, 4000L, 1L, "b", 1.0, "{}"),
      (5L, 1000L, 2L, "a", 1.0, "{}"),
      (6L, 2000L, 2L, "c", 1.0, "{}"))
    val dir = tempSfDir("events" -> eventsDf(rows))
    val got = q("ev_markov_rank", dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // plain-loop reference: same recurrence, BigInt (trunc division)
    val R = BigInt(1000000000L)
    val nodes = Seq("a", "b", "c")
    val edges = Map(("a", "b") -> BigInt(2), ("a", "c") -> BigInt(1),
      ("b", "a") -> BigInt(1))
    val out = Map("a" -> BigInt(3), "b" -> BigInt(1))
    val V = BigInt(nodes.size)
    var rank = nodes.map(_ -> R / V).toMap
    for (_ <- 1 to 3) {
      val contrib = nodes.map { u =>
        u -> edges.collect { case ((v, `u`), n) => rank(v) * n / out(v) }
          .foldLeft(BigInt(0))(_ + _)
      }.toMap
      val dmass = nodes.filterNot(out.contains).map(rank).sum
      rank = nodes.map { u =>
        u -> ((R * 15) / (V * 100) + (85 * contrib(u)) / 100 +
          (85 * (dmass / V)) / 100)
      }.toMap
    }
    assert(got == rank.map { case (k, v) => k -> v.toLong })
    // first-iteration spot values verified by hand:
    //  r1(a) = 50e6 + (85*333333333)/100 + (85*(333333333/3))/100
    //        = 50000000 + 283333333 + 94444444 = 427777777
    // mass conservation within truncation slack (each of the 3 iterations
    // loses < 1 unit per node per division; 4 divisions per node)
    val total = got.values.sum
    assert(total <= 1000000000L && total > 1000000000L - 100L)
  }

  test("ev_attribution: last preceding click wins; unattributed survives with NULLs") {
    val rows = Seq(
      // user 1: click → view → purchase: attributed to the click, 2500ms
      (1L, 1000000000L, 1L, "click", 1.0, "{}"),
      (2L, 2000000000L, 1L, "view", 1.0, "{}"),
      (3L, 3500000000L, 1L, "purchase", 9.0, "{}"),
      // user 2: purchase with no click at all → NULL attribution
      (4L, 1000000000L, 2L, "purchase", 5.0, "{}"),
      // user 3: purchase BEFORE its first click stays unattributed; the
      // later purchase attributes to the click between them
      (5L, 1000000000L, 3L, "purchase", 1.0, "{}"),
      (6L, 2000000000L, 3L, "click", 1.0, "{}"),
      (7L, 2100000000L, 3L, "purchase", 1.0, "{}"))
    val dir = tempSfDir("events" -> eventsDf(rows))
    val out = q("ev_attribution", dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(3L, 4L, 5L, 7L))
    assert(out(3L).getAs[Long]("last_click_id") == 1L)
    assert(out(3L).getAs[Long]("gap_ms") == 2500L)
    assert(out(4L).isNullAt(out(4L).fieldIndex("last_click_id")))
    assert(out(5L).isNullAt(out(5L).fieldIndex("last_click_id")))
    assert(out(7L).getAs[Long]("last_click_id") == 6L)
    assert(out(7L).getAs[Long]("gap_ms") == 100L)
  }

  test("ev_seasonal_residual: flags only the hour-of-day outlier day") {
    val D = 86400L * 1000000000L
    val H10 = 10L * 3600L * 1000000000L
    // type "a", hod 10: counts 1, 1, 10 across three days → only day 3
    // exceeds 2× the hod average (10·3 = 30 > 2·12); ratio 30000//12
    var id = 0L
    def ev(day: Long, n: Int) = (1 to n).map { i =>
      id += 1; (id, day * D + H10 + i * 1000L, 1L, "a", 1.0, "{}")
    }
    val rows = ev(0, 1) ++ ev(1, 1) ++ ev(2, 10) ++
      // type "b": uniform across the same days → never flagged
      (0 to 2).flatMap { d => id += 1
        Seq((id, d * D + H10 + 500L, 2L, "b", 1.0, "{}")) }
    val dir = tempSfDir("events" -> eventsDf(rows))
    val out = q("ev_seasonal_residual", dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("event_type") == "a")
    assert(r.getAs[Long]("day_idx") == 2L)
    assert(r.getAs[Int]("hod") == 10)
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Long]("ratio_x1000") == 2500L)
  }

  test("ev_drift: identical halves -> 0, disjoint halves -> 1, empty half -> NULL") {
    // global time range [0ms, 3000ms] -> first half is ts_ms <= 1500;
    // global value range [5, 95] -> bin0 = low values, bin9 = high.
    def ms(m: Long) = m * 1000000L
    val rows = Seq(
      // "same": {5, 95} in each half -> TVD 0
      (1L, ms(0), 1L, "same", 5.0, "{}"),
      (2L, ms(0), 1L, "same", 95.0, "{}"),
      (3L, ms(3000), 1L, "same", 5.0, "{}"),
      (4L, ms(3000), 1L, "same", 95.0, "{}"),
      // "shift": all low first half, all high second -> TVD 1
      (5L, ms(0), 2L, "shift", 5.0, "{}"),
      (6L, ms(1), 2L, "shift", 5.0, "{}"),
      (7L, ms(2999), 2L, "shift", 95.0, "{}"),
      (8L, ms(3000), 2L, "shift", 95.0, "{}"),
      // "onesided": only first-half events -> tvd NULL, scaled 0
      (9L, ms(2), 3L, "onesided", 50.0, "{}"))
    val dir = tempSfDir("events" -> eventsDf(rows))
    val out = q("ev_drift", dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("same").getAs[Long]("tvd_scaled") == 0L)
    assert(out("same").getAs[Double]("tvd") == 0.0)
    // tvd_scaled = |2*2-0| + |0-2*2| = 8 = 2*TVD*ref_total*cur_total
    assert(out("shift").getAs[Long]("tvd_scaled") == 8L)
    assert(out("shift").getAs[Double]("tvd") == 1.0)
    assert(out("onesided").getAs[Long]("cur_total") == 0L)
    assert(out("onesided").getAs[Long]("tvd_scaled") == 0L)
    assert(out("onesided").isNullAt(out("onesided").fieldIndex("tvd")))
  }

  test("ev_cusum: the prefix-sum window form equals the sequential " +
      "reset-at-zero scan, row for row") {
    val byType = q("ev_cusum").collect().groupBy(_.getString(0))
    assert(byType.nonEmpty)
    byType.foreach { case (tpe, rs0) =>
      val rs = rs0.sortBy(_.getLong(1))
      val ns = rs.map(_.getLong(2))
      val h = ns.length.toLong
      val total = ns.sum
      var s = 0L
      rs.zip(ns).foreach { case (r, ni) =>
        s = math.max(0L, s + (ni * h - total - total / 10))
        assert(r.getLong(3) == s, s"$tpe cusum diverges at $r")
        assert(r.getInt(4) == (if (s > 2 * total) 1 else 0))
      }
    }
  }

  test("ev_pattern_match: matches agree with a brute-force replay and " +
      "the no-error-between negation genuinely excludes purchases") {
    import org.apache.spark.sql.functions.col
    val got = q("ev_pattern_match").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // brute-force per-user replay on the small fixture
    val ev = operators.EventOps.events(spark, sf)
      .filter(col("event_type").isin("signup", "error", "purchase"))
      .select("event_id", "user_id", "ts_ns", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    def prio(t: String) = t match {
      case "error" => 0; case "signup" => 1; case _ => 2
    }
    val want = ev.groupBy(_._2).values.flatMap { rows =>
      val ordered = rows.sortBy(e => (e._3, prio(e._4), e._1))
      ordered.zipWithIndex.flatMap {
        case ((id, _, ts, "purchase"), i) =>
          val before = ordered.take(i)
          before.reverse.find(_._4 == "signup").flatMap {
            case (_, _, sigTs, _) =>
              val within = ts - sigTs <= 3600000000000L
              // an error at the signup's own instant sorts before it
              // (prio error < signup) and is NOT between
              val errBetween = before
                .exists(e => e._4 == "error" && e._3 > sigTs)
              if (within && !errBetween)
                Some(id -> ((sigTs / 1000000L, (ts - sigTs) / 1000000L)))
              else None
          }
        case _ => None
      }
    }.toMap
    assert(got == want, "engine matches must equal the replay")
    assert(got.nonEmpty, "fixture degenerate: no pattern fired")
  }

  test("ev_sliding_distinct: sketch windows within 5% of exact, merge " +
      "arity bounded") {
    import org.apache.spark.sql.functions._
    val got = q("ev_sliding_distinct").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.nonEmpty && got.values.forall(_._2 <= 6),
      "a window must merge at most 6 hourly states")
    // exact twin: same explode, exact distinct per trailing window
    val exact = operators.EventOps.events(spark, sf)
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

  test("ev_pattern_match: hand-built fixture pins the negation, the " +
      "window cut, and the same-instant boundary semantics") {
    val M = 60L * 1000000000L // one minute in ns
    val rows = Seq(
      // user 1: error strictly between -> excluded; 2 h purchase ->
      // outside the window
      (1L, 0L, 1L, "signup", 1.0, "{}"),
      (2L, 10L * M, 1L, "error", 1.0, "{}"),
      (3L, 20L * M, 1L, "purchase", 1.0, "{}"),
      (4L, 120L * M, 1L, "purchase", 1.0, "{}"),
      // user 2: error BEFORE the signup doesn't block the match
      (5L, 0L, 2L, "error", 1.0, "{}"),
      (6L, 5L * M, 2L, "signup", 1.0, "{}"),
      (7L, 35L * M, 2L, "purchase", 1.0, "{}"),
      // user 3: purchase with no signup at all
      (8L, 0L, 3L, "purchase", 1.0, "{}"),
      // user 4: error at the signup's OWN instant sorts before it
      // (error < signup priority) -> not between -> match
      (9L, 0L, 4L, "signup", 1.0, "{}"),
      (10L, 0L, 4L, "error", 1.0, "{}"),
      (11L, 10L * M, 4L, "purchase", 1.0, "{}"))
    val dir = tempSfDir("events" -> eventsDf(rows))
    val got = q("ev_pattern_match", dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((7L, 300000L, 1800000L), (11L, 0L, 600000L)),
      s"fixture mismatch: $got")
  }

  test("ev_ab_test: hand-built funnel -> exact counts and the z the " +
      "same double expression gives") {
    val H = 3600L * 1000000000L // 1 h in ns
    val rows = Seq(
      // cohort A (even users):
      //   u0 converts (purchase 1 h after first view)
      (1L, 0L, 0L, "view", 1.0, "{}"),
      (2L, H, 0L, "purchase", 1.0, "{}"),
      //   u2 exposed, purchase at +25 h -> OUTSIDE the 24 h window
      (3L, 0L, 2L, "view", 1.0, "{}"),
      (4L, 25L * H, 2L, "purchase", 1.0, "{}"),
      //   u4 exposed, never purchases
      (5L, 0L, 4L, "view", 1.0, "{}"),
      // cohort B (odd users):
      //   u1's FIRST purchase precedes the first view -> not a conversion
      (6L, 0L, 1L, "purchase", 1.0, "{}"),
      (7L, H, 1L, "view", 1.0, "{}"),
      //   u3 purchase at the view's own instant (delta 0) -> converts
      (8L, 2L * H, 3L, "view", 1.0, "{}"),
      (9L, 2L * H, 3L, "purchase", 1.0, "{}"),
      // u5 purchases but was never exposed -> excluded from both cohorts
      (10L, 0L, 5L, "purchase", 1.0, "{}"))
    val dir = tempSfDir("events" -> eventsDf(rows))
    val out = q("ev_ab_test", dir).collect()
    assert(out.length == 1)
    val r = out.head
    val (nA, cA, nB, cB) = (r.getAs[Long]("n_a"), r.getAs[Long]("c_a"),
      r.getAs[Long]("n_b"), r.getAs[Long]("c_b"))
    assert((nA, cA, nB, cB) == ((3L, 1L, 2L, 1L)))
    // recompute z with the entry's exact association order — must be
    // bit-equal, not merely close (the oracle hash demands the same)
    val rateA = cA.toDouble / nA
    val rateB = cB.toDouble / nB
    val p = (cA + cB).toDouble / (nA + nB)
    val z = (rateA - rateB) /
      math.sqrt(p * (1.0 - p) * (1.0 / nA + 1.0 / nB))
    assert(r.getAs[Double]("rate_a") == rateA)
    assert(r.getAs[Double]("rate_b") == rateB)
    assert(r.getAs[Double]("z") == z)
    assert(r.getAs[Int]("significant_95") == 0)
  }

  test("ev_ab_cuped: hand-built pre/post revenue -> exact moments, " +
      "bit-equal theta and adjusted means") {
    val H = 3600L * 1000000000L // 1 h in ns
    // corpus spans [0, 100 h] -> midpoint 50 h; pre purchases at 10 h,
    // post at 60 h. Per-user (x, y): u0 (10,20) u2 (0,5) | u1 (4,8) u3 (7,1)
    val rows = Seq(
      (1L, 0L, 0L, "view", 1.0, "{}"),        // pins min ts
      (2L, 100L * H, 1L, "view", 1.0, "{}"),  // pins max ts
      (3L, 10L * H, 0L, "purchase", 10.0, "{}"),
      (4L, 60L * H, 0L, "purchase", 20.0, "{}"),
      (5L, 60L * H, 2L, "purchase", 5.0, "{}"),
      (6L, 10L * H, 1L, "purchase", 4.0, "{}"),
      (7L, 60L * H, 1L, "purchase", 8.0, "{}"),
      (8L, 10L * H, 3L, "purchase", 7.0, "{}"),
      (9L, 60L * H, 3L, "purchase", 1.0, "{}"))
    val dir = tempSfDir("events" -> eventsDf(rows))
    val out = q("ev_ab_cuped", dir).collect()
    assert(out.map(_.getAs[Long]("cohort")).toSeq == Seq(0L, 1L))
    // exact moments over all 4 users
    val (gn, sx, sy) = (4L, 21.0, 34.0)
    val sxx = 100.0 + 16.0 + 0.0 + 49.0
    val sxy = 200.0 + 32.0 + 0.0 + 7.0
    val theta = ((gn * sxy) - (sx * sy)) / ((gn * sxx) - (sx * sx))
    val r0 = out(0); val r1 = out(1)
    assert(r0.getAs[Long]("n") == 2L && r1.getAs[Long]("n") == 2L)
    assert(r0.getAs[Double]("mean_x") == 10.0 / 2 &&
      r0.getAs[Double]("mean_y") == 25.0 / 2)
    assert(r1.getAs[Double]("mean_x") == 11.0 / 2 &&
      r1.getAs[Double]("mean_y") == 9.0 / 2)
    assert(r0.getAs[Double]("theta") == theta)
    // the adjustment must move the two cohorts' means in OPPOSITE
    // directions (mean_x straddles the global mean) and be bit-equal
    // to the same association order
    val adj0 = (25.0 / 2) - theta * ((10.0 / 2) - (sx / gn))
    val adj1 = (9.0 / 2) - theta * ((11.0 / 2) - (sx / gn))
    assert(r0.getAs[Double]("adj_mean") == adj0)
    assert(r1.getAs[Double]("adj_mean") == adj1)
    assert(adj0 != 25.0 / 2 && adj1 != 9.0 / 2)
  }
}
