package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Fns._

/** Production-monitoring analytics over the event stream (beyond-reference,
  * the operations a 100 TB training-data deployment runs continuously):
  * distribution-drift detection between corpus snapshots, a damped
  * stationary rank over the session transition graph, and EWMA trend
  * smoothing.
  *
  * Cross-engine determinism contract (the same one [[MaintenanceOps]]'
  * Z-order and [[graft.api.GraftPipelines]]' k-means pin): every
  * data-dependent comparison is either EXACT integer arithmetic — Spark's
  * `div` and DuckDB's `//` both truncate toward zero, verified, so
  * quotients can never diverge — or a single IEEE-754 double expression
  * evaluated in the same association order on both engines. No quantity
  * ever routes through an engine-specific rounding mode.
  *
  * Scale notes (100 TB):
  *  - [[queries ev_drift]]: two aggregation levels, both keyed by
  *    event_type(+bin) — map-side partial aggregation collapses each
  *    partition to ≤ |types|·bins rows before any shuffle. The global
  *    min/max scalars are one 1-row aggregate broadcast (the sanctioned
  *    crossJoin shape). Drift is cross-multiplied to integers
  *    (|ref_n·cur_total − cur_n·ref_total| sums exactly) so no
  *    per-engine division order can flip a comparison.
  *  - [[queries ev_markov_rank]]: the data-heavy step is the one
  *    user_id-partitioned window extracting transition edges (same
  *    shuffle ev_transitions already pays); everything after runs on the
  *    vocabulary-sized node/edge tables (|V| event types, ≤|V|² edges),
  *    localCheckpoint'd once and reused across the 3 unrolled
  *    iterations. Rank mass is integer (R = 10^9) so the per-iteration
  *    floor divisions are exact on both engines; products stay under
  *    2^63 for any corpus below ~10^9 transitions per edge.
  *  - [[queries ev_ewma]]: hourly pre-aggregation first (map-side
  *    combine), then one ordered fold per event_type over the bounded
  *    hours-per-type list — the list_reduce twin the BPE family
  *    established. State per group is one BIGINT.
  */
object AnalyticsOps {

  /** Fixed-point scale for EWMA (α = 1/4) and the rank mass R. */
  private val EwmaScale = 1000000L
  private val RankMass  = 1000000000L
  private val RankIters = 3
  private val DriftBins = 10

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Distribution-shift detector: split the corpus at the midpoint of
    // its time range, histogram `value` into 10 equi-width bins per
    // event_type, and report the scaled total-variation distance between
    // the two halves. tvd_scaled = Σ|ref_n·cur_total − cur_n·ref_total|
    // is an exact BIGINT (= 2·TVD·ref_total·cur_total); the double `tvd`
    // is one division of exact integers at the very end. The midpoint
    // test is ts_ms·2 ≤ mn+mx — pure integer, no division at all.
    "ev_drift" -> ((s, dir) => {
      import s.implicits._
      val ev = EventOps.events(s, dir)
      val bounds = ev.agg(
        min($"ts_ms").as("mn"), max($"ts_ms").as("mx"),
        min($"value").as("vmn"), max($"value").as("vmx"))
      val cnt = ev.crossJoin(broadcast(bounds))
        .withColumn("half",
          when($"ts_ms" * 2 <= $"mn" + $"mx", lit(0)).otherwise(lit(1)))
        .withColumn("bin", least(lit(DriftBins - 1),
          floor(($"value" - $"vmn") * lit(DriftBins.toDouble) /
            ($"vmx" - $"vmn"))).cast("int"))
        .groupBy($"event_type", $"bin")
        .agg(sum(when($"half" === 0, 1L).otherwise(0L)).as("ref_n"),
          sum(when($"half" === 1, 1L).otherwise(0L)).as("cur_n"))
      val w = Window.partitionBy($"event_type")
      cnt
        .withColumn("ref_total", sum($"ref_n").over(w))
        .withColumn("cur_total", sum($"cur_n").over(w))
        .groupBy($"event_type", $"ref_total", $"cur_total")
        .agg(count(lit(1)).as("n_bins"),
          sum(abs($"ref_n" * $"cur_total" - $"cur_n" * $"ref_total"))
            .as("tvd_scaled"))
        // guard: an empty half → DuckDB float x/0 is NULL while Spark is
        // NaN/Infinity; pin NULL on both engines (drift vs nothing is
        // undefined, the scaled integer numerator still reports 0)
        .withColumn("tvd", when($"ref_total" > 0 && $"cur_total" > 0,
          $"tvd_scaled".cast("double") /
            (lit(2.0) * $"ref_total" * $"cur_total")))
        .select($"event_type", $"ref_total", $"cur_total", $"n_bins",
          $"tvd_scaled", $"tvd")
        .orderBy($"event_type")
    }),

    // Damped stationary rank (PageRank; Brin & Page 1998) of the
    // session transition graph: nodes = event types, edge weight
    // n(A→B) = how often A directly precedes B in a user's stream
    // (the ev_transitions derivation). All mass is integer: rank0 =
    // R div V; each iteration distributes floor(rank·n/out) along
    // edges, then rank' = (15%·R)/V + 85%·(contrib + dangling/V),
    // every division a truncate-toward-zero exact on both engines.
    // 3 iterations, unrolled in the oracle as CTEs r1..r3.
    "ev_markov_rank" -> ((s, dir) => {
      import s.implicits._
      val ev = EventOps.events(s, dir)
      val wNext = Window.partitionBy($"user_id").orderBy($"ts_ns", $"event_id")
      // vocabulary-sized; computed once, reused by all 3 iterations
      val edges = ev
        .withColumn("next_type", lead($"event_type", 1).over(wNext))
        .filter($"next_type".isNotNull)
        .groupBy($"event_type".as("src"), $"next_type".as("dst"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val nodes = ev.select($"event_type".as("node")).distinct()
        .localCheckpoint()
      val vcnt = nodes.agg(count(lit(1)).as("vcnt"))
      val outw = edges.groupBy($"src").agg(sum($"n").as("outn"))
      var rank = nodes.crossJoin(broadcast(vcnt))
        .select($"node", expr(s"${RankMass}L div vcnt").as("r"))
      for (_ <- 1 to RankIters) {
        val contrib = edges.join(rank, $"src" === $"node")
          .join(outw, "src")
          .select($"dst", expr("(r * n) div outn").as("c"))
          .groupBy($"dst").agg(sum($"c").as("csum"))
        val dang = rank.join(outw, $"node" === $"src", "left_anti")
          .agg(coalesce(sum($"r"), lit(0L)).as("dmass"))
        // rank feeds BOTH contrib and the dangling sum next round — cut
        // the lineage each iteration (vocabulary-sized, trivially cheap)
        // or the plan tree doubles per round
        rank = nodes.join(contrib, $"node" === $"dst", "left_outer")
          .crossJoin(broadcast(vcnt)).crossJoin(broadcast(dang))
          .select($"node",
            (expr(s"(${RankMass}L * 15) div (vcnt * 100)") +
              expr("(85 * coalesce(csum, 0L)) div 100") +
              expr("(85 * (dmass div vcnt)) div 100")).as("r"))
          .localCheckpoint()
      }
      rank.select($"node".as("event_type"), $"r".as("rank_scaled"))
        .orderBy($"rank_scaled".desc, $"event_type")
    }),

    // Last-touch attribution: every purchase credited to the user's most
    // recent PRECEDING click (product-analytics attribution; the window
    // twin of ev_asof_join's merge-scan). One user-partitioned window —
    // last(click, ignoreNulls) over ROWS UNBOUNDED PRECEDING..1
    // PRECEDING — shared by both attributed columns; the gap is integer
    // ns truncated to ms (non-negative by construction, so trunc ≡
    // floor on both engines). Unattributed purchases (no prior click)
    // survive with NULLs — the rows a marketing report must not drop.
    "ev_attribution" -> ((s, dir) => {
      import s.implicits._
      val ev = EventOps.events(s, dir)
      val w = Window.partitionBy($"user_id").orderBy($"ts_ns", $"event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      ev
        .withColumn("last_click_ns",
          last(when($"event_type" === "click", $"ts_ns"), ignoreNulls = true)
            .over(w))
        .withColumn("last_click_id",
          last(when($"event_type" === "click", $"event_id"), ignoreNulls = true)
            .over(w))
        .filter($"event_type" === "purchase")
        .select($"event_id".as("purchase_id"), $"user_id", $"ts_ms",
          $"last_click_id",
          expr("(ts_ns - last_click_ns) div 1000000").as("gap_ms"))
        .orderBy($"purchase_id")
    }),

    // Seasonal residual anomaly: flags (type, day, hour-of-day) cells
    // whose count is more than 2× that hour-of-day's cross-day average
    // — "is today's 3pm spike unusual FOR 3pm?", the seasonality-aware
    // sibling of ev_anomaly's global z-gate. The comparison is
    // cross-multiplied (n·n_days > 2·tot_n) so no division rounding
    // exists; both aggregation levels are (type, hod)-keyed map-side
    // partials.
    "ev_seasonal_residual" -> ((s, dir) => {
      import s.implicits._
      val ev = EventOps.events(s, dir)
      val cnt = ev
        .groupBy($"event_type", floorDiv("ts_ms", 86400000L).as("day_idx"),
          hour($"ts").as("hod"))
        .agg(count(lit(1)).as("n"))
      val base = cnt.groupBy($"event_type", $"hod")
        .agg(sum($"n").as("tot_n"), count(lit(1)).as("n_days"))
      cnt.join(base, Seq("event_type", "hod"))
        .filter($"n" * $"n_days" > $"tot_n" * 2)
        .select($"event_type", $"day_idx", $"hod".cast("int").as("hod"),
          $"n", $"n_days", $"tot_n",
          expr("(n * n_days * 1000) div tot_n").as("ratio_x1000"))
        .orderBy($"event_type", $"day_idx", $"hod")
    }),

    // EWMA trend smoothing (α = 1/4) over hourly event counts, per
    // type: e_1 = n_1·S; e_t = e_{t-1} + (n_t·S − e_{t-1}) div 4.
    // The fold runs over the hour-ordered list exactly as DuckDB's
    // list_reduce does (seeded with the first element; re-applying it
    // is the identity step), so the two engines share one recurrence.
    // CUSUM change detection (Page, Biometrika 1954) per event type
    // over hourly arrival counts — the drift ALARM that complements
    // ev_drift (distribution shift) and ev_ewma (smoothed level):
    // S_i = max(0, S_{i-1} + d_i) accumulates only SUSTAINED positive
    // deviation and resets on quiet hours. The reset-at-zero scan is
    // non-associative, but the prefix-sum identity
    // S_i = P_i − min(0, min_{j≤i} P_j) makes it two ordinary window
    // passes — no recursion, no UDAF, and the oracle mirrors it
    // verbatim. Everything integer: the deviation is cross-multiplied
    // by the per-type observed-hour count H (d_i = n_i·H − total −
    // total div 10, i.e. (n_i − mean − 10 % slack)·H), the alarm
    // threshold is two mean-hours of excess (S > 2·total).
    "ev_cusum" -> ((s, dir) => {
      import s.implicits._
      val hourly = EventOps.events(s, dir)
        .groupBy($"event_type", floorDiv("ts_ms", 3600000L).as("hour_idx"))
        .agg(count(lit(1)).as("n"))
      val wt = Window.partitionBy($"event_type")
      val w = Window.partitionBy($"event_type").orderBy($"hour_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hourly
        .withColumn("h_cnt", count(lit(1)).over(wt))
        .withColumn("total", sum($"n").over(wt))
        .withColumn("d", $"n" * $"h_cnt" - $"total" - expr("total div 10"))
        .withColumn("p", sum($"d").over(w))
        .withColumn("cusum_scaled",
          $"p" - least(lit(0L), min($"p").over(w)))
        .withColumn("alarm", ($"cusum_scaled" > $"total" * 2).cast("int"))
        .select($"event_type", $"hour_idx", $"n", $"cusum_scaled", $"alarm")
        .orderBy($"event_type", $"hour_idx")
    }),

    // CEP pattern match — the MATCH_RECOGNIZE shape SQL engines bolt
    // on and Spark lacks natively: "purchase within 1 h of the user's
    // latest signup, with NO error in between" (A then B within T,
    // ¬C between — the negation is what ev_funnel's ordered-count
    // chain cannot express). Two running windows over ONE per-user
    // sort: a cumulative error count, and the carried-forward
    // (signup ts, error-count-at-signup) pair; a purchase matches iff
    // its running error count equals the count carried from its
    // matched signup — zero errors strictly between, O(1) state per
    // row, no self-join, no per-row range probe. Same-instant ties
    // order (error, signup, purchase) then event_id, so boundary
    // events resolve identically in both engines: an error sharing
    // the signup's timestamp counts as BEFORE it (not between), one
    // sharing the purchase's counts as between. At 100 TB: one
    // user-keyed exchange + in-partition sort — the ev_asof_join
    // merge-scan discipline extended to pattern negation.
    "ev_pattern_match" -> ((s, dir) => {
      import s.implicits._
      val ev = EventOps.events(s, dir)
        .filter($"event_type".isin("signup", "error", "purchase"))
        .select($"event_id", $"user_id", $"ts_ns", $"event_type")
        .withColumn("prio",
          when($"event_type" === "error", 0)
            .when($"event_type" === "signup", 1).otherwise(2))
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts_ns", $"prio", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev
        .withColumn("ec",
          sum(($"event_type" === "error").cast("long")).over(w))
        .withColumn("sig_ns_c",
          when($"event_type" === "signup", $"ts_ns"))
        .withColumn("sig_ec_c", when($"event_type" === "signup", $"ec"))
        .withColumn("last_sig_ns",
          last($"sig_ns_c", ignoreNulls = true).over(w))
        .withColumn("last_sig_ec",
          last($"sig_ec_c", ignoreNulls = true).over(w))
        .filter($"event_type" === "purchase" &&
          $"last_sig_ns".isNotNull &&
          $"ts_ns" - $"last_sig_ns" <= lit(3600000000000L) &&
          $"ec" === $"last_sig_ec")
        .withColumn("gap_ns", $"ts_ns" - $"last_sig_ns")
        .select($"event_id", $"user_id",
          floorDiv("last_sig_ns", 1000000L).as("signup_ms"),
          floorDiv("gap_ns", 1000000L).as("gap_ms"))
        .orderBy($"event_id")
    }),

    // Sliding-window DISTINCT users via mergeable sketches — the shape
    // that justifies sketches at 100 TB beyond rel_distinct_incremental's
    // batch merge: the raw stream is scanned ONCE into an hours-sized
    // HLL state table, and every trailing-6h window is a union of ≤ 6
    // stored states (hour h feeds windows h..h+5 via one bounded
    // sequence-explode — window count × 6 rows, never events × windows).
    // The exact computation would either rescan events per window or
    // carry (user, hour) pairs through every window — both scale with
    // the stream, the sketch path with the CLOCK. Engine-specific
    // binary states → rows-only entry (SparkEntry.rowsOnlyMeta); the
    // spec pins each window within 5% of the exact trailing distinct
    // count and the merge arity at ≤ 6.
    "ev_sliding_distinct" -> ((s, dir) => {
      import s.implicits._
      val hourly = EventOps.events(s, dir)
        .groupBy(floorDiv("ts_ms", 3600000L).as("hour_idx"))
        .agg(hll_sketch_agg($"user_id").as("sk"))
      hourly
        .select(explode_outer(expr("sequence(hour_idx, hour_idx + 5)")).as("w"),
          $"sk")
        .groupBy($"w")
        .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("approx_users"),
          count(lit(1)).as("n_hours_merged"))
        .orderBy($"w")
    }),

    "ev_ewma" -> ((s, dir) => {
      import s.implicits._
      val ev = EventOps.events(s, dir)
      ev.groupBy($"event_type",
          floorDiv("ts_ms", 3600000L).as("hour_idx"))
        .agg(count(lit(1)).as("n"))
        .groupBy($"event_type")
        .agg(sort_array(collect_list(struct($"hour_idx", $"n"))).as("hs"))
        .select($"event_type", size($"hs").as("n_hours"),
          element_at($"hs", 1).getField("n").as("first_n"),
          element_at($"hs", -1).getField("n").as("last_n"),
          expr(s"""aggregate(
              transform(hs, x -> x.n * ${EwmaScale}L),
              element_at(transform(hs, x -> x.n * ${EwmaScale}L), 1),
              (acc, x) -> acc + (x - acc) div 4)""").as("ewma_scaled"))
        .withColumn("ewma",
          $"ewma_scaled".cast("double") / lit(EwmaScale.toDouble))
        .orderBy($"event_type")
    }),

    // A/B experiment readout — the two-proportion z-test over an
    // exposure→conversion funnel, the decision-making completion of the
    // funnel/retention family (count WHAT happened) and ev_cusum (alarm
    // WHEN it changed): did variant A convert better than B, and is the
    // difference significant? Cohort = user_id % 2 (the corpus carries no
    // assignment column; production swaps in the experiment's hash
    // bucket). Exposure = the user's first 'view'; conversion = first
    // 'purchase' landing within 24 h at or after it. Determinism: the
    // funnel reduces to four exact BIGINT counts — rates, pooled
    // variance, and z are then ONE double expression in the same
    // association order on both engines (the rel_corr moment-form
    // discipline). Scale: one user_id-keyed shuffle with map-side
    // partial min() aggregation (conditional min, not an event sort),
    // then a single-row global reduce — per-executor state is two
    // timestamps per user, and the z-test itself touches 4 numbers
    // regardless of corpus size.
    "ev_ab_test" -> ((s, dir) => {
      import s.implicits._
      val perUser = EventOps.events(s, dir)
        .groupBy($"user_id")
        .agg(min(when($"event_type" === "view", $"ts_ms")).as("fv"),
          min(when($"event_type" === "purchase", $"ts_ms")).as("fp"))
        .filter($"fv".isNotNull)
        .select(($"user_id" % 2).as("cohort"),
          ($"fp".isNotNull && $"fp" >= $"fv" &&
            $"fp" - $"fv" <= lit(86400000L)).cast("long").as("conv"))
      perUser.groupBy()
        .agg(sum(when($"cohort" === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when($"cohort" === 0, $"conv").otherwise(0L)).as("c_a"),
          sum(when($"cohort" === 1, 1L).otherwise(0L)).as("n_b"),
          sum(when($"cohort" === 1, $"conv").otherwise(0L)).as("c_b"))
        .withColumn("rate_a", $"c_a".cast("double") / $"n_a")
        .withColumn("rate_b", $"c_b".cast("double") / $"n_b")
        .withColumn("p_pool",
          ($"c_a" + $"c_b").cast("double") / ($"n_a" + $"n_b"))
        .withColumn("z", ($"rate_a" - $"rate_b") /
          sqrt($"p_pool" * (lit(1.0) - $"p_pool") *
            (lit(1.0) / $"n_a" + lit(1.0) / $"n_b")))
        .withColumn("significant_95", (abs($"z") > 1.96).cast("int"))
    }),

    // CUPED variance reduction (Deng et al. WSDM'13) — the revenue-side
    // companion of ev_ab_test's proportion z: per-user post-period
    // purchase revenue adjusted by the pre-period covariate,
    // adj = ȳ_c − θ·(x̄_c − x̄), θ = cov(x,y)/var(x). The experiment
    // split (corpus midpoint) and cohort stand in for the production
    // assignment timestamp + hash bucket. Determinism: per-user revenue
    // sums are DECIMAL(18,2)-exact, the cross moments multiply WITHIN
    // decimal bounds (18,2 × 18,2 → 37,4 < 38) so sums stay exact, and
    // θ/means/adjustment are single identically-associated double
    // expressions (the rel_corr moment form). Scale: one user_id-keyed
    // shuffle (map-side partial sums), then a 1-row global moment
    // aggregate cross-joined with the 2-row cohort table — the
    // sanctioned broadcast shape; nothing downstream of the per-user
    // agg scales with the corpus.
    "ev_ab_cuped" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types.DecimalType
      val ev = EventOps.events(s, dir)
        .select($"user_id", $"event_type", $"value", $"ts_ms")
      val bounds = ev.agg(min($"ts_ms").as("mn"), max($"ts_ms").as("mx"))
      val u = ev.crossJoin(broadcast(bounds))
        .withColumn("mid", expr("(mn + mx) div 2"))
        .groupBy($"user_id")
        .agg(
          sum(when($"event_type" === "purchase" && $"ts_ms" < $"mid",
            dec2($"value")).otherwise(dec2(lit(0))))
            .cast(DecimalType(18, 2)).as("x"),
          sum(when($"event_type" === "purchase" && $"ts_ms" >= $"mid",
            dec2($"value")).otherwise(dec2(lit(0))))
            .cast(DecimalType(18, 2)).as("y"))
      val g = u.agg(count(lit(1)).as("gn"),
        sum($"x").cast("double").as("sx"),
        sum($"y").cast("double").as("sy"),
        sum($"x" * $"x").cast("double").as("sxx"),
        sum($"x" * $"y").cast("double").as("sxy"))
      u.groupBy(($"user_id" % 2).as("cohort"))
        .agg(count(lit(1)).as("n"),
          sum($"x").cast("double").as("sxc"),
          sum($"y").cast("double").as("syc"))
        .crossJoin(broadcast(g))
        .withColumn("theta", (($"gn" * $"sxy") - ($"sx" * $"sy")) /
          (($"gn" * $"sxx") - ($"sx" * $"sx")))
        .select($"cohort", $"n",
          ($"syc" / $"n").as("mean_y"),
          ($"sxc" / $"n").as("mean_x"),
          (($"syc" / $"n") - $"theta" *
            (($"sxc" / $"n") - ($"sx" / $"gn"))).as("adj_mean"),
          $"theta")
        .orderBy($"cohort")
    })
  )

  private def rankIterSql(k: Int): String = {
    val prev = if (k == 1) "r0" else s"r${k - 1}"
    s"""c$k AS (
       |  SELECT dst, sum((r * n) // outn) AS csum
       |  FROM edges JOIN $prev ON src = node JOIN outw USING (src)
       |  GROUP BY dst),
       |d$k AS (
       |  SELECT coalesce(sum(r), 0) AS dmass
       |  FROM $prev LEFT JOIN outw ON node = src WHERE outn IS NULL),
       |r$k AS (
       |  SELECT node,
       |   (CAST($RankMass AS BIGINT) * 15) // (vcnt * 100)
       |   + (85 * coalesce(csum, 0)) // 100
       |   + (85 * (dmass // vcnt)) // 100 AS r
       |  FROM nodes LEFT JOIN c$k ON node = dst
       |  CROSS JOIN vc CROSS JOIN d$k)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // verbatim mirror of the engine's two window passes; DuckDB sums
    // widen to HUGEINT, cast back at every boundary
    "ev_cusum" -> {
      val hourIdx = graft.functions.Fns.floorDivDuckSql("epoch_ms(ts)", 3600000L)
      s"""WITH h AS (
         |  SELECT event_type, $hourIdx AS hour_idx, count(*) AS n
         |  FROM events GROUP BY 1, 2),
         |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS h_cnt,
         |       CAST(sum(n) AS BIGINT) AS total FROM h GROUP BY 1),
         |d AS (SELECT h.event_type, hour_idx, n, total,
         |       n * h_cnt - total - total // 10 AS d
         |      FROM h JOIN t USING (event_type)),
         |p AS (SELECT *, CAST(sum(d) OVER (PARTITION BY event_type
         |       ORDER BY hour_idx ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p
         |      FROM d),
         |c AS (SELECT *, p - least(CAST(0 AS BIGINT),
         |       CAST(min(p) OVER (PARTITION BY event_type ORDER BY hour_idx
         |         ROWS UNBOUNDED PRECEDING) AS BIGINT)) AS s
         |      FROM p)
         |SELECT event_type, hour_idx, CAST(n AS BIGINT) AS n,
         | CAST(s AS BIGINT) AS cusum_scaled,
         | CAST(s > total * 2 AS INTEGER) AS alarm
         |FROM c ORDER BY event_type, hour_idx""".stripMargin
    },

    // two-stage window mirror: ec first, then the carried signup pair
    // over the identical (ts, prio, id) per-user order
    "ev_pattern_match" -> {
      val sigMs = graft.functions.Fns.floorDivDuckSql("last_sig_ns", 1000000L)
      val gapMs = graft.functions.Fns
        .floorDivDuckSql("ts_ns - last_sig_ns", 1000000L)
      s"""WITH e AS (
         |  SELECT event_id, user_id, epoch_ns(ts) AS ts_ns, event_type,
         |   CASE event_type WHEN 'error' THEN 0 WHEN 'signup' THEN 1
         |        ELSE 2 END AS prio
         |  FROM events
         |  WHERE event_type IN ('signup', 'error', 'purchase')),
         |r1 AS (
         |  SELECT *, CAST(sum(CASE WHEN event_type = 'error' THEN 1
         |                    ELSE 0 END) OVER w AS BIGINT) AS ec
         |  FROM e
         |  WINDOW w AS (PARTITION BY user_id
         |    ORDER BY ts_ns, prio, event_id ROWS UNBOUNDED PRECEDING)),
         |r2 AS (
         |  SELECT *,
         |   last_value(sig_ns_c IGNORE NULLS) OVER w AS last_sig_ns,
         |   last_value(sig_ec_c IGNORE NULLS) OVER w AS last_sig_ec
         |  FROM (SELECT *,
         |         CASE WHEN event_type = 'signup' THEN ts_ns END AS sig_ns_c,
         |         CASE WHEN event_type = 'signup' THEN ec END AS sig_ec_c
         |        FROM r1)
         |  WINDOW w AS (PARTITION BY user_id
         |    ORDER BY ts_ns, prio, event_id ROWS UNBOUNDED PRECEDING))
         |SELECT event_id, user_id, $sigMs AS signup_ms, $gapMs AS gap_ms
         |FROM r2
         |WHERE event_type = 'purchase' AND last_sig_ns IS NOT NULL
         | AND ts_ns - last_sig_ns <= 3600000000000
         | AND ec = last_sig_ec
         |ORDER BY event_id""".stripMargin
    },

    "ev_drift" ->
      s"""WITH b AS (
         |  SELECT min(epoch_ms(ts)) AS mn, max(epoch_ms(ts)) AS mx,
         |   min(value) AS vmn, max(value) AS vmx FROM events),
         |cnt AS (
         |  SELECT event_type, bin,
         |   sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS ref_n,
         |   sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS cur_n
         |  FROM (
         |   SELECT event_type,
         |    CASE WHEN epoch_ms(ts) * 2 <= mn + mx THEN 0 ELSE 1 END AS half,
         |    CAST(least(${DriftBins - 1}, floor((value - vmn) * ${DriftBins}.0
         |      / (vmx - vmn))) AS INTEGER) AS bin
         |   FROM events CROSS JOIN b)
         |  GROUP BY 1, 2),
         |wt AS (
         |  SELECT *, sum(ref_n) OVER (PARTITION BY event_type) AS ref_total,
         |   sum(cur_n) OVER (PARTITION BY event_type) AS cur_total
         |  FROM cnt)
         |SELECT event_type,
         | CAST(ref_total AS BIGINT) AS ref_total,
         | CAST(cur_total AS BIGINT) AS cur_total,
         | count(*) AS n_bins,
         | CAST(sum(abs(ref_n * cur_total - cur_n * ref_total)) AS BIGINT)
         |   AS tvd_scaled,
         | CASE WHEN ref_total > 0 AND cur_total > 0 THEN
         |   CAST(sum(abs(ref_n * cur_total - cur_n * ref_total)) AS DOUBLE)
         |     / (2.0 * ref_total * cur_total) END AS tvd
         |FROM wt GROUP BY event_type, ref_total, cur_total
         |ORDER BY event_type""".stripMargin,

    "ev_markov_rank" ->
      s"""WITH edges AS (
         |  SELECT event_type AS src, next_type AS dst, count(*) AS n FROM (
         |   SELECT event_type, lead(event_type)
         |     OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
         |   FROM events)
         |  WHERE next_type IS NOT NULL GROUP BY 1, 2),
         |nodes AS (SELECT DISTINCT event_type AS node FROM events),
         |vc AS (SELECT count(*) AS vcnt FROM nodes),
         |outw AS (SELECT src, sum(n) AS outn FROM edges GROUP BY 1),
         |r0 AS (SELECT node, CAST($RankMass AS BIGINT) // vcnt AS r
         |       FROM nodes CROSS JOIN vc),
         |${(1 to RankIters).map(rankIterSql).mkString(",\n")}
         |SELECT node AS event_type, CAST(r AS BIGINT) AS rank_scaled
         |FROM r$RankIters
         |ORDER BY rank_scaled DESC, event_type""".stripMargin,

    "ev_attribution" ->
      """SELECT purchase_id, user_id, ts_ms, last_click_id, gap_ms FROM (
        |  SELECT event_id AS purchase_id, user_id, event_type,
        |   epoch_ms(ts) AS ts_ms,
        |   last_value(CASE WHEN event_type = 'click' THEN event_id END
        |     IGNORE NULLS) OVER w AS last_click_id,
        |   (epoch_ns(ts) - last_value(CASE WHEN event_type = 'click'
        |      THEN epoch_ns(ts) END IGNORE NULLS) OVER w) // 1000000
        |     AS gap_ms
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |WHERE event_type = 'purchase' ORDER BY purchase_id""".stripMargin,

    "ev_seasonal_residual" ->
      """WITH cnt AS (
        |  SELECT event_type,
        |   epoch_ms(time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)))
        |     // 86400000 AS day_idx,
        |   hour(ts) AS hod, count(*) AS n
        |  FROM events GROUP BY 1, 2, 3),
        |base AS (
        |  SELECT event_type, hod, sum(n) AS tot_n, count(*) AS n_days
        |  FROM cnt GROUP BY 1, 2)
        |SELECT event_type, day_idx, CAST(hod AS INTEGER) AS hod, n,
        | CAST(n_days AS BIGINT) AS n_days, CAST(tot_n AS BIGINT) AS tot_n,
        | CAST((n * n_days * 1000) // tot_n AS BIGINT) AS ratio_x1000
        |FROM cnt JOIN base USING (event_type, hod)
        |WHERE n * n_days > tot_n * 2
        |ORDER BY event_type, day_idx, hod""".stripMargin,

    "ev_ewma" ->
      s"""SELECT event_type,
         | CAST(len(vs) AS INTEGER) AS n_hours,
         | vs[1] // $EwmaScale AS first_n,
         | vs[len(vs)] // $EwmaScale AS last_n,
         | CAST(list_reduce(vs, (acc, x) -> acc + (x - acc) // 4) AS BIGINT)
         |   AS ewma_scaled,
         | CAST(list_reduce(vs, (acc, x) -> acc + (x - acc) // 4) AS DOUBLE)
         |   / ${EwmaScale}.0 AS ewma
         |FROM (
         |  SELECT event_type,
         |   list(CAST(n AS BIGINT) * $EwmaScale ORDER BY hour_idx) AS vs
         |  FROM (
         |   -- time_bucket FLOORS (sign-safe), so the // below divides an
         |   -- exact multiple — matching the engine's floorDiv on ts_ms
         |   SELECT event_type,
         |    epoch_ms(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)))
         |      // 3600000 AS hour_idx,
         |    count(*) AS n
         |   FROM events GROUP BY 1, 2)
         |  GROUP BY event_type)
         |ORDER BY event_type""".stripMargin,

    "ev_ab_test" ->
      """WITH u AS (
        |  SELECT user_id,
        |   min(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END) AS fv,
        |   min(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS fp
        |  FROM events GROUP BY user_id),
        |c AS (
        |  SELECT user_id % 2 AS cohort,
        |   CASE WHEN fp IS NOT NULL AND fp >= fv AND fp - fv <= 86400000
        |        THEN 1 ELSE 0 END AS conv
        |  FROM u WHERE fv IS NOT NULL),
        |t AS (
        |  SELECT
        |   CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |   CAST(sum(CASE WHEN cohort = 0 THEN conv ELSE 0 END) AS BIGINT) AS c_a,
        |   CAST(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |   CAST(sum(CASE WHEN cohort = 1 THEN conv ELSE 0 END) AS BIGINT) AS c_b
        |  FROM c)
        |SELECT n_a, c_a, n_b, c_b,
        | CAST(c_a AS DOUBLE) / n_a AS rate_a,
        | CAST(c_b AS DOUBLE) / n_b AS rate_b,
        | CAST(c_a + c_b AS DOUBLE) / (n_a + n_b) AS p_pool,
        | (CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b) /
        |  sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)) *
        |       (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)) *
        |       (1.0 / n_a + 1.0 / n_b)) AS z,
        | CAST(abs((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b) /
        |  sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)) *
        |       (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)) *
        |       (1.0 / n_a + 1.0 / n_b))) > 1.96 AS INTEGER) AS significant_95
        |FROM t""".stripMargin,

    "ev_ab_cuped" ->
      """WITH b AS (
        |  SELECT min(epoch_ms(ts)) AS mn, max(epoch_ms(ts)) AS mx FROM events),
        |u AS (
        |  SELECT user_id,
        |   CAST(sum(CASE WHEN event_type = 'purchase'
        |         AND epoch_ms(ts) < (mn + mx) // 2
        |        THEN CAST(value AS DECIMAL(12,2))
        |        ELSE CAST(0 AS DECIMAL(12,2)) END) AS DECIMAL(18,2)) AS x,
        |   CAST(sum(CASE WHEN event_type = 'purchase'
        |         AND epoch_ms(ts) >= (mn + mx) // 2
        |        THEN CAST(value AS DECIMAL(12,2))
        |        ELSE CAST(0 AS DECIMAL(12,2)) END) AS DECIMAL(18,2)) AS y
        |  FROM events, b GROUP BY user_id),
        |g AS (
        |  SELECT count(*) AS gn,
        |   CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |   CAST(sum(x*x) AS DOUBLE) AS sxx, CAST(sum(x*y) AS DOUBLE) AS sxy
        |  FROM u),
        |c AS (
        |  SELECT user_id % 2 AS cohort, count(*) AS n,
        |   CAST(sum(x) AS DOUBLE) AS sxc, CAST(sum(y) AS DOUBLE) AS syc
        |  FROM u GROUP BY 1)
        |SELECT cohort, n,
        | syc / n AS mean_y,
        | sxc / n AS mean_x,
        | (syc / n) - ((gn * sxy) - (sx * sy)) / ((gn * sxx) - (sx * sx)) *
        |   ((sxc / n) - (sx / gn)) AS adj_mean,
        | ((gn * sxy) - (sx * sy)) / ((gn * sxx) - (sx * sx)) AS theta
        |FROM c, g ORDER BY cohort""".stripMargin
  )
}
