package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Fns.{floorDiv, floorDivDuckSql, floorDivSql}

/** Temporal join operators the reference lacks entirely (SURVEY.md §2.5
  * "range/as-of joins absent") — the standard event-log enrichment shapes.
  *
  * Scale notes (100 TB):
  *  - The as-of join is NOT a per-row range probe: it's the merge-scan
  *    form — union both streams, hash-partition by user, sort by time
  *    within partition, carry the last match forward with a running
  *    window. One shuffle, no N×M candidate explosion, no skew cliff.
  *  - The range join keys the equi-part (user_id) so Spark executes a
  *    hash join with the time-band as residual filter; candidate pairs
  *    are bounded per user, never cross-user.
  */
object JoinOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // As-of join: for every error event, the user's most recent signup
    // at-or-before it (merge-scan via union + running last_value).
    "ev_asof_join" -> ((s, dir) => {
      import s.implicits._
      val ev = EventOps.events(s, dir)
        .filter($"event_type".isin("signup", "error"))
        .select($"user_id", $"ts_ns",
          when($"event_type" === "error", $"event_id").as("err_id"),
          when($"event_type" === "signup", $"ts_ns").as("sig_ns"))
      // signup sorts before an error at the same instant → "at or before"
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts_ns", $"err_id".isNotNull.cast("int"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("last_sig_ns", last($"sig_ns", ignoreNulls = true).over(w))
        .filter($"err_id".isNotNull)
        .select($"err_id".as("event_id"), $"user_id",
          floorDiv("last_sig_ns", 1000000L).as("signup_ms"))
        .orderBy($"event_id")
    }),

    // Nearest as-of join (pandas merge_asof direction='nearest' with a
    // tolerance, the time-series enrichment the backward-only
    // ev_asof_join can't express): every error event matched to the
    // temporally NEAREST signup within ±30 min in EITHER direction,
    // ties to the earlier (backward) signup. Same merge-scan
    // discipline — one per-user sort feeds a running last (backward
    // candidate) and a running first over the following frame
    // (forward candidate); the nearest pick is a pure per-row
    // projection. A signup sharing the error's instant sorts before
    // it, so it is the backward candidate at distance 0. Unmatched
    // errors survive with pick='none' (the audit needs the misses).
    // At 100 TB: one user-keyed exchange + in-partition sort, two
    // window passes over the SAME sort — no N×M range probe.
    "ev_asof_nearest" -> ((s, dir) => {
      import s.implicits._
      val tol = 1800000000000L // 30 min in ns
      val ev = EventOps.events(s, dir)
        .filter($"event_type".isin("signup", "error"))
        .select($"user_id", $"ts_ns",
          when($"event_type" === "error", $"event_id").as("err_id"),
          when($"event_type" === "signup", $"ts_ns").as("sig_ns"))
      val ord = Window.partitionBy($"user_id")
        .orderBy($"ts_ns", $"err_id".isNotNull.cast("int"))
      val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      ev
        .withColumn("back_ns", last($"sig_ns", ignoreNulls = true).over(wb))
        .withColumn("fwd_ns", first($"sig_ns", ignoreNulls = true).over(wf))
        .filter($"err_id".isNotNull)
        .withColumn("db", $"ts_ns" - $"back_ns")
        .withColumn("df", $"fwd_ns" - $"ts_ns")
        .withColumn("pick",
          when($"db".isNotNull && $"db" <= tol &&
            ($"df".isNull || $"df" > tol || $"db" <= $"df"), lit("back"))
            .when($"df".isNotNull && $"df" <= tol, lit("fwd"))
            .otherwise(lit("none")))
        .withColumn("near_ns",
          when($"pick" === "back", $"back_ns")
            .when($"pick" === "fwd", $"fwd_ns"))
        .withColumn("dist_ns",
          when($"pick" === "back", $"db").when($"pick" === "fwd", $"df"))
        .select($"err_id".as("event_id"), $"user_id", $"pick",
          floorDiv("near_ns", 1000000L).as("signup_ms"),
          floorDiv("dist_ns", 1000000L).as("dist_ms"))
        .orderBy($"event_id")
    }),

    // Salted equi-join: the skew-safe join shape from the library API,
    // oracle-checked for result equivalence with the plain join. The
    // deterministic per-row salt splits each hot key across `salts`
    // reducers and replicates the small side; the salt cancels out of
    // the RESULT, so the DuckDB mirror is the plain join — proving the
    // rewrite is semantics-preserving, not just skew-friendly.
    "rel_join_salted" -> ((s, dir) => {
      import s.implicits._
      val li = graft.Tables.lineitem(s, dir)
        .withColumnRenamed("l_suppkey", "suppkey")
      val supp = graft.Tables.supplier(s, dir)
        .withColumnRenamed("s_suppkey", "suppkey")
        .select($"suppkey", $"s_nationkey")
      graft.api.GraftPipelines.saltedJoin(li, supp, "suppkey",
          discriminator = "l_orderkey", salts = 8)
        .groupBy($"s_nationkey")
        .agg(count(lit(1)).as("n_items"),
          sum(graft.functions.Fns.revenue($"l_extendedprice", $"l_discount"))
            .cast("double").as("revenue"))
        .orderBy($"s_nationkey")
    }),

    // Range (interval) join: events landing within 1 hour after each
    // signup of the same user.
    "ev_range_join" -> ((s, dir) => {
      import s.implicits._
      val ev = EventOps.events(s, dir)
      val sig = ev.filter($"event_type" === "signup")
        .select($"user_id".as("su"), $"event_id".as("sig_id"),
          $"ts_ns".as("sig_ns"))
      val hourNs = 3600L * 1000 * 1000 * 1000
      ev.join(sig, $"user_id" === $"su" &&
          $"ts_ns" > $"sig_ns" && $"ts_ns" <= $"sig_ns" + hourNs)
        .groupBy($"sig_id").agg(count(lit(1)).as("n_follow"))
        .orderBy($"sig_id")
    }),

    // Batch twin of the watermarked stream-stream interval join: the
    // SAME function ([[graft.streaming.EventStreaming.followWithinBand]])
    // over batch frames — watermarks are no-ops in batch, and
    // StreamingSpec ("stream-stream interval join: ... batch equality")
    // proves the streaming output equals this batch form on shared
    // data. The DuckDB hash here therefore covers the stream-stream
    // join's semantics transitively, closing the one operator family
    // that previously rested on a spec alone. The engine compares at
    // its µs timestamp precision (ts = floor(ns/1000) µs); the oracle
    // mirrors with floored ns→µs division, so pre-epoch events bucket
    // identically. Equality on user_id keys the join (sort-merge /
    // shuffled-hash at scale — the band predicate is a post-filter,
    // never a cross product).
    "ev_follow_band" -> ((s, dir) => {
      import s.implicits._
      val ev = EventOps.events(s, dir)
      graft.streaming.EventStreaming.followWithinBand(ev, ev)
        .select($"user_id",
          floorDiv("unix_micros(sig_ts)", 1000L).as("sig_ms"),
          floorDiv("unix_micros(ev_ts)", 1000L).as("ev_ms"),
          $"event_type")
        .orderBy($"user_id", $"sig_ms", $"ev_ms", $"event_type")
    }),

    // Interval-overlap join, cell-bucketed: user sessions (gap-based
    // intervals) × error-incident hours (hours containing ≥1 error) —
    // "how many sessions were active during each incident hour, and for
    // how long" (blast radius). The scalable shape: each session
    // explodes into the fixed 1 h cells it covers (bounded fan-out:
    // duration/1h cells per session), then an EQUI-join on the cell id
    // — never an inequality cross product, so candidate pairs track
    // actual overlaps. The hour table is unhinted (data-scaled in trace
    // duration): statistics decide broadcast vs shuffle.
    "ev_interval_join" -> ((s, dir) => {
      import s.implicits._
      // All interval arithmetic at ms resolution: the oracle's parquet
      // reader keeps µs timestamp precision, so ns endpoints differ in
      // the last three digits; ns→ms truncation agrees exactly in both
      // engines (session BOUNDARIES still form at full ns like
      // ev_sessionize).
      val HOUR_MS = 3600000L
      val ev = EventOps.events(s, dir)
      val w = Window.partitionBy($"user_id").orderBy($"ts_ns", $"event_id")
      val sess = ev
        .withColumn("prev_ns", lag($"ts_ns", 1).over(w))
        .withColumn("new_sess", when($"prev_ns".isNull ||
          ($"ts_ns" - $"prev_ns") > 1800000000000L, 1).otherwise(0))
        .withColumn("sess_id", sum($"new_sess").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"sess_id")
        .agg(floorDiv("min(ts_ns)", 1000000L).as("start_ms"),
          floorDiv("max(ts_ns)", 1000000L).as("end_ms"))
      val errHours = ev.filter($"event_type" === "error")
        .select(floorDiv(floorDivSql("ts_ns", 1000000L), HOUR_MS).as("cell_h"))
        .distinct()
      val cells = sess.select($"user_id", $"start_ms", $"end_ms",
        explode_outer(sequence(floorDiv("start_ms", HOUR_MS),
          floorDiv("end_ms", HOUR_MS))).as("cell_h"))
      cells.join(errHours, "cell_h")
        .withColumn("w_start_ms", $"cell_h" * HOUR_MS)
        .groupBy($"w_start_ms")
        .agg(count(lit(1)).as("n_sessions"),
          sum(least($"end_ms", $"w_start_ms" + HOUR_MS) -
            greatest($"start_ms", $"w_start_ms")).as("overlap_ms"))
        .orderBy($"w_start_ms")
    })
  )

  val oracles: Map[String, String] = Map(
    // the salt cancels out of the result: plain join is the mirror
    "rel_join_salted" ->
      """SELECT s_nationkey, count(*) AS n_items,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    // identical two-window merge-scan; the pick is the same per-row CASE
    "ev_asof_nearest" ->
      s"""WITH e AS (
         |  SELECT user_id, epoch_ns(ts) AS ts_ns,
         |   CASE WHEN event_type = 'error' THEN event_id END AS err_id,
         |   CASE WHEN event_type = 'signup' THEN epoch_ns(ts) END AS sig_ns
         |  FROM events WHERE event_type IN ('signup', 'error')),
         |r AS (
         |  SELECT *,
         |   last_value(sig_ns IGNORE NULLS) OVER (PARTITION BY user_id
         |     ORDER BY ts_ns, CAST(err_id IS NOT NULL AS INTEGER)
         |     ROWS UNBOUNDED PRECEDING) AS back_ns,
         |   first_value(sig_ns IGNORE NULLS) OVER (PARTITION BY user_id
         |     ORDER BY ts_ns, CAST(err_id IS NOT NULL AS INTEGER)
         |     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fwd_ns
         |  FROM e),
         |p AS (
         |  SELECT err_id, user_id, ts_ns, back_ns, fwd_ns,
         |   ts_ns - back_ns AS db, fwd_ns - ts_ns AS df,
         |   CASE
         |    WHEN db IS NOT NULL AND db <= 1800000000000 AND
         |         (df IS NULL OR df > 1800000000000 OR db <= df)
         |     THEN 'back'
         |    WHEN df IS NOT NULL AND df <= 1800000000000 THEN 'fwd'
         |    ELSE 'none' END AS pick
         |  FROM r WHERE err_id IS NOT NULL)
         |SELECT err_id AS event_id, user_id, pick,
         | ${floorDivDuckSql(
              "CASE WHEN pick = 'back' THEN back_ns WHEN pick = 'fwd' THEN fwd_ns END",
              1000000L)} AS signup_ms,
         | ${floorDivDuckSql(
              "CASE WHEN pick = 'back' THEN db WHEN pick = 'fwd' THEN df END",
              1000000L)} AS dist_ms
         |FROM p ORDER BY event_id""".stripMargin,

    "ev_asof_join" ->
      s"""SELECT err_id AS event_id, user_id,
        | ${floorDivDuckSql("last_sig_ns", 1000000L)} AS signup_ms
        |FROM (
        |  SELECT user_id, err_id,
        |   last_value(sig_ns IGNORE NULLS) OVER (
        |     PARTITION BY user_id
        |     ORDER BY ts_ns, CAST(err_id IS NOT NULL AS INTEGER)
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_sig_ns
        |  FROM (
        |    SELECT user_id, epoch_ns(ts) AS ts_ns,
        |     CASE WHEN event_type = 'error' THEN event_id END AS err_id,
        |     CASE WHEN event_type = 'signup' THEN epoch_ns(ts) END AS sig_ns
        |    FROM events WHERE event_type IN ('signup', 'error')))
        |WHERE err_id IS NOT NULL ORDER BY event_id""".stripMargin,

    "ev_range_join" ->
      """SELECT s.event_id AS sig_id, count(*) AS n_follow
        |FROM events e
        |JOIN events s ON e.user_id = s.user_id
        | AND s.event_type = 'signup'
        | AND epoch_ns(e.ts) > epoch_ns(s.ts)
        | AND epoch_ns(e.ts) <= epoch_ns(s.ts) + 3600000000000
        |GROUP BY s.event_id ORDER BY sig_id""".stripMargin,

    // mirrors the engine's µs comparison precision: the engine's ts is
    // floor(ns/1000) µs, so the band test and the output ms both go
    // through exact floored divisions on the oracle side too
    "ev_follow_band" ->
      s"""WITH s AS (
        |  SELECT user_id, ${floorDivDuckSql("epoch_ns(ts)", 1000L)} AS s_us
        |  FROM events WHERE event_type = 'signup'),
        |e AS (
        |  SELECT user_id, ${floorDivDuckSql("epoch_ns(ts)", 1000L)} AS e_us,
        |   event_type
        |  FROM events)
        |SELECT s.user_id AS user_id,
        | ${floorDivDuckSql("s_us", 1000L)} AS sig_ms,
        | ${floorDivDuckSql("e_us", 1000L)} AS ev_ms,
        | event_type
        |FROM s JOIN e ON e.user_id = s.user_id
        | AND e_us > s_us AND e_us <= s_us + 3600000000
        |ORDER BY s.user_id, sig_ms, ev_ms, event_type""".stripMargin,

    // the oracle joins on the naive overlap predicate (session's hour
    // span contains the cell); the engine's cell-explode equi-join must
    // produce the identical result set
    "ev_interval_join" ->
      s"""WITH marked AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS ns,
        |   CASE WHEN lag(epoch_ns(ts)) OVER
        |          (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
        |        IS NULL OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER
        |          (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
        |        > 1800000000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        |sess AS (
        |  SELECT user_id, sess_id,
        |   ${floorDivDuckSql("min(ns)", 1000000L)} AS start_ms,
        |   ${floorDivDuckSql("max(ns)", 1000000L)} AS end_ms
        |  FROM (SELECT user_id, ns,
        |         sum(new_sess) OVER (PARTITION BY user_id
        |           ORDER BY ns, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS sess_id
        |        FROM marked)
        |  GROUP BY user_id, sess_id),
        |hrs AS (
        |  SELECT DISTINCT ${floorDivDuckSql(
             floorDivDuckSql("epoch_ns(ts)", 1000000L), 3600000L)} AS cell_h
        |  FROM events WHERE event_type = 'error')
        |SELECT cell_h * 3600000 AS w_start_ms,
        | count(*) AS n_sessions,
        | CAST(sum(least(end_ms, cell_h * 3600000 + 3600000)
        |        - greatest(start_ms, cell_h * 3600000)) AS BIGINT)
        |   AS overlap_ms
        |FROM sess JOIN hrs
        |  ON ${floorDivDuckSql("start_ms", 3600000L)} <= cell_h
        | AND cell_h <= ${floorDivDuckSql("end_ms", 3600000L)}
        |GROUP BY cell_h ORDER BY w_start_ms""".stripMargin
  )
}
