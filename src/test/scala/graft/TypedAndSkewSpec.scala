package graft

import org.apache.spark.sql.functions._

import graft.api.GraftPipelines

/** Typed Dataset slice + salted-join equivalence. */
class TypedAndSkewSpec extends SparkSpec {
  import spark.implicits._

  test("typed stats agree with the untyped catalog counts") {
    val typed = TypedEvents.statsByType(TypedEvents.events(spark, sf))
      .collect().map(s => s.event_type -> s.n).toMap
    val untyped = q("ev_catalog").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(typed == untyped)
  }

  test("typed filter+map pipeline returns distinct high-value users") {
    val users = TypedEvents.highValueUsers(
      TypedEvents.events(spark, sf), 300.0).collect()
    assert(users.distinct.length == users.length)
    val expect = spark.read.parquet(s"$sf/events.parquet")
      .filter($"value" >= 300.0).select($"user_id").distinct().count()
    assert(users.length == expect)
  }

  test("saltedJoin returns exactly the plain join's rows under skew") {
    // skewed big side: 90% of rows share one key
    val big = (1 to 2000).map { i =>
      (if (i % 10 == 0) i.toLong % 7 else 42L, i.toLong)
    }.toDF("k", "payload")
    val small = Seq((42L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "name")
    val plain = big.join(small, Seq("k"))
      .select($"k", $"payload", $"name").collect().map(_.toSeq).sortBy(_.toString)
    val salted = GraftPipelines.saltedJoin(big, small, "k", "payload", 8)
      .select($"k", $"payload", $"name").collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.length == plain.length)
    assert(salted.sameElements(plain))
    // and the salted plan actually fans the hot key out
    val saltCounts = big.withColumn("__salt",
      pmod(xxhash64($"payload"), lit(8)).cast("int"))
      .filter($"k" === 42L).groupBy($"__salt").count().collect()
    assert(saltCounts.length > 1, "hot key should spread over salts")
  }

  test("AQE OptimizeSkewedJoin splits the hot partition (skew=true) " +
      "with bit-identical results") {
    // The runtime twin of the static saltedJoin: on the DevSkew-shaped
    // 80%-hot fixture, AQE itself must detect the oversized reducer
    // partition of a shuffle join and split it — the plan's SMJ node
    // carries skew=true — with results identical to the unoptimized
    // join. Thresholds are lowered to test scale (the production
    // defaults are 256 MB / 5x median); broadcast is disabled to force
    // the shuffle join the optimization exists for.
    //
    // When the static salted rewrite is STILL needed (docs/PLANS.md
    // "skew stress"): AQE splits only join reducer partitions, after
    // the map side has already written the hot partition, at spill
    // granularity — it does not help skewed AGGREGATIONS (groupBy on
    // the hot key), nor plans where the skewed join feeds a same-key
    // downstream shuffle (splitting would invalidate the partitioning,
    // so AQE declines unless forceOptimizeSkewedJoin), nor the
    // map-side pre-spread that packSequencesSalted needs. Salting
    // remains the static answer for those; AQE covers the plain
    // dim⋈fact hot-key case with zero query changes.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "512k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128k")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // 200k rows, 80% on key 42, ~64B payload -> hot partition well
      // past the lowered threshold
      val big = spark.range(200000L)
        .select(when(pmod($"id", lit(10)) < 8, 42L)
          .otherwise(pmod($"id", lit(1000))).as("k"),
          concat(lit("p"), lpad($"id".cast("string"), 60, "0")).as("payload"))
      val small = spark.range(1000L)
        .select($"id".as("k"), concat(lit("name_"), $"id").as("name"))
      val joined = big.join(small, Seq("k"))
        .agg(count(lit(1)).as("n"), sum(length($"payload")).as("bytes"))
      val optimized = joined.collect()
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${plan.take(1200)}")
      // same query with skew handling off: identical result
      conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val baseline = big.join(small, Seq("k"))
        .agg(count(lit(1)).as("n"), sum(length($"payload")).as("bytes"))
        .collect()
      assert(optimized.map(_.toSeq).toSeq == baseline.map(_.toSeq).toSeq)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("packSequencesSalted spreads an 80%-hot stratum over sub-strata") {
    // 4000 docs, 80% in one stratum — the skew shape the salted form
    // exists for (docs/PLANS.md "skew stress" records the measured
    // timing + reducer-load delta at 4M rows)
    val salts = 8
    val df = (1L to 4000L).map { i =>
      (i, if (i % 10 < 8) "hot" else s"s${i % 3}", (i % 400 + 50).toInt)
    }.toDF("doc_id", "source", "n_tokens")
    val out = GraftPipelines.packSequencesSalted(df, 2048, salts)
    // bin = local_bin * salts + salt, so bin % salts recovers the
    // sub-stratum — assert the hot stratum's rows actually spread and
    // no sub-stratum hogs the sort (each ≤ 1/4 of the stratum at x8)
    val spread = out.filter($"source" === "hot")
      .groupBy(pmod($"bin", lit(salts)).as("salt")).count().collect()
    assert(spread.length == salts, s"expected $salts sub-strata, got ${spread.length}")
    val hotRows = out.filter($"source" === "hot").count()
    assert(spread.map(_.getAs[Long]("count")).max <= hotRows / 4,
      "one sub-stratum carries too much of the hot stratum")
  }
}
