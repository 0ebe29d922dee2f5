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
