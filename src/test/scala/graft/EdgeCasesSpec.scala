package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Edge-value semantics (FIXTURES.md micro-fixtures): empty strings,
  * nulls, epoch-boundary timestamps, uint64 top-bit values.
  */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  test("empty and null props survive the events pipeline") {
    val events = Seq(
      (1L, 1000000000L, 1L, "alpha", 1.0, "{}"),
      (2L, 2000000000L, 1L, "alpha", 0.0, null.asInstanceOf[String]),
      (3L, 3000000000L, 2L, "beta", -5.5, """{"k": null}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tempSfDir("events" -> events)
    // catalog aggregates all rows regardless of props shape
    val cat = q("ev_catalog", dir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(cat == Map("alpha" -> 2L, "beta" -> 1L))
    // k extraction yields nulls, not failures
    val sorted = q("ev_catalog_sort", dir).collect()
    assert(sorted.forall(_.getAs[Long]("n") >= 1))
  }

  test("empty text documents flow through text/dedup pipelines") {
    val docs = Seq(
      (1L, "", "en", "s0", 0L),
      (2L, "one", "en", "s0", 3L),
      (3L, "one two", "en", "s0", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tempSfDir("documents" -> docs)
    // quality: empty text → 1 empty "word"; no crash, no div-by-zero
    val qs = q("llm_quality_score", dir).collect()
    assert(qs.length == 3)
    assert(qs.find(_.getLong(0) == 1L).get.getAs[Int]("n_words") == 1)
    // fingerprint skips docs with <2 words (1 and 2 absent)
    val fps = q("llm_fingerprint", dir).collect().map(_.getLong(0)).toSet
    assert(fps == Set(3L))
    // minhash candidates: no doc has >=3 words except doc 3 → no pairs
    assert(q("llm_minhash_pairs", dir).collect().isEmpty)
    // exact dedup still hashes the empty string
    assert(q("llm_dedup_exact", dir).count() == 3)
  }

  test("round-3 pipeline ops handle empty and degenerate inputs") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // dupClusters on no pairs: terminates, returns no rows
    assert(api.GraftPipelines.dupClusters(
      Seq.empty[(Long, Long)].toDF("d1", "d2")).count() == 0L)
    // decontaminate with an empty eval set: all docs clean
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val clean = api.GraftPipelines.decontaminate(docs, empty, 5).collect()
    assert(clean.length == 1 && clean.head.getInt(2) == 0)
    // curate on an empty corpus: empty out, no crash in the checkpoint path
    assert(api.GraftPipelines.curate(
      Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source"))
      .count() == 0L)
    // packSequences: docs larger than the budget each take their own bin
    val big = Seq((1L, "a", 5000), (2L, "a", 5000)).toDF("doc_id", "source", "n_tokens")
    val bins = api.GraftPipelines.packSequences(big, 2048).collect()
      .map(r => r.getLong(0) -> r.getAs[Int]("bin")).toMap
    assert(bins == Map(1L -> 0, 2L -> 2))
  }

  test("pre-epoch timestamps keep ordering and negative epoch millis") {
    val events = Seq(
      (1L, -86400L * 1000000000L, 1L, "alpha", 1.0, "{}"), // 1969-12-31
      (2L, 0L, 1L, "alpha", 1.0, "{}"),                     // epoch
      (3L, 86400L * 1000000000L, 1L, "alpha", 1.0, "{}"))   // 1970-01-02
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tempSfDir("events" -> events)
    val flag = operators.EventOps.events(spark, dir)
      .orderBy($"ts_ns").select($"event_id", $"ts_ms").collect()
    assert(flag.map(_.getLong(0)).sameElements(Array(1L, 2L, 3L)))
    assert(flag.head.getLong(1) == -86400000L)
  }

  test("uint64 top-bit values round-trip through Decimal(20,0)") {
    // SURVEY §7.4: LongType overflows top-bit uint64; Decimal(20,0) holds it
    val big = BigDecimal("18446744073709551615") // 2^64 - 1
    val df = Seq("18446744073709551615", "9223372036854775808", "0")
      .toDF("s")
      .select($"s".cast(DecimalType(20, 0)).as("v"))
    val vals = df.orderBy($"v").collect().map(_.getDecimal(0).toString)
    assert(vals.sameElements(Array("0", "9223372036854775808",
      "18446744073709551615")))
    val total = df.agg(org.apache.spark.sql.functions.sum($"v"))
      .collect()(0).getDecimal(0)
    assert(BigDecimal(total) == big + BigDecimal("9223372036854775808"))
  }
}
