package graft

import org.apache.spark.sql.functions._

/** BM25 / inverted index / temperature mixing / top-k sampling /
  * embedding quantization — the round-3 retrieval + mixing additions.
  */
class RetrievalSamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text").withColumn("source", lit("s0"))

  test("bm25: hand-computed scores, rare term outranks repeated common term") {
    val df = docsDf(
      1L -> "dup spark",
      2L -> "spark spark spark merge",
      3L -> "other words only")
    val out = api.GraftPipelines.bm25RationalIdf(df, Seq("spark", "merge", "dup"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // N=3, avgdl=3, df(spark)=2, df(merge)=df(dup)=1 — same formula, by hand
    def contrib(tf: Long, df: Long, dl: Long): Double = {
      val idf = (3.0 - df.toDouble + 0.5) / (df.toDouble + 0.5)
      idf * ((tf.toDouble * 2.2) /
        (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / 3.0))))
    }
    val d1 = contrib(1, 2, 2) + contrib(0, 1, 2) + contrib(1, 1, 2)
    val d2 = contrib(3, 2, 4) + contrib(1, 1, 4) + contrib(0, 1, 4)
    assert(math.abs(out(1L) - d1) < 1e-12)
    assert(math.abs(out(2L) - d2) < 1e-12)
    assert(!out.contains(3L)) // no query terms → score 0 → filtered
    assert(out(1L) > out(2L)) // one rare 'dup' beats three common 'spark's
  }

  test("bm25LogIdf: multi-term ranking equals textbook (math.log) BM25 " +
      "on a corpus where the rational twin's linear idf flips the order") {
    // 50 docs; 15 'common' query terms with df = 40, one 'rare' term
    // with df = 1. Doc B carries every common term at near-saturating
    // tf = 8 at roughly average length; doc A carries one 'rare' at
    // twice average length. Under textbook log idf B outranks A
    // (15 * ln(51/40.5) * ~1.9 > ln(34) * ~0.7); under the rational
    // twin the rare term's LINEARLY amplified idf ((50-1+0.5)/1.5 = 33
    // vs ln(34) = 3.53) flips that — the exact bias the log twin
    // exists to remove.
    val cTerms = (1 to 15).map(i => s"common$i")
    val docA = 1L -> ("rare " +
      (1 to 239).map(i => s"fill$i").mkString(" "))
    val docB = 2L -> cTerms.flatMap(t => Seq.fill(8)(t)).mkString(" ")
    val carriers = (3L to 41L).map(i =>
      i -> (cTerms.mkString(" ") + s" extra$i"))
    val fillers = (42L to 50L).map(i =>
      i -> (1 to 557).map(j => s"junk${i}_$j").mkString(" "))
    val df = docsDf((Seq(docA, docB) ++ carriers ++ fillers): _*)
    val terms = "rare" +: cTerms
    // independent textbook reference computed from raw tf/df/dl
    val texts = (Seq(docA, docB) ++ carriers ++ fillers).toMap
    val dls = texts.map { case (id, t) => id -> t.split(" ").length }
    val n = texts.size.toDouble
    val avgdl = dls.values.sum.toDouble / n
    val dfs = terms.map(t =>
      t -> texts.values.count(_.split(" ").contains(t)).toDouble).toMap
    def textbook(id: Long): Double = terms.map { t =>
      val tf = texts(id).split(" ").count(_ == t).toDouble
      val idf = math.log((n + 1.0) / (dfs(t) + 0.5))
      idf * ((tf * 2.2) /
        (tf + 1.2 * (0.25 + 0.75 * (dls(id).toDouble / avgdl))))
    }.sum
    val expected = texts.keys.toSeq.map(id => id -> textbook(id))
      .filter(_._2 > 0).sortBy { case (id, sc) => (-sc, id) }.take(10)
    val got = api.GraftPipelines.bm25LogIdf(df, terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toSeq
    assert(got.map(_._1) == expected.map(_._1),
      s"log-idf ranking must match textbook BM25: got ${got.map(_._1)}, " +
        s"want ${expected.map(_._1)}")
    got.zip(expected).foreach { case ((_, g), (_, w)) =>
      assert(math.abs(g - w) <= 1e-8 * math.max(1.0, math.abs(w)),
        s"score $g must approximate textbook $w within the series bound")
    }
    // the behavioral difference is real: textbook ranks the saturated
    // common doc first, the rational twin puts the rare-term doc first
    assert(got.head._1 == 2L)
    val rational = api.GraftPipelines.bm25RationalIdf(df, terms)
      .collect().map(_.getLong(0))
    assert(rational.head == 1L,
      "fixture degenerate: the rational twin should flip this ranking")
  }

  test("invertedIndex: exact postings, minDf drops the hapax tail") {
    val df = docsDf(5L -> "b a", 2L -> "a c", 9L -> "a b")
    val idx = api.GraftPipelines.invertedIndex(df, minDf = 2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(idx("a") == (3L, "2,5,9")) // sorted numerically, not lexically
    assert(idx("b") == (2L, "5,9"))
    assert(!idx.contains("c")) // df=1 < minDf
  }

  test("temperatureMix: sqrt rates, smallest source keeps everything") {
    val df = ((0L until 100L).map(i => (i, "big")) ++
      (100L until 125L).map(i => (i, "small")))
      .toDF("doc_id", "source").withColumn("text", lit("x"))
    val mix = api.GraftPipelines.temperatureMix(df).collect()
      .map(r => r.getString(0) -> r).toMap
    // rate(small) = sqrt(25/25) = 1 → 1e6 ppm, every doc kept
    assert(mix("small").getAs[Long]("rate_ppm") == 1000000L)
    assert(mix("small").getAs[Long]("n_kept") == 25L)
    // rate(big) = sqrt(25/100) = 0.5 exactly
    assert(mix("big").getAs[Long]("rate_ppm") == 500000L)
    val kept = mix("big").getAs[Long]("n_kept")
    assert(kept > 0 && kept < 100)
    // deterministic: rerun selects the identical count
    val rerun = api.GraftPipelines.temperatureMix(df).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_kept")).toMap
    assert(rerun("big") == kept)
  }

  test("sampleTopKPerStratum: exact k per stratum, rerun-stable ranks") {
    val df = (0L until 40L).map(i => (i, s"src${i % 2}", s"t$i"))
      .toDF("doc_id", "source", "text")
    val s1 = api.GraftPipelines.sampleTopKPerStratum(df, 5).collect()
    assert(s1.length == 10)
    val bySrc = s1.groupBy(_.getAs[String]("source"))
    bySrc.values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("sample_rank")).sorted.toSeq == (1 to 5))
    }
    val s2 = api.GraftPipelines.sampleTopKPerStratum(df, 5).collect()
    assert(s1.map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("sample_rank")))
      .toSet == s2.map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("sample_rank"))).toSet)
  }

  test("chunkDocuments: coverage, overlap, and short-doc invariants") {
    // 11 words, width 4, stride 3 → full chunks at 0,3,6 + short at 9
    val words = (1 to 11).map(i => s"w$i")
    val df = docsDf(1L -> words.mkString(" "), 2L -> "a b")
    val out = api.GraftPipelines.chunkDocuments(df, 4, 3).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getInt(2), r.getString(3)))
      .toMap
    assert(out((1L, 0)) == (4, "w1 w2 w3 w4"))
    assert(out((1L, 1)) == (4, "w4 w5 w6 w7"))
    assert(out((1L, 2)) == (4, "w7 w8 w9 w10"))
    assert(out((1L, 3)) == (2, "w10 w11")) // final short chunk
    assert(out((2L, 0)) == (2, "a b")) // doc shorter than width → 1 chunk
    assert(out.size == 5)
    // every word of doc 1 appears in some chunk (coverage)
    val covered = out.collect { case ((1L, _), (_, t)) => t.split(" ") }
      .flatten.toSet
    assert(covered == words.toSet)
  }

  test("bm25: score strictly increases with tf of a query term") {
    // identical-length docs, increasing 'dup' counts
    val df = docsDf(
      1L -> "dup x x x", 2L -> "dup dup x x", 3L -> "dup dup dup x")
    val out = api.GraftPipelines.bm25RationalIdf(df, Seq("dup"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(3L) > out(2L) && out(2L) > out(1L))
  }

  test("profile: hand-computed metrics incl. nulls, one row per column") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None),
      (None, Some("b")), (Some(2L), Some("a")))
      .toDF("k", "s")
    val p = api.GraftPipelines.profile(df, Seq("k"), Seq("s")).collect()
      .map(r => r.getString(0) -> r).toMap
    val k = p("k")
    assert(k.getLong(1) == 4 && k.getLong(2) == 1 && k.getLong(3) == 2)
    assert(k.getDouble(4) == 1.0 && k.getDouble(5) == 2.0)
    assert(k.isNullAt(6) && k.isNullAt(7))
    val s = p("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 2)
    assert(s.getString(6) == "a" && s.getString(7) == "b")
    // sketch path (the 100 TB default): within HLL tolerance of exact
    val approx = api.GraftPipelines
      .profile(df, Seq("k"), Seq("s"), exactDistinct = false).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(math.abs(approx("k") - 2L) <= 1 && math.abs(approx("s") - 2L) <= 1)
  }

  test("weightedSample: weight 0 drops all, weight 1 keeps all, rerun-stable") {
    val df = (0L until 60L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    assert(api.GraftPipelines.weightedSample(df, lit(0.0)).count() == 0L)
    assert(api.GraftPipelines.weightedSample(df, lit(1.0)).count() == 60L)
    val half = (1 to 2).map(_ => api.GraftPipelines
      .weightedSample(df, lit(0.5)).collect().map(_.getLong(0)).toSet)
    assert(half(0) == half(1) && half(0).nonEmpty && half(0).size < 60)
  }

  test("quantizeEmbeddings: known norm and components, zero vector guarded") {
    val df = Seq(
      (1L, Array(3.0f, -4.0f)),
      (2L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = api.GraftPipelines.quantizeEmbeddings(df).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap
    assert(out(1L)._1 == 5.0) // sqrt(9 + 16), exact
    // scale = 4: floor(3/4*127) = floor(95.25) = 95; floor(-127.0) = -127
    assert(out(1L)._2 == "95,-127")
    assert(out(2L) == (0.0, "")) // zero vector → empty quantization
  }

  test("globalShuffle: exact permutation, dense positions, salt-keyed order") {
    val docs = (0L until 40L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val out = api.GraftPipelines.globalShuffle(docs, 4).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("skey"),
        r.getAs[Int]("shard"), r.getAs[Long]("pos")))
    // a permutation: every doc exactly once, shard = skey mod 4
    assert(out.map(_._1).sorted.toSeq == (0L until 40L))
    out.foreach { case (_, skey, shard, _) =>
      assert(skey >= 0 && shard == (skey % 4).toInt)
    }
    // positions dense 0..n-1 within each shard, ordered by (skey, id)
    out.groupBy(_._3).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (0L until rows.length))
      val bySkey = rows.sortBy(r => (r._2, r._1)).map(_._1).toSeq
      assert(rows.sortBy(_._4).map(_._1).toSeq == bySkey)
    }
    // deterministic rerun; a different salt permutes differently
    val again = api.GraftPipelines.globalShuffle(docs, 4).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos"))).toMap
    assert(out.forall { case (id, _, _, pos) => again(id) == pos })
    val salted = api.GraftPipelines.globalShuffle(docs, 4, salt = "shuf2")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Int]("shard"), r.getAs[Long]("pos")))).toMap
    assert(out.exists { case (id, _, sh, pos) => salted(id) != ((sh, pos)) },
      "a different salt must yield a different permutation")
  }
}
