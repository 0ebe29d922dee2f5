package graft

import org.apache.spark.sql.functions._

import graft.functions.Fns._

/** Similarity search: cosine math properties + LSH bucketing invariants. */
class SimilarityOpsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def vec(): Array[Float] = Array.fill(64)(rnd.nextFloat() - 0.5f)

  test("cosine: self-similarity is 1, symmetric, in [-1, 1]") {
    val vs = Seq.fill(20)(vec())
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val cos = df.as("a").crossJoin(df.as("b"))
      .select(col("a.id").as("i"), col("b.id").as("j"),
        (dotUnrolled(col("a.v"), col("b.v"), 64) /
          (sqrt(norm2Unrolled(col("a.v"), 64)) *
           sqrt(norm2Unrolled(col("b.v"), 64)))).as("cos"))
      .collect()
    cos.foreach { r =>
      val c = r.getAs[Double]("cos")
      assert(c >= -1.0000001 && c <= 1.0000001)
    }
    val self = cos.filter(r => r.getLong(0) == r.getLong(1))
    self.foreach(r => assert(math.abs(r.getAs[Double]("cos") - 1.0) < 1e-9))
    val m = cos.map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("cos")).toMap
    m.foreach { case ((i, j), c) => assert(c == m((j, i))) }
  }

  test("kmeansScaled: declarative k = ceil(n/target) selects the same " +
      "clusters as the literal-k fit") {
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count()
    val target = 64L
    val litK = ((n + target - 1) / target).toInt
    val scaled = graft.api.GraftPipelines.kmeansScaled(emb, target, 2, 64)
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Int]("cluster"), r.getAs[Double]("ccos"))).toSet
    val literal = graft.api.GraftPipelines.kmeans(emb, litK, 2, 64)
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Int]("cluster"), r.getAs[Double]("ccos"))).toSet
    assert(litK > 1, s"fixture must yield a multi-cluster fit, got k=$litK")
    assert(scaled == literal,
      "the scalar-subquery init must be bit-identical to the literal init")
  }

  test("llm_semdedup_scaled: cluster count scales with the corpus " +
      "(k=8 at 500 vecs, 32 at 2000)") {
    // at sf0.001 (500 vectors) ceil(500/64)=8 — same k as the fixed
    // entry, so the two entries must agree exactly there
    val fixed = q("llm_semdedup").collect().map(_.toString).sorted
    val scaled = q("llm_semdedup_scaled").collect().map(_.toString).sorted
    assert(fixed.sameElements(scaled))
    // at sf0.1 (2000 vectors) k=32: more, smaller clusters — the pair
    // count must SHRINK vs fixed k=8 (the linear-at-scale claim), and
    // the assignment must actually use >8 clusters
    val sf01 = "/root/testdata/sf0.1"
    val scaledBig = q("llm_semdedup_scaled", sf01)
    val clusters = scaledBig.select("cluster").distinct().count()
    assert(clusters > 8, s"expected >8 clusters at sf0.1, got $clusters")
    val nScaled = scaledBig.count()
    val nFixed = q("llm_semdedup", sf01).count()
    assert(nScaled < nFixed,
      s"scaled-k pairs ($nScaled) must undercut fixed-k pairs ($nFixed)")
  }

  test("llm_embed_topk: 10 neighbors per query, non-increasing similarity") {
    val rows = q("llm_embed_topk").collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == 5)
    byQ.values.foreach { rs =>
      assert(rs.length == 10)
      val sims = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("cosine"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      assert(!rs.exists(r => r.getAs[Long]("vec_id") == r.getAs[Long]("qid")))
    }
  }

  test("llm_hybrid_search: the quality gate excludes a perfect-cosine match") {
    val e0 = Array.tabulate(64)(i => if (i == 0) 1f else 0f)
    // doc 1 passes the gate; doc 2 (degenerate repetition) fails it —
    // both embeddings are IDENTICAL to the query vector
    val good = "the quick brown fox jumps over a lazy dog near the river today"
    val bad = (1 to 12).map(_ => "aa").mkString(" ")
    val docs = Seq((0L, good, "en", "s0", 1L), (1L, good + " x", "en", "s0", 1L),
      (2L, bad, "en", "s0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val emb = Seq((0L, e0, 0), (1L, e0, 0), (2L, e0, 0))
      .toDF("vec_id", "embedding", "label")
    val dir = tempSfDir("documents" -> docs, "embeddings" -> emb)
    val out = q("llm_hybrid_search", dir).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L),
      "only the quality-passing doc surfaces, query doc 0 excluded")
    assert(math.abs(out.head.getAs[Double]("cosine") - 1.0) < 1e-9)
  }

  test("llm_semantic_decontaminate: a corpus doc cosine-close to an eval " +
      "doc is flagged with its nearest eval id (ties to the smaller id); " +
      "an orthogonal doc is not flagged") {
    val spark = this.spark
    import spark.implicits._
    val ex = Array(1f, 0f, 0f, 0f)
    val ey = Array(0f, 1f, 0f, 0f)
    // docs 10/11 are eval (src19); corpus doc 1 equals BOTH eval vectors'
    // nearest case: identical to eval 10 and 11 (tie → nearest = 10);
    // doc 2 is orthogonal to every eval vector → stays off the report
    val docs = Seq((1L, "t", "en", "s0", 1L), (2L, "t", "en", "s1", 1L),
      (10L, "t", "en", "src19", 1L), (11L, "t", "en", "src19", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val emb = Seq((1L, ex, 0), (2L, ey, 0), (10L, ex, 0), (11L, ex, 0))
      .toDF("vec_id", "embedding", "label")
    val rows = q("llm_semantic_decontaminate",
        tempSfDir("documents" -> docs, "embeddings" -> emb))
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("nearest_eval"), r.getAs[Double]("max_cosine")))
    assert(rows.map(_._1).toSeq == Seq(1L),
      s"only the eval-identical doc is flagged, got ${rows.toSeq}")
    assert(rows.head._2 == 10L, "cosine tie must break to the smaller " +
      s"eval id, got ${rows.head._2}")
    assert(math.abs(rows.head._3 - 1.0) < 1e-12)
  }

  test("llm_embed_lsh_hist: buckets within [0,255], counts sum to table") {
    val rows = q("llm_embed_lsh_hist").collect()
    rows.foreach { r =>
      val b = r.getAs[Int]("bucket")
      assert(b >= 0 && b <= 255)
    }
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.map(_.getAs[Long]("n")).sum == n)
  }

  test("multi-table ANN: recall@3 vs brute force >= single-table recall") {
    val bf = q("llm_embed_topk").collect().filter(_.getAs[Int]("rn") <= 3)
      .groupBy(_.getAs[Long]("qid")).view
      .mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    def recall(name: String): Double = {
      val got = q(name).collect()
        .groupBy(_.getAs[Long]("qid")).view
        .mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
      val hits = bf.map { case (qid, want) =>
        want.intersect(got.getOrElse(qid, Set.empty)).size
      }.sum
      hits.toDouble / bf.values.map(_.size).sum
    }
    val single = recall("llm_embed_lsh_knn")
    val multi = recall("llm_embed_lsh_knn2")
    info(f"recall@3: single-table=$single%.2f multi-table=$multi%.2f")
    // table 0 of the multi-table variant IS the single table, so its
    // candidate set is a superset — recall can only improve
    assert(multi >= single)
    assert(multi > 0.0)
  }

  test("llm_embed_ivf: 3 ranked hits per query, bounded by brute-force best") {
    val bf = q("llm_embed_topk").collect()
      .groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Double]("cosine")).max).toMap
    val rows = q("llm_embed_ivf").collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (qid, rs) =>
      // probed lists are never empty (the query's own centroid list
      // exists), and candidates re-rank by the exact cosine
      assert(rs.length >= 1 && rs.length <= 3)
      val sims = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("cosine"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      rs.foreach(r => assert(r.getAs[Double]("cosine") <= bf(qid) + 1e-12))
    }
  }

  test("llm_embed_lsh_knn: bucketed results are a subset of brute-force candidates' quality") {
    // every LSH neighbor's similarity must be <= the brute-force best
    val bf = q("llm_embed_topk").collect()
      .groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Double]("cosine")).max).toMap
    q("llm_embed_lsh_knn").collect().foreach { r =>
      val qid = r.getAs[Long]("qid")
      assert(r.getAs[Double]("cosine") <= bf(qid) + 1e-12)
    }
  }

  test("llm_embed_pq: deterministic ADC top-10 with real recall against exact") {
    val rows = q("llm_embed_pq").collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.keySet == Set(0L, 1L, 2L))
    // two independent runs of the full fit+encode+scan agree bit-for-bit
    // (no RNG anywhere in the codebook training or scoring)
    assert(rows.map(_.toSeq).sameElements(q("llm_embed_pq").collect().map(_.toSeq)))
    val exact = q("llm_embed_topk").collect()
      .filter(_.getAs[Long]("qid") < 3)
      .groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    byQ.foreach { case (qid, rs) =>
      assert(rs.length == 10)
      // ADC scores arrive ranked
      val scores = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      // 8-bit codes (4 blocks x 4 centroids) are savage compression;
      // the ADC ranking must still beat chance by a wide margin:
      // random-10-of-500 expects 0.2 hits in the exact top-10
      val hits = rs.map(_.getAs[Long]("vec_id")).toSet
        .intersect(exact(qid)).size
      assert(hits >= 1, s"query $qid: PQ top-10 shares $hits with exact top-10")
    }
  }

  test("persisted ANN index: served results are bit-identical to the in-plan refit") {
    // the build/serve split's core contract — a query against the
    // stored artifact returns the SAME rows as the fused build+serve
    // plan (ints/floats round-trip parquet exactly; no RNG anywhere)
    def rows(name: String) = q(name).collect().map(_.toSeq).toSeq
    assert(rows("llm_embed_ivf_served") == rows("llm_embed_ivf"))
    assert(rows("llm_embed_pq_served") == rows("llm_embed_pq"))
    assert(rows("llm_embed_ivfpq_served") == rows("llm_embed_ivfpq"))
  }

  test("incremental encode against the stored index reproduces the built codes") {
    // the APPEND half of the index lifecycle: arriving vectors encode
    // map-side against broadcast codebooks/centroids with no refit —
    // valid only if re-encoding the original corpus reproduces the
    // built artifacts bit-for-bit (same cosine chain, same tie key)
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sf)
    val (books, codes) = api.GraftPipelines.pqIndex(emb, 4, 4, 1, 64)
    val reEncoded = api.GraftPipelines.pqEncode(books, emb, 4, 64)
    def sortedRows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("k0"), col("k1"), col("k2"), col("k3"))
        .orderBy(col("vec_id")).collect().map(_.toSeq).toSeq
    assert(sortedRows(reEncoded) == sortedRows(codes))
    val (cent, assign) = api.GraftPipelines.ivfIndex(emb, 16)
    val reAssigned = api.GraftPipelines.ivfAssign(cent, emb)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("vec_id")).collect().map(_.toSeq).toSeq
    assert(pairs(reAssigned) == pairs(assign))
  }

  test("served ANN plans shuffle only query-derived rows, never the corpus side") {
    // PQ serve: the code table meets only broadcast LUTs/codebooks; the
    // sole hash exchange is the per-query top-k window (plus the
    // presentation sort). IVF serve: the posting table meets a broadcast
    // of the bounded probe set; exchanges touch candidate rows only.
    import org.apache.spark.sql.functions.col
    for (name <- Seq("llm_embed_pq_served", "llm_embed_ivf_served")) {
      val df = q(name)
      df.collect() // materialize so AQE settles its final plan
      val plan = df.queryExecution.executedPlan.toString()
      assert(!plan.contains("SortMergeJoin") &&
        !plan.contains("ShuffledHashJoin"),
        s"$name: corpus side must never shuffle into a join:\n${plan.take(2000)}")
      // every join is a broadcast (LUTs, codebooks, probes, query set)
      assert(plan.contains("BroadcastHashJoin"), s"$name: expected BHJs")
      // the index build must NOT be in the serve plan: a kmeans refit
      // would show up as the fixed-point decimal centroid update
      assert(!plan.contains("decimal(28,0)"),
        s"$name: serve plan contains a codebook/centroid refit")
    }
    // and the stored IVF postings are actually partition-pruned on probe:
    // reading one centroid's list must touch only that partition
    val ix = q("llm_embed_ivf_served") // ensure fixture exists
    ix.collect()
    // derive the fixture path exactly as the entry does (SHA-256 keyed
    // fixtureDir) — a hand-rolled hash here silently reads a STALE or
    // absent directory the moment the keying scheme evolves (it did:
    // this line once mirrored the old 32-bit Tuple.hashCode key and
    // broke when the last old-scheme dir aged out of /tmp)
    val ixDir = graft.sources.GraftIO.fixtureDir(
      sf, "embeddings.parquet", "ivf", s"nc=${operators.SimilarityOps.NC}")
    val oneList = spark.read.parquet(s"$ixDir/assignments")
      .filter(col("centroid") === 3)
    val scan = oneList.queryExecution.executedPlan.toString()
    assert(scan.contains("PartitionFilters") && scan.contains("centroid"),
      s"expected centroid partition pruning in:\n${scan.take(900)}")
  }

  test("llm_hard_negatives: every negative has a different label, ranks dense") {
    val labels = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = q("llm_hard_negatives").collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.foreach { case (qid, rs) =>
      assert(rs.map(_.getAs[Int]("rn")).sorted.toSeq == (1 to 5))
      rs.foreach { r =>
        assert(r.getAs[Int]("neg_label") != labels(qid),
          s"negative for $qid shares its label")
      }
      // scores non-increasing in rank
      val byRank = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("cosine"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("llm_embed_pca: integer power iteration agrees with a double reference") {
    val out = q("llm_embed_pca").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out.size == 64)
    // renorm invariant: the largest |loading| is exactly the scale
    assert(out.values.map(math.abs).max == 1000000L)
    // independent reference: plain-double power iteration on the same
    // quantized matrix (same v0, same 3 rounds, float renorm) — the
    // integer path must point in the same direction
    val x = Tables.embeddings(spark, sf).select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray.map(f => math.floor(f * 10000.0)))
    var v = Array.fill(64)(1.0)
    for (_ <- 1 to 3) {
      val w = Array.fill(64)(0.0)
      x.foreach { row =>
        val s = row.zip(v).map { case (a, b) => a * b }.sum
        (0 until 64).foreach(j => w(j) += row(j) * s)
      }
      val wmax = w.map(math.abs).max
      v = w.map(_ / wmax)
    }
    val e = (1 to 64).map(i => out(i).toDouble)
    val cos = e.zip(v).map { case (a, b) => a * b }.sum /
      (math.sqrt(e.map(a => a * a).sum) * math.sqrt(v.map(a => a * a).sum))
    assert(cos > 0.99999, s"integer and double directions diverge: cos=$cos")
  }

  test("llm_kcenter: greedy farthest-point matches an in-memory reference") {
    val rows = q("llm_kcenter").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 10000).toLong).toArray)
      .sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val seed = vecs.maxBy { case (id, v) => (v.map(x => x * x).sum, -id) }
    var sel = Vector(seed)
    var expect = Vector((1, seed._1, Option.empty[Long]))
    for (r <- 2 to 4) {
      val (id, v, dm) = vecs
        .map { case (id, v) => (id, v, sel.map(c => d2(v, c._2)).min) }
        .maxBy { case (id, _, dm) => (dm, -id) }
      sel :+= ((id, v)); expect :+= ((r, id, Some(dm)))
    }
    val got = rows.map(r => (r.getInt(0), r.getLong(1),
      if (r.isNullAt(2)) Option.empty[Long] else Some(r.getLong(2))))
    assert(got.toVector == expect)
    // covering radius is non-increasing — the greedy invariant
    val radii = expect.flatMap(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b })
  }

  test("llm_probe_auc: exact Mann-Whitney 2U matches brute-force pair counting") {
    val rows = q("llm_probe_auc").collect()
    val data = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => (r.getInt(2),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 10000).toLong).toArray))
    val dirs: Map[Int, Array[Long]] = data.groupBy(_._1).map { case (l, vs) =>
      l -> (0 until 64).map(i => vs.map(_._2(i)).sum).toArray
    }
    assert(rows.map(_.getInt(0)).toSeq == data.map(_._1).distinct.sorted.toSeq)
    for (row <- rows) {
      val p = row.getInt(0)
      val scores = data.map { case (l, v) =>
        (l, v.zip(dirs(p)).map { case (x, s) => x * s }.sum)
      }
      val pos = scores.filter(_._1 == p).map(_._2)
      val neg = scores.filter(_._1 != p).map(_._2)
      val u2 = (for (a <- pos; b <- neg)
        yield if (a > b) 2L else if (a == b) 1L else 0L).sum
      assert(row.getLong(1) == pos.length && row.getLong(2) == neg.length)
      assert(row.getLong(3) == u2, s"probe $p: u2 mismatch")
      assert(row.getDouble(4) == u2.toDouble / (2.0 * pos.length * neg.length))
    }
  }

  test("llm_embed_ivfpq: shortlist re-rank is dominated by the exact IVF ranking") {
    val ivfpq = q("llm_embed_ivfpq").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val ivf = q("llm_embed_ivf").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // same probed cells → the ADC shortlist is a subset of IVF's exact
    // candidate pool, so at every rank the re-ranked cosine can only be
    // ≤ the exact-scan cosine; equality at rank 1 means ADC kept the
    // true best in its shortlist
    val qids = ivfpq.keys.map(_._1).toSeq.distinct.sorted
    assert(qids.size == 3 && ivfpq.size == 9)
    for (((qid, rn), (_, cos)) <- ivfpq; if ivf.contains((qid, rn)))
      assert(cos <= ivf((qid, rn))._2 + 1e-12, s"q$qid rank $rn")
    val top1Kept = qids.count(qd => ivfpq((qd, 1)) == ivf.getOrElse((qd, 1),
      ivfpq((qd, 1))))
    assert(top1Kept >= 2, s"ADC shortlist lost the true best for ${3 - top1Kept}/3 queries")
  }

  test("kcenterSelect: k beyond the corpus degrades deterministically (radius 0)") {
    // 2 vectors, k=4: rounds 3-4 have every min-distance 0 and fall
    // back to the smallest id — duplicates with d2=0, never a crash or
    // nondeterminism; callers see the exhaustion in the radii
    import spark.implicits._
    val vecs = Seq(
      (1L, Array.fill(64)(0.5f)),
      (2L, Array.fill(64)(-0.5f))).toDF("vec_id", "embedding")
    val rows = graft.api.GraftPipelines.kcenterSelect(vecs, 4, 64)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(rows.map(_._2).take(2).toSet == Set(1L, 2L))
    assert(rows.drop(2).forall(r => r._3 == 0L && r._2 == 1L))
  }

  test("llm_source_centroid_sim: exact-sum cosines match an in-memory reference") {
    val rows = q("llm_source_centroid_sim").collect()
    val data = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .flatMap(r => data.get(r.getLong(0)).map(src => src ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 10000).toLong)))
    val cents: Map[String, IndexedSeq[BigInt]] = vecs.groupBy(_._1)
      .map { case (s, vs) =>
        s -> (0 until 64).map(i => BigInt(vs.map(_._2(i)).sum))
      }
    val srcs = cents.keys.toSeq.sorted
    assert(rows.length == srcs.size * (srcs.size - 1) / 2)
    for (row <- rows) {
      val (a, b) = (row.getString(0), row.getString(1))
      val dot = (0 until 64).map(i => cents(a)(i) * cents(b)(i)).sum
      def n2(s: String) = (0 until 64).map(i => cents(s)(i) * cents(s)(i)).sum
      val want = dot.toDouble / (math.sqrt(n2(a).toDouble) * math.sqrt(n2(b).toDouble))
      assert(row.getDouble(2) == want, s"$a vs $b")
      assert(row.getDouble(2) >= -1.0000000001 && row.getDouble(2) <= 1.0000000001)
    }
  }

  /** 64-dim vector with the given (index → value) entries, zeros
    * elsewhere — the hand-computable fixture shape for the eval/graph
    * tests below.
    */
  private def sv(entries: (Int, Float)*): Array[Float] = {
    val a = new Array[Float](64)
    entries.foreach { case (i, x) => a(i) = x }
    a
  }

  test("llm_retrieval_eval: hand-computed ranks on a one-hot fixture") {
    // queries 0..4 one-hot at dim i; vec 5+i one-hot at the same dim
    // (cos 1). Labels: i for both sides except vec 9 (label 99) —
    // query 4 then has NO relevant item. v10 adds a second relevant
    // for query 3 at cos 1/sqrt(2).
    val emb = ((0 to 4).map(i => (i.toLong, sv(i -> 1f), i)) ++
      (0 to 3).map(i => ((5 + i).toLong, sv(i -> 1f), i)) :+
      ((9L, sv(4 -> 1f), 99)) :+
      ((10L, sv(3 -> 1f, 40 -> 1f), 3)))
      .toDF("vec_id", "embedding", "label")
    val dir = tempSfDir("embeddings" -> emb)
    val out = q("llm_retrieval_eval", dir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("qlabel"),
        r.getAs[Long]("n_relevant"),
        Option(r.getAs[Integer]("first_rank")).map(_.toInt),
        r.getAs[Int]("hits_at_10"))).toSeq
    assert(out == Seq(
      (0L, 0, 1L, Some(1), 1), (1L, 1, 1L, Some(1), 1),
      (2L, 2, 1L, Some(1), 1),
      (3L, 3, 2L, Some(1), 2),          // v8 at rank 1, v10 in top-10
      (4L, 4, 0L, None, 0)))            // relevant set empty → NULL rank
  }

  test("llm_knn_graph: matches a brute-force reference; cross-bucket isolated") {
    // five vectors share bucket 255 (dims 0..7 all zero → every sign
    // bit set); the sixth has dim0 < 0 → bucket 254, no co-bucket
    // partner, so it must appear in NO edge.
    val emb = Seq(
      (0L, sv(8 -> 1f), 0),
      (1L, sv(8 -> 1f, 9 -> 0.1f), 0),
      (2L, sv(8 -> 1f, 9 -> 0.2f), 0),
      (3L, sv(9 -> 1f), 0),
      (4L, sv(8 -> 1f, 9 -> 0.15f), 0),
      (5L, sv(0 -> -1f, 8 -> 1f), 0))
      .toDF("vec_id", "embedding", "label")
    val dir = tempSfDir("embeddings" -> emb)
    val got = q("llm_knn_graph", dir).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"),
        r.getAs[Int]("mutual"))).toSet
    // reference: same bucket rule, same left-assoc double cosine, per
    // src top-3 by (cos desc, dst asc), then symmetrize
    val vecs = Seq(0L -> sv(8 -> 1f), 1L -> sv(8 -> 1f, 9 -> 0.1f),
      2L -> sv(8 -> 1f, 9 -> 0.2f), 3L -> sv(9 -> 1f),
      4L -> sv(8 -> 1f, 9 -> 0.15f)).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- 0 until 64) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val directed = vecs.keys.flatMap { s =>
      vecs.keys.filter(_ != s).toSeq
        .sortBy(d => (-cos(vecs(s), vecs(d)), d)).take(3)
        .map(d => (s, d))
    }.toSet
    val want = directed.map { case (s, d) => (s min d, s max d) }
      .map { case (u, v) =>
        (u, v, if (directed((u, v)) && directed((v, u))) 1 else 0) }
    assert(got == want)
    assert(!got.exists(e => e._1 == 5L || e._2 == 5L))
    assert(got.exists(_._3 == 0), "fixture must exercise a one-way edge")
  }

  test("llm_graph_centrality: exact match to an integer-rank reference; hub wins") {
    // seven co-bucket vectors: a hub at e8 plus six leaves tilted off
    // it in distinct directions (every leaf's best neighbor is the
    // hub), and one bucket-isolated vector (dim0 < 0) that must carry
    // dangling mass, not vanish
    val vecs: Map[Long, Array[Float]] = Map(
      0L -> sv(8 -> 1f),
      1L -> sv(8 -> 1f, 9 -> 0.3f), 2L -> sv(8 -> 1f, 10 -> 0.35f),
      3L -> sv(8 -> 1f, 11 -> 0.4f), 4L -> sv(8 -> 1f, 12 -> 0.45f),
      5L -> sv(8 -> 1f, 13 -> 0.5f), 6L -> sv(8 -> 1f, 14 -> 0.55f),
      7L -> sv(0 -> -1f, 8 -> 1f))
    val emb = vecs.toSeq.sortBy(_._1)
      .map { case (i, v) => (i, v, 0) }.toDF("vec_id", "embedding", "label")
    val out = q("llm_graph_centrality", tempSfDir("embeddings" -> emb))
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("rank_scaled"))
    // reference: same bucketing, same top-3 edges, same truncating
    // integer mass arithmetic (Long ops mirror Spark div exactly)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- 0 until 64) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val inBucket = vecs.keySet - 7L
    val edges: Map[Long, Seq[Long]] = inBucket.map { s =>
      s -> inBucket.filter(_ != s).toSeq
        .sortBy(d => (-cos(vecs(s), vecs(d)), d)).take(3)
    }.toMap
    val mass = 1000000000L
    val v = vecs.size.toLong
    var rank: Map[Long, Long] = vecs.keys.map(_ -> mass / v).toMap
    for (_ <- 1 to 3) {
      val contrib = collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      edges.foreach { case (s, ds) =>
        ds.foreach(d => contrib(d) += rank(s) / ds.length)
      }
      val dmass = vecs.keys.filterNot(edges.contains).map(rank).sum
      rank = vecs.keys.map(n => n ->
        ((mass * 15) / (v * 100) + (85 * contrib(n)) / 100 +
          (85 * (dmass / v)) / 100)).toMap
    }
    out.foreach { case (id, r) => assert(r == rank(id), s"vec $id") }
    // hub 0 is everyone's best neighbor → strictly top-ranked
    val byRank = out.sortBy(-_._2)
    assert(byRank.head._1 == 0L, s"hub must win: ${byRank.toSeq}")
    // order in the output is (rank desc, vec_id) — dense and total
    assert(out.length == 8)
  }

  test("llm_mutual_knn_cc: mutual groups split, isolated is a singleton") {
    // two tight 4-vector groups (orthogonal directions) — with k=3
    // every vector's top-3 stays inside its own group, so mutual edges
    // never cross; plus a bucket-isolated vector → singleton
    val emb = (Seq(
      (0L, sv(8 -> 1f)), (1L, sv(8 -> 1f, 20 -> 0.1f)),
      (2L, sv(8 -> 1f, 21 -> 0.1f)), (3L, sv(8 -> 1f, 22 -> 0.1f)),
      (4L, sv(9 -> 1f)), (5L, sv(9 -> 1f, 30 -> 0.1f)),
      (6L, sv(9 -> 1f, 31 -> 0.1f)), (7L, sv(9 -> 1f, 32 -> 0.1f)),
      (8L, sv(0 -> -1f, 8 -> 1f))))
      .map { case (i, v) => (i, v, 0) }.toDF("vec_id", "embedding", "label")
    val out = q("llm_mutual_knn_cc", tempSfDir("embeddings" -> emb))
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("component_id"), r.getAs[Long]("csize"))).toMap
    assert(out.size == 9, "every vector must be labeled")
    (0L to 3L).foreach(i => assert(out(i) == ((0L, 4L)), s"A member $i"))
    (4L to 7L).foreach(i => assert(out(i) == ((4L, 4L)), s"B member $i"))
    assert(out(8L) == ((8L, 1L)), "isolated vector must be a singleton")
  }

  test("llm_cluster_silhouette: tight groups score near 1, ambiguous near 0") {
    // two tight groups around e10 and e11 (ids 0/1 seed the k=2 init),
    // plus one point at 45 degrees between them
    val emb = Seq(
      (0L, sv(10 -> 1f), 0), (2L, sv(10 -> 1f, 11 -> 0.05f), 0),
      (3L, sv(10 -> 1f, 11 -> -0.05f), 0),
      (1L, sv(11 -> 1f), 0), (4L, sv(10 -> 0.05f, 11 -> 1f), 0),
      (5L, sv(10 -> -0.05f, 11 -> 1f), 0),
      (6L, sv(10 -> 1f, 11 -> 1f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = graft.api.GraftPipelines
      .clusterSilhouette(emb, k = 2, iters = 1, dim = 64).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Int]("cluster"), r.getAs[Double]("cos1"),
          r.getAs[Double]("cos2"), r.getAs[Double]("sil"))).toMap
    assert(out.size == 7)
    out.values.foreach { case (_, cos1, cos2, sil) =>
      assert(cos1 >= cos2, "own centroid must be the best centroid")
      assert(sil >= 0.0 && sil <= 1.0 + 1e-12,
        "centroid silhouette is a margin in [0,1]")
    }
    assert(Seq(0L, 2L, 3L).map(out(_)._1).distinct.size == 1)
    assert(Seq(1L, 4L, 5L).map(out(_)._1).distinct.size == 1)
    assert(out(0L)._1 != out(1L)._1)
    Seq(0L, 1L, 2L, 3L, 4L, 5L).foreach(id =>
      assert(out(id)._4 > 0.85, s"tight point $id: ${out(id)}"))
    // the 45° point scores clearly below every tight point (the Lloyd
    // update pulls its own centroid toward it, so it is not near 0 —
    // the margin vs the tight group is the discriminating signal)
    val tightMin = Seq(0L, 1L, 2L, 3L, 4L, 5L).map(out(_)._4).min
    assert(out(6L)._4 < tightMin - 0.25, s"ambiguous point: ${out(6L)}")
  }

  test("llm_lsh_occupancy: histogram masses account for every vector " +
      "and every candidate pair") {
    val n = Tables.embeddings(spark, sf).count()
    val rows = q("llm_lsh_occupancy").collect()
    val vecs = rows.map(r => r.getAs[Long]("occ") * r.getAs[Long]("n_buckets")).sum
    assert(vecs == n, "occ·n_buckets must sum to the corpus size")
    rows.foreach { r =>
      assert(r.getAs[Long]("cand_pairs") ==
        r.getAs[Long]("occ") * r.getAs[Long]("occ") * r.getAs[Long]("n_buckets"))
    }
  }

  test("llm_cluster_quota: caps every cluster at the quota with " +
      "contiguous salted ranks, deterministically") {
    def run() = q("llm_cluster_quota").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cluster"),
        r.getAs[Int]("pick_rank"))).toSeq
    val a = run()
    a.groupBy(_._2).values.foreach { rows =>
      assert(rows.length <= 16, "quota cap")
      assert(rows.map(_._3).sorted == (1 to rows.length),
        "pick ranks are contiguous from 1")
    }
    assert(a.map(_._1).distinct.size == a.size, "each vector picked once")
    assert(a == run(), "salted pick is deterministic across runs")
  }

  test("llm_knn_incremental: touched-bucket recompute + untouched " +
      "persisted edges equals the full rebuild, and both paths do work") {
    val full = q("llm_knn_graph").collect().toSeq
    val inc = q("llm_knn_incremental").collect().toSeq
    assert(inc == full, "incremental union must equal the full rebuild")
    // the fixture genuinely exercises both paths: a non-empty delta
    // that leaves some buckets untouched
    val emb = Tables.embeddings(spark, sf).withColumn("bucket",
      graft.api.GraftPipelines.signLshBucket(col("embedding"), 8, 0))
    val touched = emb.filter(col("vec_id") % 17 === 0)
      .select("bucket").distinct().count()
    val all = emb.select("bucket").distinct().count()
    assert(touched > 0 && touched < all,
      s"delta must touch some but not all buckets ($touched of $all)")
  }

  test("labelPropagate: seeds pinned, plurality spreads hop by hop, " +
      "ties break toward the smaller label, isolated stays unlabeled") {
    // path 1-2-3 seeded at both ends (tie at 2 → smaller label);
    // 4-5 one-hop spread; 6 isolated; 7-8-9 two-hop spread (9 labels
    // in round 2, not round 1 — the sticky carry-forward in between).
    val edges =
      Seq((1L, 2L), (2L, 3L), (4L, 5L), (7L, 8L), (8L, 9L)).toDF("u", "v")
    val seeds = Seq(
      (1L, 10, 1), (2L, -1, 0), (3L, 20, 1), (4L, 7, 1), (5L, -1, 0),
      (6L, -1, 0), (7L, 9, 1), (8L, -1, 0), (9L, -1, 0))
      .toDF("node", "lab", "seed")
    val round1 = graft.api.GraftPipelines.labelPropagate(edges, seeds, 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(round1(9L) == -1, "two hops cannot arrive in one round")
    assert(round1(8L) == 9 && round1(5L) == 7)
    val out = graft.api.GraftPipelines.labelPropagate(edges, seeds, 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 10, 2L -> 10, 3L -> 20, 4L -> 7, 5L -> 7,
      6L -> -1, 7L -> 9, 8L -> 9, 9L -> 9))
  }

  test("weighted integerPagerank: contributions flow by weight, and " +
      "the weighted corpus entry genuinely differs from weight-1") {
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    // 1 → 2 carries 9× the weight of 1 → 3: rank(2) must beat rank(3)
    val edges = Seq((1L, 2L, 9L), (1L, 3L, 1L)).toDF("src", "dst", "n")
    val r = graft.api.GraftPipelines
      .integerPagerank(edges, nodes, 3, 1000000000L)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(2L) > r(3L), s"strong edge must attract more mass: $r")
    def ranks(name: String) = q(name).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(ranks("llm_graph_centrality_weighted") !=
      ranks("llm_graph_centrality"),
      "cosine weights must change the stationary distribution")
  }

  test("kcorePeel: a path peels from the ends inward, a triangle is " +
      "the surviving 2-core, isolated nodes drop immediately") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (6L, 7L), (6L, 8L), (7L, 8L)).toDF("u", "v")
    val nodes = (1L to 9L).toDF("node")
    def run(rounds: Int) = graft.api.GraftPipelines
      .kcorePeel(edges, nodes, 2, rounds).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    val r1 = run(1) // one round: only the path ENDPOINTS (+isolated) drop
    assert(r1.filter(_._2._1 == 1).keySet == Set(2L, 3L, 4L, 6L, 7L, 8L))
    val r4 = run(4) // fixpoint here: the whole path has peeled
    assert(r4.filter(_._2._1 == 1).keySet == Set(6L, 7L, 8L))
    Seq(6L, 7L, 8L).foreach(n => assert(r4(n) == ((1, 2L))))
    Seq(1L, 2L, 3L, 4L, 5L, 9L).foreach(n => assert(r4(n) == ((0, 0L))))
  }

  test("llm_label_prop_eval: per-class accounting is consistent with " +
      "the propagation output") {
    val prop = q("llm_label_prop").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val gold = Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val nonSeed = prop.filter(_._3 == 0)
    val rows = q("llm_label_prop_eval").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows.values.map(_._1).sum == nonSeed.length)
    rows.foreach { case (_, (n, l, c)) => assert(c <= l && l <= n) }
    // re-derive per-class correct counts from the propagation itself
    val want = nonSeed.groupBy(t => gold(t._1)).map { case (g, ts) =>
      g -> ts.count(t => t._2 == g).toLong
    }
    assert(rows.map { case (g, (_, _, c)) => g -> c } == want)
  }

  test("triangleStats: each triangle counted once per member; exact " +
      "fixed-point clustering coefficient; absent nodes report zeros") {
    // K3 {1,2,3} + pendant 4 on node 3 + isolated node 5
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("node")
    val out = graft.api.GraftPipelines.triangleStats(edges, nodes)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == ((2L, 1L, 1000000L)))
    assert(out(2L) == ((2L, 1L, 1000000L)))
    assert(out(3L) == ((3L, 1L, 333333L))) // 2*1e6/6 truncates
    assert(out(4L) == ((1L, 0L, 0L)))
    assert(out(5L) == ((0L, 0L, 0L)))
  }

  test("llm_knn_graph_wide / llm_knn_incremental_wide: 12-bit " +
      "incremental equals the 12-bit rebuild, and widening genuinely " +
      "refines the bucketing") {
    val wide = q("llm_knn_graph_wide").collect().toSeq
    assert(q("llm_knn_incremental_wide").collect().toSeq == wide,
      "widened incremental union must equal the widened full rebuild")
    // widening must actually split buckets on the real corpus — a
    // 12-bit graph identical to the 8-bit one would mean the extra
    // hyperplanes are dead and the twin proves nothing
    assert(wide != q("llm_knn_graph").collect().toSeq,
      "12-bit graph must differ from the 8-bit graph on this corpus")
    // and the wide delta still leaves buckets untouched
    val emb = Tables.embeddings(spark, sf).withColumn("bucket",
      graft.api.GraftPipelines.signLshBucket(col("embedding"), 12, 0))
    val touched = emb.filter(col("vec_id") % 17 === 0)
      .select("bucket").distinct().count()
    val all = emb.select("bucket").distinct().count()
    assert(touched > 0 && touched < all,
      s"delta must touch some but not all wide buckets ($touched of $all)")
  }

  test("widened-scheme recompute fraction: at a corpus that saturates " +
      "8-bit buckets, the 12-bit touched fraction stays under the " +
      "documented 28% bound while 8-bit degenerates to ~all") {
    // The machine-checked form of BASELINE.md's DevGraph claim ("the
    // cost ratio at 100 TB"): recompute fraction = vectors living in
    // delta-touched buckets / all vectors (exactly DevGraph's
    // recompute_vecs / n), delta = vec_id % 17 = 0. Fixed-seed corpus
    // sized so the 8-bit scheme saturates (n >> 2^8 · 17): ~1176 delta
    // vectors land in essentially every one of 256 buckets, while 4096
    // wide buckets keep the expected touched fraction near
    // 1 - (1 - 1/4096)^1176 ≈ 0.25 (measured 0.296 on this fixture —
    // the BASELINE.md round-10 row; the real sf1 corpus reads 0.28).
    val r = new scala.util.Random(1234)
    val n = 20000
    val emb = spark.createDataFrame(
      (0 until n).map(i => (i.toLong, Array.fill(64)(r.nextFloat() - 0.5f))))
      .toDF("vec_id", "embedding")
    def recomputeFraction(bits: Int): Double = {
      val b = emb.withColumn("bucket",
        graft.api.GraftPipelines.signLshBucket(col("embedding"), bits, 0))
        .localCheckpoint()
      val touched = b.filter(col("vec_id") % 17 === 0)
        .select("bucket").distinct()
      b.join(touched, Seq("bucket"), "left_semi").count().toDouble / n
    }
    val narrow = recomputeFraction(8)
    val wide = recomputeFraction(12)
    assert(narrow >= 0.9,
      f"fixture must saturate the 8-bit scheme (got $narrow%.3f)")
    assert(wide <= 0.30,
      f"12-bit recompute fraction must hold the documented bound " +
        f"(got $wide%.3f)")
    assert(wide * 3 < narrow,
      f"widening must buy at least a 3x recompute reduction " +
        f"($wide%.3f vs $narrow%.3f)")
  }

  test("llm_knn_incremental_served: the persisted-base-edge serve path " +
      "equals the full rebuild, twice (read-back determinism)") {
    val full = q("llm_knn_graph").collect().toSeq
    assert(q("llm_knn_incremental_served").collect().toSeq == full)
    assert(q("llm_knn_incremental_served").collect().toSeq == full)
  }

  test("llm_lsh_occupancy_wide: histogram masses account for every " +
      "vector, and widening strictly reduces candidate mass") {
    def stats(name: String): (Long, Long) = {
      val rows = q(name).collect().map(r => (r.getAs[Long]("occ"),
        r.getAs[Long]("n_buckets"), r.getAs[Long]("cand_pairs")))
      (rows.map(x => x._1 * x._2).sum, rows.map(_._3).sum)
    }
    val n = Tables.embeddings(spark, sf).count()
    val (nNarrow, massNarrow) = stats("llm_lsh_occupancy")
    val (nWide, massWide) = stats("llm_lsh_occupancy_wide")
    assert(nNarrow == n && nWide == n, "every vector lands in a bucket")
    assert(massWide < massNarrow,
      s"12-bit candidate mass must undercut 8-bit ($massWide vs $massNarrow)")
  }

  test("llm_semdedup_gated: the relative gate splits clusters, failing " +
      "clusters keep everything, and drops are exactly the smaller-id-" +
      "partner rule over llm_semdedup's pairs in passing clusters") {
    val rows = q("llm_semdedup_gated").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cluster"),
        r.getAs[Long]("mean_sil_scaled"), r.getAs[Int]("gate_pass"),
        r.getAs[Int]("keep"))).toSeq
    assert(rows.exists(_._4 == 1) && rows.exists(_._4 == 0),
      "a mean-relative gate must pass some clusters and fail others")
    // one verdict (mean, pass) per cluster
    rows.groupBy(_._2).values.foreach { rs =>
      assert(rs.map(x => (x._3, x._4)).distinct.size == 1)
    }
    assert(rows.filter(_._4 == 0).forall(_._5 == 1),
      "where the clustering is loose, nothing may be dropped")
    // the gated keep-list composes the already-verified pieces exactly:
    // same fit => the dropped set is llm_semdedup's d2 side restricted
    // to passing clusters
    val passing = rows.filter(_._4 == 1).map(_._2).toSet
    val wantDrop = q("llm_semdedup").collect()
      .map(r => (r.getAs[Long]("d2"), r.getAs[Int]("cluster")))
      .filter(p => passing.contains(p._2)).map(_._1).toSet
    assert(rows.filter(_._5 == 0).map(_._1).toSet == wantDrop)
    assert(wantDrop.nonEmpty, "the fixture must exercise actual drops")
  }

  test("llm_mutual_knn_served: read-back components equal the refit " +
      "entry's, deterministically across calls") {
    val direct = q("llm_mutual_knn_cc").collect().toSeq
    val served = q("llm_mutual_knn_served").collect().toSeq
    assert(served == direct,
      "the serve split is a storage refactor — output must be identical")
    // second call reads the already-published fixture (buildOnce), and
    // the shared artifact also feeds label-prop/k-core/triangles — all
    // must agree on the same edge set
    assert(q("llm_mutual_knn_served").collect().toSeq == direct)
  }

  test("k-means fit serve split: every served consumer equals its refit " +
      "twin, deterministically across calls") {
    for (name <- Seq("llm_embed_kmeans", "llm_cluster_quota",
        "llm_cluster_silhouette", "llm_semdedup", "llm_semdedup_gated",
        "llm_semdedup_scaled")) {
      val direct = q(name).collect().toSeq
      val served = q(name + "_served").collect().toSeq
      assert(served == direct,
        s"$name: the serve split is a storage refactor — output must " +
          "be identical")
      // second call reads the already-published fit fixture (buildOnce)
      assert(q(name + "_served").collect().toSeq == direct, name)
    }
  }

  test("llm_graph_khop: hop counts are exact BFS distances <= 2 over " +
      "the mutual graph, with complete 1-hop frontiers") {
    import org.apache.spark.sql.functions.col
    val rows = q("llm_graph_khop").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty && rows.forall(t => t._3 >= 0 && t._3 <= 2))
    // reconstruct the adjacency from the knn-graph entry's mutual flag
    val adj = SparkEntry.queries("llm_knn_graph")(spark, sf)
      .filter(col("mutual") === 1).select(col("u"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seeds = rows.filter(_._3 == 0).map(_._1).toSet
    assert(seeds.nonEmpty && seeds.forall(_ % 20 == 0))
    seeds.foreach { s =>
      val h1 = adj.getOrElse(s, Set.empty[Long])
      val got1 = rows.filter(t => t._1 == s && t._3 == 1).map(_._2).toSet
      // every direct neighbor appears at hop 1 exactly (never 2)
      assert(got1 == h1, s"seed $s: 1-hop frontier mismatch")
      val h2 = h1.flatMap(n => adj.getOrElse(n, Set.empty[Long])) -- h1 - s
      val got2 = rows.filter(t => t._1 == s && t._3 == 2).map(_._2).toSet
      assert(got2 == h2, s"seed $s: 2-hop frontier mismatch")
    }
    assert(rows.exists(_._3 == 2),
      "fixture degenerate: no 2-hop expansion happened")
  }
}
