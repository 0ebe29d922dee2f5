package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe for the round-14 optimization pass: time isolated
  * sub-stages of the expensive queries (noop-sink discipline, guide
  * §1.4) so changes chase measured cost, not guessed cost.
  */
object DevOpt {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "target/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(name: String)(df: => DataFrame): Unit = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[devopt] $name%-40s $t%8.3f s")
      spark.catalog.clearCache()
      spark.sparkContext.setJobDescription(null)
    }

    val which = if (args.nonEmpty) args.toSet else Set("video")

    if (which("video")) {
      val F = 64
      def frames = Tables.documents(spark, sfDir)
        .withColumn("n_frames",
          expr(s"cast(ceil(length(text) / $F.0) as int)"))
        .select($"doc_id", posexplode(expr(
          s"transform(sequence(0, n_frames - 1), " +
            s"i -> substring(text, i*$F + 1, $F))"))
          .as(Seq("pos", "frame")))
        .filter($"pos" % 2 === 0 && length($"frame") === F)
      def fpRaw = frames
        .withColumn("tot", expr(s"aggregate(transform(sequence(1, $F), " +
          "i -> ascii(substring(frame, i, 1))), 0, (a, x) -> a + x)"))
        .withColumn("fp", expr(
          "aggregate(transform(sequence(0, 15), b -> CASE WHEN 16 * (" +
            "ascii(substring(frame, 4*b + 1, 1)) + " +
            "ascii(substring(frame, 4*b + 2, 1)) + " +
            "ascii(substring(frame, 4*b + 3, 1)) + " +
            "ascii(substring(frame, 4*b + 4, 1))) > tot " +
            "THEN shiftleft(1, b) ELSE 0 END), 0, (a, x) -> a + x)"))
        .select($"doc_id", $"fp")
      // split('') variant: one pass to char codes, then array indexing
      def fpFast = frames
        .withColumn("cs", expr("transform(split(frame, ''), c -> ascii(c))"))
        .withColumn("blk", expr(
          "transform(sequence(0, 15), b -> cs[4*b] + cs[4*b+1] + cs[4*b+2] + cs[4*b+3])"))
        .withColumn("tot", expr("aggregate(blk, 0, (a, x) -> a + x)"))
        .withColumn("fp", expr(
          "aggregate(transform(sequence(0, 15), b -> CASE WHEN 16 * blk[b] > tot " +
            "THEN shiftleft(1, b) ELSE 0 END), 0, (a, x) -> a + x)"))
        .select($"doc_id", $"fp")
      time("video: frames explode only")(frames)
      time("video: fp raw (current)")(fpRaw)
      time("video: fp fast (split-once)")(fpFast)
      time("video: fp raw distinct")(fpRaw.distinct())
      val fpCk = fpRaw.distinct().localCheckpoint()
      time("video: join+agg from checkpoint") {
        val sizes = fpCk.groupBy($"doc_id").agg(count(lit(1)).as("n"))
        fpCk.as("a").join(fpCk.as("b"),
            col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
          .agg(count(lit(1)).as("n_common"))
          .filter($"n_common" >= 2)
          .join(sizes.select($"doc_id".as("a_id"), $"n".as("n_a")), "a_id")
          .join(sizes.select($"doc_id".as("b_id"), $"n".as("n_b")), "b_id")
          .withColumn("overlap_x1000",
            expr("(1000 * n_common) div least(n_a, n_b)"))
          .orderBy($"a_id", $"b_id")
      }
      time("video: full current")(
        SparkEntry.queries("mm_video_neardup")(spark, sfDir))
      time("video: full current again")(
        SparkEntry.queries("mm_video_neardup")(spark, sfDir))
    }

    if (which("contain")) {
      val docs = Tables.documents(spark, sfDir)
      time("contain: token sets (map-only)")(
        graft.api.GraftPipelines.ppjoinTokenSets(docs, 3))
      time("contain: tokens exploded")(
        graft.api.GraftPipelines.ppjoinTokens(docs, 3))
      val setsCk = graft.api.GraftPipelines.ppjoinTokenSets(docs, 3)
        .localCheckpoint()
      time("contain: explode from setsCk")(
        graft.api.GraftPipelines.ppjoinTokensOf(setsCk))
      val toksCk = graft.api.GraftPipelines.ppjoinTokensOf(setsCk)
        .localCheckpoint()
      time("contain: dfreq only")(
        toksCk.groupBy(col("s")).agg(count(lit(1)).as("df")))
      val dfreqCk = toksCk.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .localCheckpoint()
      time("contain: join only")(toksCk.join(dfreqCk, "s"))
      val joinedCk = toksCk.join(dfreqCk, "s").localCheckpoint()
      time("contain: window only") {
        import org.apache.spark.sql.expressions.Window
        joinedCk.withColumn("rn", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))))
          .select(col("doc_id"), col("s"), col("rn"), col("sz"))
      }
      time("contain: ranked from ck")(
        graft.api.GraftPipelines.ppjoinRanked(toksCk))
      val rankedCk = graft.api.GraftPipelines.ppjoinRanked(toksCk)
        .localCheckpoint()
      time("contain: candidates")(
        graft.api.GraftPipelines.containmentCandidates(
          rankedCk.filter(expr("rn <= sz - (4 * sz + 5 - 1) div 5 + 1")),
          rankedCk, 4, 5))
      time("contain: full pairs from index")(
        graft.api.GraftPipelines.containmentPairsFromIndex(
          setsCk, rankedCk, 4, 5))
      time("contain: full current")(
        SparkEntry.queries("llm_containment_join")(spark, sfDir))
      time("contain: ppjoin full current")(
        SparkEntry.queries("llm_ppjoin")(spark, sfDir))
    }

    if (which("minhash")) {
      val docs = Tables.documents(spark, sfDir)
      def shingleVariant(outer: Boolean) = {
        val n = 3
        val gram = (0 until n).map(j => s"w[i+$j]")
          .mkString("concat_ws(' ', ", ", ", ")")
        val ex = expr(s"transform(sequence(0, size(w)-$n), i -> $gram)")
        val base = docs.select($"doc_id", split($"text", " ").as("w"))
          .filter(size($"w") >= n)
        if (outer) base.select($"doc_id", explode_outer(ex).as("s"))
        else base.select($"doc_id", explode(ex).as("s"))
      }
      def sigOf(sh: org.apache.spark.sql.DataFrame) = {
        val hashed = sh.select($"doc_id",
          graft.functions.VectorExpressions.md5Km($"s", 8).as("hs"))
        val aggs = (0 until 8).map(i => min($"hs"(i)).as(s"h$i"))
        hashed.groupBy($"doc_id").agg(aggs.head, aggs.tail: _*)
      }
      for (i <- 1 to 2) {
        time(s"minhash: sig inner explode #$i")(sigOf(shingleVariant(false)))
        time(s"minhash: sig outer explode #$i")(sigOf(shingleVariant(true)))
      }
    }

    if (which("gen")) {
      val docs = Tables.documents(spark, sfDir)
      // word explode -> hash agg (the tfidf/bpe shape)
      def wordAgg(outer: Boolean) = {
        val ex = split($"text", " ")
        val w = if (outer) explode_outer(ex) else explode(ex)
        docs.select(w.as("word")).groupBy($"word")
          .agg(count(lit(1)).as("n"))
      }
      // gram explode -> md5 (the substringOverlap shape)
      def gramHash(outer: Boolean) = {
        val n = 10
        val base = docs.select($"doc_id", split($"text", " ").as("w"))
          .filter(size($"w") >= n)
        val ex = expr(s"transform(sequence(0, size(w)-$n), i -> concat_ws(' ', slice(w, i+1, $n)))")
        val g = if (outer) posexplode_outer(ex) else posexplode(ex)
        base.select($"doc_id", g)
          .select($"doc_id", $"pos".as("idx"),
            graft.functions.VectorExpressions.md5Half60($"col", upperHalf = false).as("h"))
      }
      for (i <- 1 to 3) {
        time(s"gen: words inner #$i")(wordAgg(false))
        time(s"gen: words outer #$i")(wordAgg(true))
        time(s"gen: grams inner #$i")(gramHash(false))
        time(s"gen: grams outer #$i")(gramHash(true))
      }
    }

    if (which("ppjoin_sf1")) {
      def variant(hint: Boolean) = {
        val P = graft.api.GraftPipelines
        val docs = Tables.documents(spark, sfDir)
        val sets0 = P.ppjoinTokenSets(docs).localCheckpoint()
        val sets = if (hint) sets0.hint("shuffle_hash") else sets0
        val pref = P.ppjoinPrefix(P.ppjoinTokensOf(sets0), 1, 2)
          .localCheckpoint()
        P.ppjoinPairsFromIndex(sets, pref, 1, 2)
          .orderBy($"a_id", $"b_id")
      }
      for (i <- 1 to 2) {
        time(s"ppjoin verify bcast #$i")(variant(false))
        time(s"ppjoin verify shuffle_hash #$i")(variant(true))
      }
    }

    if (which("basket")) {
      val li = Tables.lineitem(spark, sfDir)
      def current = {
        val items = li.select($"l_orderkey".as("okey"), $"l_partkey".as("pkey")).distinct()
        items.select($"okey", $"pkey".as("part_a"))
          .join(items.select($"okey".as("okey_b"), $"pkey".as("part_b")),
            $"okey" === $"okey_b" && $"part_a" < $"part_b")
          .groupBy($"part_a", $"part_b").agg(count(lit(1)).as("support"))
          .filter($"support" >= 2)
          .orderBy($"support".desc, $"part_a", $"part_b").limit(20)
      }
      def setBased = {
        val baskets = li.groupBy($"l_orderkey")
          .agg(sort_array(collect_set($"l_partkey")).as("parts"))
          .filter(size($"parts") >= 2)
        baskets.select(explode_outer(expr(
            "flatten(transform(parts, (x, i) -> " +
              "transform(slice(parts, i + 2, size(parts) - i - 1), " +
              "y -> struct(x AS part_a, y AS part_b))))")).as("p"))
          .groupBy($"p.part_a".as("part_a"), $"p.part_b".as("part_b"))
          .agg(count(lit(1)).as("support"))
          .filter($"support" >= 2)
          .orderBy($"support".desc, $"part_a", $"part_b").limit(20)
      }
      for (i <- 1 to 2) {
        time(s"basket: current #$i")(current)
        time(s"basket: set-based #$i")(setBased)
      }
      val a = current.collect().toSeq
      val b = setBased.collect().toSeq
      println(s"[devopt] basket equal rows: ${a == b} (${a.size}/${b.size})")
    }

    if (which("kmeans")) {
      val emb = Tables.embeddings(spark, sfDir)
      val init = emb.filter($"vec_id" < 8)
        .select($"vec_id".cast("int").as("cluster"), $"embedding".as("c"))
      time("kmeans: emb scan")(emb)
      time("kmeans: fit assign only")(
        graft.api.GraftPipelines.assignToCentroids(emb, init))
      val a1 = graft.api.GraftPipelines.assignToCentroids(emb, init)
        .localCheckpoint()
      def updateVariant(kind: String) = {
        val scale = 268435456.0
        val sums = (1 to 64).map(d =>
          sum(floor(element_at($"embedding", d).cast("double") * lit(scale))
            .cast(kind)).as(s"s$d"))
        val g = a1.groupBy($"cluster")
          .agg(sums.head, sums.tail :+ count(lit(1)).as("n"): _*)
        g.select($"cluster", array((1 to 64).map(d =>
          ($"s$d".cast("double") / $"n" / lit(scale)).cast("float")): _*)
          .as("c"))
      }
      for (i <- 1 to 2) {
        time(s"kmeans: update LONG sums #$i")(updateVariant("long"))
        time(s"kmeans: update decimal sums #$i")(updateVariant("decimal(28,0)"))
      }
      time("kmeans: full fit (k=8,it=2)")(
        graft.api.GraftPipelines.kmeans(emb, 8, 2, 64))
      time("kmeans: full fit again")(
        graft.api.GraftPipelines.kmeans(emb, 8, 2, 64))
      time("kmeans: entry llm_embed_kmeans")(
        SparkEntry.queries("llm_embed_kmeans")(spark, sfDir))
    }

    spark.stop()
  }
}
