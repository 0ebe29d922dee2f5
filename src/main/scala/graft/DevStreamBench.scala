package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreaming

/** Measurement probe (not part of the driver contract): per-trigger
  * steady-state cost of the heavy streaming maintenance loops —
  * extendLoop, takedownLoop, knnMaintenanceLoop, ingestDedupLoop,
  * upsertLoop — at an sf1-scale store with batches at 1:100 and
  * 1:1000 of store size.
  * At 100 TB the steady-state trigger time and the compaction
  * amortization ARE the operator: a loop whose trigger cost tracked
  * STORE size instead of batch size would re-run the batch rebuild
  * per trigger and be pointless. The recorded figures (one JSON line,
  * default bench_streaming.json) are the evidence the per-trigger
  * work is batch-proportional; the rebuild figure for the same store
  * is recorded alongside as the reference each trigger must beat.
  *
  * Methodology: each loop bootstraps its store by streaming ~90% of
  * the corpus through its own code path (trigger 0, reported as
  * seed_sec), then runs `reps` timed triggers at each ratio. Timing is
  * wall time around addData + processAllAvailable — it includes the
  * micro-batch machinery on purpose (that is the production trigger
  * cost), so the numbers are conservative.
  *
  * Store-size scaling evidence (the round-13 `weak`): set
  * `SPARK_GRAFT_STREAMBENCH_B100` / `_B1000` to ABSOLUTE batch sizes
  * and run the probe against two corpora (e.g. target/sf1 and the
  * DevScale target/sf10) — same batch, 10x store. With the bucketed
  * store logs the trigger cost must stay ~flat across the two
  * artifacts; the pre-round-14 flat logs' full-store
  * distinct/dropDuplicates made it track store size instead.
  */
object DevStreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
    val out = sys.env.getOrElse("SPARK_GRAFT_STREAMBENCH_OUT",
      "bench_streaming.json")
    val reps = sys.env.getOrElse("SPARK_GRAFT_STREAMBENCH_REPS", "4").toInt
    // subset (comma-sep: extend,takedown,knn,ingest) and the knn bucket
    // width — lshBits must scale with store size (llm_lsh_occupancy is
    // the widen signal): at 8 bits a 1:100 batch touches nearly every
    // bucket and the "touched-bucket" recompute degenerates to a full
    // rebuild per trigger
    val loops = sys.env.get("SPARK_GRAFT_STREAMBENCH_LOOPS")
      .map(_.split(",").map(_.trim).toSet)
    def want(n: String) = loops.forall(_.contains(n))
    val knnBits = sys.env.getOrElse("SPARK_GRAFT_STREAMBENCH_KNN_BITS",
      "8").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "target/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def tmp(name: String): String = java.nio.file.Files
      .createTempDirectory(s"graft_sbench_$name").toString + "/state"
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val results = scala.collection.mutable.LinkedHashMap[String, String]()

    // ---- corpus slices ---------------------------------------------
    val docsAll = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id".cast("long").as("doc_id"), $"text")
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val nDocs = docsAll.length
    val embAll = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id".cast("long").as("vec_id"), $"embedding")
      .orderBy($"vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val nEmb = embAll.length
    println(s"[sbench] corpus: $nDocs docs, $nEmb vectors from $sfDir")

    // slices: [0, seed) bootstraps; then reps batches of n/100, then
    // reps batches of n/1000, drawn past the seed so every trigger
    // ingests genuinely new content. The _B100/_B1000 overrides pin
    // ABSOLUTE batch sizes so two corpora (1x and 10x stores) can be
    // probed with identical batches — the store-size-flatness check.
    val b100Abs = sys.env.get("SPARK_GRAFT_STREAMBENCH_B100").map(_.toInt)
    val b1000Abs = sys.env.get("SPARK_GRAFT_STREAMBENCH_B1000").map(_.toInt)
    def slices[T](all: Array[T]): (Seq[T], Seq[Seq[T]], Seq[Seq[T]]) = {
      val n = all.length
      val b100 = b100Abs.getOrElse(n / 100)
      val b1000 = b1000Abs.getOrElse(math.max(1, n / 1000))
      val seedEnd = n - reps * b100 - reps * b1000
      val seed = all.slice(0, seedEnd).toSeq
      val big = (0 until reps).map(i =>
        all.slice(seedEnd + i * b100, seedEnd + (i + 1) * b100).toSeq)
      val small = (0 until reps).map(i =>
        all.slice(seedEnd + reps * b100 + i * b1000,
          seedEnd + reps * b100 + (i + 1) * b1000).toSeq)
      (seed, big, small)
    }
    def fmt(ts: Seq[Double]): String =
      "[" + ts.map(t => f"$t%.3f").mkString(",") + "]"

    // ---- rebuild reference: the full batch chain over all docs -----
    val needChain = want("extend") || want("takedown")
    val (chain, rebuildSec) = if (!needChain) ((null, null), 0.0) else timed {
      val pairs = graft.api.GraftPipelines.nearDuplicates(
        spark.read.parquet(s"$sfDir/documents.parquet"), 0.7)
        .select($"d1", $"d2").localCheckpoint()
      val labels = graft.api.GraftPipelines.dupClusters(pairs)
        .localCheckpoint()
      labels.count()
      (pairs, labels)
    }
    val (seedPairs, seedLabels) = chain
    if (needChain) {
      println(f"[sbench] chain rebuild over $nDocs docs: $rebuildSec%.3f s")
      results += "chain_rebuild_sec" -> f"$rebuildSec%.3f"
    }

    // ---- extendLoop -------------------------------------------------
    if (want("extend")) {
      val (seed, big, small) = slices(docsAll)
      val mem = MemoryStream[(Long, String)]
      val q = EventStreaming.extendLoop(
        mem.toDF().toDF("doc_id", "text"), tmp("extend"))()
      def trig(b: Seq[(Long, String)]): Double =
        timed { mem.addData(b: _*); q.processAllAvailable() }._2
      try {
        val seedSec = trig(seed)
        val t100 = big.map(trig)
        val t1000 = small.map(trig)
        println(f"[sbench] extendLoop seed=$seedSec%.3f " +
          s"b100=${fmt(t100)} b1000=${fmt(t1000)}")
        results += "extend_seed_sec" -> f"$seedSec%.3f"
        results += "extend_b100_sec" -> fmt(t100)
        results += "extend_b1000_sec" -> fmt(t1000)
      } finally q.stop()
    }

    // ---- takedownLoop -----------------------------------------------
    if (want("takedown")) {
      // delete slices: disjoint id stripes at ~1% and ~0.1% of corpus
      val ids = docsAll.map(_._1)
      val (_, big, small) = slices(ids)
      val mem = MemoryStream[Long]
      val q = EventStreaming.takedownLoop(
        mem.toDF().toDF("del_id"), seedPairs, seedLabels, tmp("takedown"))()
      def trig(b: Seq[Long]): Double =
        timed { mem.addData(b: _*); q.processAllAvailable() }._2
      try {
        val t100 = big.map(trig)
        val t1000 = small.map(trig)
        println(s"[sbench] takedownLoop b100=${fmt(t100)} " +
          s"b1000=${fmt(t1000)}")
        results += "takedown_b100_sec" -> fmt(t100)
        results += "takedown_b1000_sec" -> fmt(t1000)
      } finally q.stop()
    }

    // ---- knnMaintenanceLoop ----------------------------------------
    if (want("knn")) {
      val (seed, big, small) = slices(embAll)
      val mem = MemoryStream[(Long, Seq[Float])]
      // maxBucketFraction = 1.0: this probe EXISTS to measure the
      // dense-delta degeneration the production default (0.5) refuses,
      // so the guard is deliberately disarmed here
      val q = EventStreaming.knnMaintenanceLoop(
        mem.toDF().toDF("vec_id", "embedding"), tmp("knn"),
        lshBits = knnBits, maxBucketFraction = 1.0)()
      def trig(b: Seq[(Long, Seq[Float])]): Double =
        timed { mem.addData(b: _*); q.processAllAvailable() }._2
      try {
        val seedSec = trig(seed)
        val t100 = big.map(trig)
        val t1000 = small.map(trig)
        println(f"[sbench] knnMaintenanceLoop seed=$seedSec%.3f " +
          s"b100=${fmt(t100)} b1000=${fmt(t1000)}")
        results += "knn_bits" -> knnBits.toString
        results += "knn_seed_sec" -> f"$seedSec%.3f"
        results += "knn_b100_sec" -> fmt(t100)
        results += "knn_b1000_sec" -> fmt(t1000)
      } finally q.stop()
    }

    // ---- ingestDedupLoop -------------------------------------------
    if (want("ingest")) {
      val (seed, big, small) = slices(docsAll)
      val mem = MemoryStream[(Long, String)]
      val q = EventStreaming.ingestDedupLoop(
        mem.toDF().toDF("doc_id", "text"),
        tmp("ingest") + "/idx") { (_, _) => () }
      def trig(b: Seq[(Long, String)]): Double =
        timed { mem.addData(b: _*); q.processAllAvailable() }._2
      try {
        val seedSec = trig(seed)
        val t100 = big.map(trig)
        val t1000 = small.map(trig)
        println(f"[sbench] ingestDedupLoop seed=$seedSec%.3f " +
          s"b100=${fmt(t100)} b1000=${fmt(t1000)}")
        results += "ingest_seed_sec" -> f"$seedSec%.3f"
        results += "ingest_b100_sec" -> fmt(t100)
        results += "ingest_b1000_sec" -> fmt(t1000)
      } finally q.stop()
    }

    // ---- upsertLoop -------------------------------------------------
    // Mixed add/del triggers: at each ratio the batch carries fresh
    // adds plus a 10%-of-adds del stripe drawn from the seeded ids
    // (ids never reused, never re-deleted — the loop's contract), and
    // a tombstone-HEAVY mix (dels = 10x adds) probes how the dels/ log
    // anti-join scales when deletion dominates: the tombstone log is
    // read by every band/doc fetch, so a right-to-be-forgotten burst
    // must not make subsequent triggers track tombstone-log size.
    if (want("upsert")) {
      val n = nDocs
      val b100 = b100Abs.getOrElse(n / 100)
      val b1000 = b1000Abs.getOrElse(math.max(1, n / 1000))
      val freshNeed = reps * (b100 + 2 * b1000)
      val seedEnd = n - freshNeed
      val d100 = math.max(1, b100 / 10)
      val d1000 = math.max(1, b1000 / 10)
      val dheavy = 10 * b1000
      require(reps * (d100 + d1000 + dheavy) < seedEnd,
        "del stripes must fit inside the seeded ids")
      val seed = docsAll.slice(0, seedEnd)
      var freshAt = seedEnd
      def fresh(k: Int): Seq[(Long, String)] = {
        val s = docsAll.slice(freshAt, freshAt + k).toSeq
        freshAt += k; s
      }
      var delAt = 0
      def dels(k: Int): Seq[Long] = {
        val s = seed.slice(delAt, delAt + k).map(_._1).toSeq
        delAt += k; s
      }
      val mem = MemoryStream[(String, Long, String)]
      val q = EventStreaming.upsertLoop(
        mem.toDF().toDF("op", "doc_id", "text"), tmp("upsert"))()
      def trig(adds: Seq[(Long, String)], delIds: Seq[Long]): Double =
        timed {
          mem.addData(adds.map { case (i, t) => ("add", i, t) } ++
            delIds.map(i => ("del", i, null: String)): _*)
          q.processAllAvailable()
        }._2
      try {
        val seedSec = trig(seed.toSeq, Seq.empty)
        val t100 = (0 until reps).map(_ => trig(fresh(b100), dels(d100)))
        val t1000 = (0 until reps).map(_ => trig(fresh(b1000), dels(d1000)))
        val theavy = (0 until reps).map(_ => trig(fresh(b1000), dels(dheavy)))
        println(f"[sbench] upsertLoop seed=$seedSec%.3f " +
          s"b100=${fmt(t100)} b1000=${fmt(t1000)} heavy=${fmt(theavy)}")
        results += "upsert_seed_sec" -> f"$seedSec%.3f"
        results += "upsert_b100_sec" -> fmt(t100)
        results += "upsert_b1000_sec" -> fmt(t1000)
        results += "upsert_heavy_adds" -> b1000.toString
        results += "upsert_heavy_dels" -> dheavy.toString
        results += "upsert_heavy_sec" -> fmt(theavy)
      } finally q.stop()
    }

    val json = "{" + (Seq(
      "\"sf\":\"" + sfDir + "\"",
      s""""n_docs":$nDocs""", s""""n_vectors":$nEmb""",
      s""""reps":$reps""") ++
      b100Abs.map(v => s""""b100_abs":$v""").toSeq ++
      b1000Abs.map(v => s""""b1000_abs":$v""").toSeq ++
      results.map { case (k, v) => s""""$k":$v""" }).mkString(",") + "}"
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    spark.stop()
  }
}
