package graft

import org.apache.spark.sql.SparkSession

/** Probe: file-layout scan-parallelism measurement (BASELINE.md round-2
  * caveat → measured figure, docs/PLANS.md "multi-file layout").
  *
  * The driver corpus ships every table as ONE parquet file with one row
  * group, so every scan stage starts single-threaded regardless of
  * cores. This tool rewrites the corpus as N files per table
  * (`GraftIO.writeParquet(numFiles = N)` — the layout a production
  * writer would produce) and times the scan-heaviest headline queries
  * against both layouts in one JVM, interleaved per pass so host drift
  * hits both sides equally.
  */
object DevLayout {

  /** Scan-dominated headline shapes (one big-table scan + agg, little
    * join/shuffle weight): the queries whose wall time a single-file
    * layout bottlenecks.
    */
  val scanHeavy: Seq[String] = Seq(
    "rel_q1_pricing", "rel_q6_forecast", "rel_q14_type_share",
    "rel_profile", "ev_uint64_decode", "ev_decode_all", "ev_catalog",
    "llm_doc_features", "llm_quality_score", "mm_payload_dedup")

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val writeOnly = args.contains("--write-only")
    val n = args.filterNot(_.startsWith("--"))
      .headOption.map(_.toInt).getOrElse(32)
    val dst = s"/root/repo/target/layout_x$n"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    if (!new java.io.File(dst).exists()) {
      tables.foreach { t =>
        graft.sources.GraftIO.writeParquet(
          spark.read.parquet(s"$src/$t.parquet"), s"$dst/$t.parquet",
          numFiles = n)
      }
      println(s"[layout] corpus rewritten as $n files/table at $dst")
    }
    // corpus-build mode for the bench_multifile.json recording: the
    // timing probe below is DevLayout's own measurement, not needed
    // when graft.Bench is about to time the full headline itself
    if (writeOnly) { spark.stop(); return }

    // warmup: JVM/codegen/session cost out of the measurement
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.queries("ev_catalog")(spark, src)
      .write.mode("overwrite").format("noop").save()

    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }

    val acc = scala.collection.mutable.Map[(String, String), List[Double]]()
    for (pass <- 1 to 3; name <- scanHeavy; layout <- Seq("1file", s"${n}file")) {
      val dir = if (layout == "1file") src else dst
      val t = time(name, dir)
      acc((name, layout)) = t :: acc.getOrElse((name, layout), Nil)
      if (pass > 1) println(f"[layout] pass$pass $name%-18s $layout%-7s $t%.3f s")
    }
    println(f"[layout] ${"query"}%-18s ${"1file"}%8s ${s"${n}file"}%8s  best-of-2-warm")
    var s1 = 0.0; var sn = 0.0
    scanHeavy.foreach { name =>
      val b1 = acc((name, "1file")).init.min // drop pass-1 cold time
      val bn = acc((name, s"${n}file")).init.min
      s1 += b1; sn += bn
      println(f"[layout] $name%-18s $b1%8.3f $bn%8.3f  x${b1 / bn}%.2f")
    }
    println(f"[layout] TOTAL              $s1%8.3f $sn%8.3f  x${s1 / sn}%.2f")
    spark.stop()
  }
}
