package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline queries on
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Each query is forced end-to-end with a `noop` sink write (computes every
  * output column, unlike `count()` which lets Catalyst prune the plan).
  *
  * Burst-resistant recording (round 8): the host throws ROVING 2-10×
  * CPU bursts that land mid-run, so a single pass can bake a burst
  * into a few queries' figures while the early control stays healthy —
  * the r6→r7 artifacts drifted 1.23× on shared queries from exactly
  * this (adjudicated as host noise only by manual re-runs). The fix:
  * run the whole suite `SPARK_GRAFT_BENCH_PASSES` (default 2) times
  * in one JVM and record each query's MINIMUM across passes. Full-suite
  * passes (not per-query back-to-back repeats) separate the two
  * samples by minutes, so a burst must span the entire run to survive
  * into the artifact; the min is the right estimator because noise is
  * strictly additive. The control's min gets the same treatment, so
  * `host_taxed` now means "every pass was taxed". Queries whose
  * pass-to-pass spread exceeds 2× (a burst demonstrably hit one pass,
  * and roving bursts often leave the other pass of the same region
  * mildly taxed too) get one targeted re-run at the end for a third
  * independent sample.
  */
object Bench {

  /** Headline queries: one per operator family, heaviest shapes first.
    *
    * No exclusions: every SparkEntry entry is timeable. (Rounds 9-12
    * excluded `llm_heavy_hitters` because its Misra-Gries premise
    * check ran two extra driver-side corpus counts inside the builder;
    * round 13 fused the N tally into pass 1, so the timed figure IS
    * the two-pass algorithm plus its bounded top-K read — the same
    * contract as every other entry with an in-builder bounded read.)
    */
  val headline: Seq[String] = Seq(
    "ev_flagship", "ev_catalog", "ev_sessionize", "ev_tumbling_1h",
    "ev_sliding_1h15m", "ev_session_window", "ev_asof_join",
    "ev_asof_nearest", "ev_range_join",
    "ev_interval_join", "ev_follow_band", "ev_pattern_match",
    "ev_transitions", "ev_top_paths", "ev_markov_rank", "ev_drift", "ev_ewma",
    "ev_cusum", "ev_ab_test", "ev_ab_cuped",
    "ev_attribution", "ev_seasonal_residual",
    "ev_value_histogram", "ev_heatmap", "ev_funnel", "ev_retention",
    "ev_anomaly", "ev_anomaly_mad", "ev_rate_1m", "ev_stickiness",
    "ev_power_users", "ev_new_returning",
    "ev_user_sequences",
    "ev_uint64_decode",
    "ev_decode_all", "ev_partition_pruned",
    "rel_q1_pricing", "rel_q3_shipping", "rel_q5_region_volume",
    "rel_q6_forecast", "rel_q10_returns", "rel_q18_large_orders",
    "rel_q21_waiting", "rel_q15_top_supplier", "rel_q22_untapped",
    "rel_q7_volume", "rel_q8_market_share", "rel_q13_custdist",
    "rel_q17_small_qty", "rel_q19_disjunctive",
    "rel_basket_pairs", "rel_skew_report", "rel_listagg",
    "rel_running_distinct",
    "rel_window_rank", "rel_window_range", "rel_window_distribution",
    "rel_join_broadcast", "rel_join_bucketed", "rel_rollup",
    "rel_percentile", "rel_corr", "rel_q14_type_share", "rel_profile",
    "rel_constraints", "rel_jdbc_roundtrip",
    "rel_profile_approx", "rel_percentile_approx",
    "rel_merge_upsert", "rel_scd2", "rel_temporal_lookup",
    "rel_incremental_agg", "rel_incremental_join",
    "rel_incremental_join_agg", "rel_incremental_delete",
    "rel_incremental_topk",
    "rel_distinct_incremental", "ev_sliding_distinct", "rel_zorder",
    "rel_cdc_apply",
    "rel_snapshot_diff", "rel_reconcile", "rel_compact",
    "llm_bpe_vocab", "llm_bpe_apply",
    "llm_dedup_exact", "llm_dedup_normalized", "llm_dedup_prefix",
    "llm_dedup_incremental", "llm_dedup_retract", "llm_effective_tokens",
    "llm_minhash_pairs", "llm_neardup_verified", "llm_neardup_served",
    "llm_ppjoin", "llm_ppjoin_served", "llm_containment_join",
    "llm_containment_served",
    "llm_dup_matrix",
    "llm_minhash_recall", "llm_lsh_tuning",
    "llm_dup_clusters", "llm_dup_clusters_served",
    "llm_dup_clusters_incremental", "llm_golden_record",
    "llm_curate", "llm_decontaminate",
    "llm_bloom_decontaminate",
    "llm_embed_ivf",
    "llm_span_dedup", "llm_boilerplate_scrub", "llm_sample_stratified", "llm_sample_weighted", "llm_dsir_sample", "llm_pack_sequences",
    "llm_train_manifest", "llm_split_leakage_safe",
    "llm_pack_salted",
    "llm_hybrid_search", "llm_hybrid_rrf", "llm_corpus_report",
    "llm_bm25", "llm_bm25_log", "llm_bm25_served",
    "llm_semantic_decontaminate", "mm_video_neardup",
    "llm_inverted_index", "llm_mix_temperature",
    "llm_sample_topk", "llm_embed_quantize", "llm_chunk", "llm_bigram_lm",
    "llm_lm_score", "llm_ccnet_buckets", "llm_dsir_weight",
    "llm_ngram_diversity",
    "llm_score_calibrate", "llm_padding_waste", "llm_curriculum",
    "llm_gopher_rules",
    "llm_budget_waterfill", "llm_tokenizer_fertility",
    "llm_pmi_bigrams", "llm_quality_winsor",
    "llm_pii_redact", "llm_k_anonymity", "llm_substring_dedup",
    "llm_doc_features",
    "llm_quality_classify", "llm_embed_kmeans", "llm_embed_kmeans_served",
    "llm_cluster_assign",
    "llm_semdedup", "llm_semdedup_served",
    "llm_semdedup_scaled", "llm_semdedup_scaled_served",
    "llm_semdedup_gated", "llm_semdedup_gated_served",
    "llm_semdedup_gated_scaled", "llm_semdedup_gated_scaled_served",
    "llm_simhash", "llm_simhash_pairs", "llm_simhash_pairs_wide",
    "llm_simhash_pairs_served",
    "llm_embed_topk",
    "llm_embed_lsh_knn", "llm_embed_lsh_knn2", "llm_embed_pq",
    "llm_embed_pq_served", "llm_embed_ivf_served", "llm_embed_ivfpq",
    "llm_embed_ivfpq_served",
    "llm_ann_recall", "llm_retrieval_eval", "llm_knn_graph",
    "llm_knn_graph_wide",
    "llm_knn_incremental", "llm_knn_incremental_served",
    "llm_knn_incremental_wide", "llm_lsh_occupancy", "llm_lsh_occupancy_wide",
    "llm_graph_centrality", "llm_graph_centrality_weighted",
    "llm_mutual_knn_cc", "llm_mutual_knn_served", "llm_graph_khop",
    "llm_label_prop", "llm_label_prop_eval", "llm_graph_triangles",
    "llm_kcore_peel",
    "llm_hard_negatives", "llm_embed_pca", "llm_kcenter", "llm_probe_auc",
    "llm_cluster_silhouette", "llm_cluster_silhouette_served",
    "llm_cluster_quota", "llm_cluster_quota_served",
    "llm_source_centroid_sim", "llm_global_shuffle",
    "llm_embed_neardup", "llm_embed_neardup_lsh", "llm_lang_id", "llm_tfidf",
    "llm_fuzzy_pairs", "llm_sorted_neighborhood",
    "llm_quality_score", "llm_token_count", "llm_fingerprint",
    "mm_image_features", "mm_image_resize", "mm_frame_sample", "mm_scene_cuts",
    "mm_payload_dedup", "mm_payload_shard", "mm_perceptual_dedup")

  /** The sf1 scaling subset (SPARK_GRAFT_BENCH_SF1_DIR): the 15
    * heaviest headline queries at the 10× corpus (per BASELINE.md's
    * round-10 sf1 run) plus EVERY build/serve split's served twin —
    * the entries whose whole point is staying scale-flat. Runs in the
    * same JVM after the main recording and lands in the artifact as
    * `sf1_subset`, so each round's artifact carries both scales from
    * one invocation instead of a separate closing-ritual run.
    */
  val sf1Subset: Seq[String] = Seq(
    // 15 heaviest at sf1
    "llm_ppjoin", "llm_containment_join", "llm_dup_clusters",
    "llm_cluster_silhouette", "llm_semdedup_gated", "llm_lsh_tuning",
    "llm_minhash_recall", "llm_dup_matrix", "llm_curate",
    "llm_substring_dedup", "llm_knn_graph", "llm_span_dedup",
    "rel_q21_waiting", "llm_bpe_vocab", "llm_decontaminate",
    // every served twin
    "llm_embed_pq_served", "llm_embed_ivf_served", "llm_ppjoin_served",
    "llm_neardup_served", "llm_mutual_knn_served",
    "llm_knn_incremental_served", "llm_dup_clusters_served",
    "llm_containment_served", "llm_embed_kmeans_served",
    "llm_cluster_quota_served", "llm_cluster_silhouette_served",
    "llm_semdedup_served", "llm_semdedup_gated_served",
    "llm_semdedup_scaled_served", "llm_semdedup_gated_scaled_served",
    "llm_simhash_pairs_served", "llm_embed_ivfpq_served",
    "llm_cluster_assign", "llm_dedup_retract",
    // chain maintenance vs rebuild at sf1: the corpus-proportional
    // split (round 13) makes these the measured incremental-win
    // evidence against llm_dup_clusters' rebuild figure above
    "llm_dup_clusters_incremental", "llm_dedup_upsert",
    // served-vs-corpus-scan BM25 at sf1 (round 14): the postings-index
    // serve must beat the per-query corpus explode where it matters
    "llm_bm25_log", "llm_bm25_served",
    // scaled-k gated refit: the production fix for the fixed-k gated
    // entry's Σ cluster² sf1 hazard — recorded at sf1 to make the
    // "constant cluster size keeps the gate linear" claim measured
    "llm_semdedup_gated_scaled")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Full-surface sweep (SPARK_GRAFT_BENCH_QUERIES=all): EVERY
    // SparkEntry entry, headline order first then the rest sorted, so
    // "bench covers the surface" is a recorded artifact instead of an
    // eyeballed claim — no exclusions (see the headline scaladoc); the
    // sweep is written only to an explicit SPARK_GRAFT_BENCH_OUT
    // target, never over the headline artifact.
    val sweepAll = sys.env.get("SPARK_GRAFT_BENCH_QUERIES").contains("all")
    // dev-only subsetting for perf iteration; the driver never sets this
    val selected =
      if (sweepAll)
        headline ++ SparkEntry.queries.keys.toSeq.sorted
          .filterNot(headline.contains)
      else sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
        .map(_.split(",").toSeq).getOrElse(headline)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // codegen compile cache sized for THIS engine's workload: one
      // long-lived session serving ~270 analysis shapes generates far
      // more than the 100 codegen units the default cache holds, so
      // every pass over the surface recompiled nearly every query
      // (pure driver CPU, identical on a real cluster — the cache is
      // driver-side and keyed by generated source, it never caches
      // data). Measured on a 60-query subset, alternating in one
      // window: 36.9/38.6 s at 100 entries vs 28.9/30.0 s at 2000
      // (controls 0.85-1.00 throughout) — round-15 A/B, see
      // OPTIMIZATION_r15.md.
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      // shuffle/block scratch under the workdir, NOT /tmp: the host's
      // tmp reaper deleted a long run's blockmgr dir mid-flight
      // (round 11: every shuffle write died with ENOENT and the
      // context shut down 40 min into the recording)
      .config("spark.local.dir", "target/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb one-time JVM/codegen/session cost so timings measure
    // queries; warm with a query from the SELECTED set, not a fixed
    // one — a subset probe (e.g. the sf10 documents-only corpus) may
    // not even have the fixed query's tables
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.queries(
        if (selected.contains("ev_catalog")) "ev_catalog" else selected.head)(
        spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    // fixture warm-up: entries that serve a write-once artifact (the
    // day-partitioned layout, the persisted ANN indexes) build it here,
    // outside the timed region — the artifact is an OFFLINE job by
    // design, and its cost is already visible as the refit twin's
    // figure (llm_embed_pq / llm_embed_ivf) or the corpus write. The
    // timed figure below is then the production per-query cost: the
    // pruned/served READ.
    Seq("ev_partition_pruned", "llm_embed_pq_served", "llm_embed_ivf_served",
        "llm_ppjoin_served", "llm_neardup_served", "llm_mutual_knn_served",
        "llm_knn_incremental_served", "llm_dup_clusters_served",
        "llm_containment_served", "llm_embed_kmeans_served",
        "llm_cluster_quota_served", "llm_cluster_silhouette_served",
        "llm_semdedup_served", "llm_semdedup_gated_served",
        "llm_semdedup_scaled_served", "llm_semdedup_gated_scaled_served",
        "llm_simhash_pairs_served", "llm_embed_ivfpq_served",
        "llm_cluster_assign", "llm_dup_matrix", "llm_dedup_retract",
        "llm_dup_clusters_incremental", "rel_join_bucketed")
      .filter(selected.contains).foreach { n =>
        SparkEntry.queries(n)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
      }
    spark.catalog.clearCache()
    // unknown names fail loudly: selected.filter(queries.contains) would
    // silently shrink the run (e.g. after a rename) while still writing a
    // complete-looking artifact — same ghost-name check as tools/check.py
    val unknown = selected.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown bench query name(s): ${unknown.mkString(", ")}")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
      .max(1)
    // run one query end-to-end; Some(seconds) on success, None on failure
    // (shared by the timed passes and the spread-rerun adjudication so
    // both report failures identically)
    def runOne(name: String, tag: String): Option[Double] = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed ($tag): ${e.getMessage}")
          false
        }
      val t = (System.nanoTime() - t0) / 1e9
      // per-query recording on stderr: survives even if the final JSON
      // line is lost to log truncation (it was, in round 3's artifact)
      System.err.println(f"[bench] $tag $name%s ${t}%.3f s")
      // isolate measurements: drop tables persisted inside operators
      spark.catalog.clearCache()
      if (ok) Some(t) else None
    }
    def runPass(p: Int): Seq[(String, Option[Double])] =
      selected.map(name => name -> runOne(name, s"pass$p"))
    val allPasses = (1 to passes).map(runPass)
    // Targeted adjudication pass: a pass-to-pass spread > 2× means a
    // burst hit at least one pass — and since bursts ROVE, the other
    // pass of the same region is often mildly taxed too (measured:
    // llm_lm_score 42.6 s pass-1 / 1.39 s pass-2 where 0.92 s is the
    // healthy figure). Re-running just the high-spread queries minutes
    // later gives each a third, independently-timed sample for the min.
    val spreadRerun: Map[String, Option[Double]] =
      if (passes < 2) Map.empty
      else selected.zipWithIndex.flatMap { case (name, i) =>
        val ts = allPasses.flatMap(p => p(i)._2)
        if (ts.size >= 2 && ts.max > 2.0 * ts.min && ts.min > 0.2)
          Some(name -> runOne(name, "spread-rerun"))
        else None
      }.toMap
    // min across successful passes; a query failed only if NO pass ran it
    val results: Seq[(String, Option[Double])] = selected.zipWithIndex.map {
      case (name, i) =>
        val ts = allPasses.flatMap(p => p(i)._2) ++
          spreadRerun.getOrElse(name, None)
        name -> (if (ts.isEmpty) None else Some(ts.min))
    }
    val failed = results.count(_._2.isEmpty)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v.getOrElse(0.0) }
      .mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    // Health self-description: rel_q1_pricing is the control — one
    // scan+agg whose healthy-host band is 1.0-1.5 s at sf0.1 (see
    // BASELINE.md "host noise"). A whole-run tax inflates every query
    // uniformly INCLUDING the control, so control_sec > band flags the
    // recording as host-taxed — a taxed driver run can no longer
    // masquerade as a regression (round 4's 103 s artifact did).
    // The 1.5 s threshold is calibrated ONLY at the sf0.1 headline dir;
    // any other corpus (e.g. the sf1 scaling probe, where a healthy
    // control reads ~1.6-4 s) records control_sec without a host_taxed
    // verdict rather than always reading taxed.
    val controlSec = results.toMap.get("rel_q1_pricing").flatten
    val health = controlSec.map { c =>
      val taxed =
        if (sfDir.stripSuffix("/").endsWith("sf0.1"))
          s""","host_taxed":${c > 1.5}"""
        else ""
      f""","control_sec":$c%.3f$taxed"""
    }.getOrElse("")
    // Optional sf1 scaling block: with SPARK_GRAFT_BENCH_SF1_DIR set
    // (e.g. target/sf1), run the scaling subset against that corpus in
    // the same JVM — served fixtures warm up untimed exactly like the
    // main run's — and embed the per-query seconds in the artifact.
    val sf1Block = sys.env.get("SPARK_GRAFT_BENCH_SF1_DIR").map { sf1Dir =>
      System.err.println(s"[bench] sf1 scaling subset on $sf1Dir")
      sf1Subset.filter(_.endsWith("_served")).foreach { n =>
        try SparkEntry.queries(n)(spark, sf1Dir)
          .write.mode("overwrite").format("noop").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $n sf1 warmup failed: ${e.getMessage}")
        }
      }
      spark.catalog.clearCache()
      // Min-of-2, full-subset passes (round 12): the sf1 block was
      // single-pass, so one roving host burst could bake an
      // unadjudicable outlier into the official record — round 11's
      // llm_containment_join read 121.8 s against ~10 s replicated,
      // and the artifact alone could not tell burst from regression.
      // Same estimator as the sf0.1 headline: two whole-subset passes
      // separated by minutes, per-query minimum (noise is strictly
      // additive, so the min is the better estimate of the true cost).
      def sf1Pass(tag: String): Seq[(String, Option[Double])] =
        sf1Subset.map { n =>
          val fn = SparkEntry.queries(n)
          val t0 = System.nanoTime()
          val ok =
            try { fn(spark, sf1Dir).write.mode("overwrite").format("noop").save(); true }
            catch { case e: Throwable =>
              System.err.println(s"[bench] $n failed ($tag): ${e.getMessage}")
              false
            }
          val t = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[bench] $tag $n%s ${t}%.3f s")
          spark.catalog.clearCache()
          n -> (if (ok) Some(t) else None)
        }
      val sf1Passes = Seq(sf1Pass("sf1-pass1"), sf1Pass("sf1-pass2"))
      val rows = sf1Subset.zipWithIndex.map { case (n, i) =>
        val ts = sf1Passes.flatMap(p => p(i)._2)
        "\"" + n + "\":" + (if (ts.isEmpty) 0.0 else ts.min)
      }.mkString("{", ",", "}")
      s""","sf1_dir":"$sf1Dir","sf1_passes":${sf1Passes.size},"sf1_subset":$rows"""
    }.getOrElse("")
    // Code version of this run (git HEAD), recorded in the artifact
    // and compared by the overwrite guard below: the control-health
    // comparison is only meaningful BETWEEN SAME-CODE recordings, so a
    // run on changed code auto-supersedes the stale artifact instead
    // of needing a manual SPARK_GRAFT_BENCH_FORCE=1 (round 11 hit
    // exactly that after the ppjoin rework — BASELINE.md "Round 11
    // FINAL").
    val codeVersion: String =
      try scala.sys.process.Process(Seq("git", "rev-parse", "HEAD")).!!.trim
      catch { case _: Throwable => "unknown" }
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","code_version":"$codeVersion","queries":$qs,"sf":"$sfDir","failed":$failed,"passes":$passes$health$sf1Block}"""
    // also durably on disk: round 3's official artifact lost the total
    // line to sbt log-tail truncation; the file is immune to that.
    // FULL headline runs only — a dev-subset run must never overwrite
    // the official artifact with a partial total that looks complete.
    // A run with ANY failed query is likewise not an artifact: the
    // failed query contributes a near-zero time, so its "total" lies.
    // explicit artifact target (e.g. the multi-file-layout recording
    // bench_multifile.json, whose corpus dir is NOT the sf0.1 headline
    // dir): full-headline zero-failure runs only, same as the default
    val outOverride = sys.env.get("SPARK_GRAFT_BENCH_OUT")
    // Recording-discipline guard (rounds 7 and 9 both saw the driver's
    // routine run committed OVER a healthier definitive recording): an
    // artifact on disk whose control_sec is LOWER (healthier host) than
    // this run's wins — refuse the overwrite unless explicitly forced
    // with SPARK_GRAFT_BENCH_FORCE=1. The control is the comparator, not
    // the total: a lower control means the recording's host was closer
    // to quiet, so its per-query minima are the better estimates.
    def keepExisting(path: String): Boolean = {
      val force = sys.env.get("SPARK_GRAFT_BENCH_FORCE").contains("1")
      if (force) return false
      val p = java.nio.file.Paths.get(path)
      if (!java.nio.file.Files.exists(p)) return false
      val priorText = java.nio.file.Files.readString(p)
      // Same-code check first: a healthier-control recording of OLD
      // code is still stale — its per-query figures measure plans that
      // no longer exist. An artifact with no/different code_version
      // is superseded outright; the control comparison below only
      // arbitrates between two recordings of the SAME code.
      val priorVersion = """"code_version":"([0-9a-f]+)"""".r
        .findFirstMatchIn(priorText).map(_.group(1))
      if (!priorVersion.contains(codeVersion)) {
        System.err.println(
          s"[bench] $path was recorded on different code " +
            s"(${priorVersion.getOrElse("<unversioned>")} vs " +
            s"$codeVersion) - superseding it")
        return false
      }
      val prior = """"control_sec":([0-9.]+)""".r
        .findFirstMatchIn(priorText)
        .map(_.group(1).toDouble)
      (prior, controlSec) match {
        case (Some(old), Some(now)) if old < now =>
          System.err.println(
            f"[bench] $path holds a healthier recording (control $old%.3f" +
              f" < $now%.3f) - left untouched (SPARK_GRAFT_BENCH_FORCE=1" +
              " to overwrite)")
          true
        case _ => false
      }
    }
    if (failed > 0)
      System.err.println(
        s"[bench] $failed quer${if (failed == 1) "y" else "ies"} failed - bench_result.json left untouched")
    else if (outOverride.isDefined && (selected == headline || sweepAll) &&
             keepExisting(outOverride.get)) ()
    else if (outOverride.isDefined && (selected == headline || sweepAll))
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outOverride.get), line + "\n")
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${outOverride.get} write failed: ${e.getMessage}")
      }
    else if (outOverride.isDefined)
      System.err.println(
        "[bench] subset run - " + outOverride.get + " left untouched")
    else if (selected == headline && !sfDir.stripSuffix("/").endsWith("sf0.1"))
      // scaling probes (e.g. target/sf1) run the full headline too, but the
      // official artifact is defined as the sf0.1 recording — an sf1 run
      // must not clobber it with 10x-corpus times that look like a 4x
      // regression to anyone reading only the JSON
      System.err.println(
        s"[bench] non-sf0.1 corpus ($sfDir) - bench_result.json left untouched")
    else if (selected == headline && keepExisting("bench_result.json")) ()
    else if (selected == headline)
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get("bench_result.json"), line + "\n")
      catch { case e: Throwable =>
        System.err.println(s"[bench] bench_result.json write failed: ${e.getMessage}")
      }
    else System.err.println(
      "[bench] subset run - bench_result.json left untouched")
    // Every run — subset, guarded, non-sf0.1 alike — records its raw line
    // at a stable path the driver can read without parsing stdout. This is
    // NOT the official artifact (bench_result.json keeps its guards above);
    // it is the "what did this invocation measure" dump.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/bench_last.json"), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] target/bench_last.json write failed: ${e.getMessage}")
    }
    // The result JSON is the FINAL stdout line of the run: round 10's
    // driver artifact had parsed:null because the overwrite-guard message
    // (stderr, but sbt re-prefixes it onto the combined log as [error])
    // trailed the JSON. All guard/summary messaging above happens BEFORE
    // this print, so a driver that takes the last JSON-looking stdout line
    // always gets the result.
    println(line)
    System.out.flush()
    spark.stop()
  }
}
