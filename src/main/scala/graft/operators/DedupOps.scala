package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication family for large-scale training-data pipelines
  * (SURVEY.md §2.11): exact hash dedup, MinHash+LSH banding, SimHash,
  * and n-gram Jaccard verification.
  *
  * Scale notes (100 TB):
  *  - Exact dedup is a hash groupBy on the content digest — one shuffle
  *    keyed by md5, map-side partial agg.
  *  - MinHash candidates come from an LSH *band join* (docs sharing a band
  *    bucket), never an O(n²) crossJoin: the self-join shuffles on the band
  *    hash so only same-bucket docs ever meet (SURVEY.md §7.4).
  *  - SimHash pairs self-join on 8-bit simhash blocks with one-bit
  *    multi-probe (pigeonhole: hamming ≤ 6 over 4 blocks ⇒ some block
  *    differs by ≤ 1 bit), so join cardinality follows block-bucket
  *    sizes, never O(n²) per source.
  *  - All hashes are md5-based so the DuckDB oracle computes the identical
  *    signature; the reference has no dedup (its A1 catalog,
  *    /root/reference/src/main.cpp:255-321, is the nearest analog: a
  *    distinct-key scan — `dropDuplicates` generalizes it).
  */
object DedupOps {

  private val SEEDS = 0 until 8 // minhash permutations
  private val SIM_BITS = 32     // simhash width

  /** doc → word-3-gram shingles (delegates to the library API). */
  private def shingles(s: SparkSession, dir: String): DataFrame =
    graft.api.GraftPipelines.shingle(Tables.documents(s, dir), 3)

  /** Write-once index fixture location: the shared helper keyed on
    * corpus mtime AND the build parameters (an index is only valid for
    * the threshold/seeds it was built with — see
    * [[graft.sources.GraftIO.fixtureDir]]).
    */
  private def indexFixtureDir(dir: String, kind: String,
      params: String): String =
    graft.sources.GraftIO.fixtureDir(dir, "documents.parquet", kind, params)

  /** buildOnce at the params-keyed fixture path, with the SAME params
    * string as the in-index marker — one argument, so path key and
    * marker can never drift apart.
    */
  private def buildIndexOnce(dir: String, kind: String, params: String)(
      build: String => Unit): String =
    graft.sources.GraftIO.buildOnce(
      indexFixtureDir(dir, kind, params), params)(build)

  /** Build/serve split of the near-dup CLUSTER chain: the verified
    * pair list and its connected-component label map are persisted
    * ONCE per corpus (`GraftIO.buildOnce`, mtime + parameter keyed —
    * the mutualEdgesServed idiom applied to the relational dedup
    * family), and every cluster-consuming analysis reads the label map
    * back. Before this split, golden-record survivorship and the
    * effective-token budget each re-ran the full shingle→minhash→band→
    * verify→contract chain per query — at 100 TB that is the most
    * expensive pipeline in the repo refit three times per analysis
    * pass; served, each analysis is an id-keyed join against a
    * pair-count-sized label table. Output (and thus every consumer's
    * oracle) is identical — a storage refactor, hash-checked.
    */
  private def dupClustersServed(s: SparkSession, dir: String): DataFrame =
    dupChainServed(s, dir)._2

  /** The full persisted dedup chain (verified pair list, cluster label
    * map) from the same write-once fixture [[dupClustersServed]] reads
    * — both tables are pair-count-sized, and the retraction path
    * ([[retractClusters]]) needs the pairs alongside the labels.
    */
  private def dupChainServed(s: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val idx = buildIndexOnce(dir, "dupchain", "n=3,seeds=8,bands=4,theta=0.7") {
      tmp =>
        val pairs = graft.api.GraftPipelines
          .nearDuplicates(Tables.documents(s, dir), 0.7)
          .localCheckpoint()
        pairs.write.parquet(s"$tmp/pairs.parquet")
        graft.api.GraftPipelines.dupClusters(pairs)
          .write.parquet(s"$tmp/clusters.parquet")
    }
    (s.read.parquet(s"$idx/pairs.parquet"),
      s.read.parquet(s"$idx/clusters.parquet"))
  }

  /** Retraction-aware maintenance of the near-dup cluster map — the
    * deletion half of the dedup chain's serve split (right-to-be-
    * forgotten over the DUPLICATE INDEX, the complement of
    * `rel_incremental_delete`'s aggregate retraction): given the
    * persisted verified pairs and label map and a delete list, produce
    * the label map a full recompute over the remaining corpus would.
    *
    * The incremental algebra, never touching corpus text:
    *  - pair retraction is monotone: deleting docs only REMOVES pairs
    *    (two anti-joins over the pair-count-sized table — O(pairs));
    *  - components that contain no deleted doc are untouched: their
    *    members, edges, and component-min label are all intact, so the
    *    persisted labels pass straight through (the O(everything-else)
    *    saving — at 100 TB the delete batch touches a vanishing
    *    fraction of clusters);
    *  - components that DO contain a deleted doc can SPLIT (a deleted
    *    bridge doc disconnects its neighbors), so connected components
    *    re-run over just the retracted edges of those components —
    *    work bounded by the affected clusters' pair count, not the
    *    corpus. Docs left edge-less drop out, matching the recompute
    *    contract (only docs appearing in a surviving verified pair are
    *    clustered).
    */
  private[graft] def retractClusters(s: SparkSession, pairs: DataFrame,
      labels0: DataFrame, del: DataFrame): DataFrame =
    retractChain(s, pairs, labels0, del)._2

  /** [[retractClusters]] plus the surviving pair list — the full
    * post-deletion chain state, what a maintenance loop persists so
    * the NEXT delete batch retracts from the already-retracted chain
    * (the streaming consumer is
    * [[graft.streaming.EventStreaming.takedownLoop]]).
    */
  private[graft] def retractChain(s: SparkSession, pairs: DataFrame,
      labels0: DataFrame, del: DataFrame): (DataFrame, DataFrame) = {
    // labels feed three consumers (affected semi-join, untouched
    // anti-join, edge relabel join) — materialize once, pair-count-sized
    val labels = graft.api.GraftPipelines.labeled(s,
      "retractChain: labels ckpt")(graft.api.GraftPipelines.ckptOnce(labels0))
    val d = del.select(col("del_id"))
    // the delete list is data-scaled (a provenance takedown can name
    // millions of docs) — no broadcast hint on any join against it;
    // AQE may still broadcast when the runtime size is actually small
    val kept = pairs.select(col("d1"), col("d2"))
      .join(d, col("d1") === col("del_id"), "left_anti")
      .join(d, col("d2") === col("del_id"), "left_anti")
    val affected = labels
      .join(d, col("doc_id") === col("del_id"), "left_semi")
      .select(col("cluster_id")).distinct()
    val untouched = labels.join(affected, Seq("cluster_id"), "left_anti")
      .select(col("doc_id"), col("cluster_id"))
    // both endpoints of a surviving pair shared one old component, so
    // labeling d1 alone routes the edge to the right partition of work
    val affectedEdges = kept
      .join(labels.select(col("doc_id").as("d1"), col("cluster_id")),
        Seq("d1"))
      .join(affected, Seq("cluster_id"), "left_semi")
      .select(col("d1"), col("d2"))
    (kept,
      untouched.union(graft.api.GraftPipelines.dupClusters(affectedEdges)))
  }

  /** The ADDITION half of incremental chain maintenance — the dual of
    * [[retractChain]]: given the persisted base chain (pairs + labels)
    * and the VERIFIED new pairs an ingest batch introduced (every new
    * pair has at least one batch endpoint — corpus↔corpus pairs
    * cannot appear, they were already in the base), produce the label
    * map a full rebuild over base ∪ batch would.
    *
    * The incremental algebra, the mirror image of retraction:
    *  - pair addition is monotone: ingesting docs only ADDS pairs, so
    *    the new pair set is base ∪ new — no base pair is re-verified;
    *  - base components touched by NO new pair are untouched: new
    *    pairs are the only added edges, so such a component is
    *    IDENTICAL in the full graph — members, edges, and
    *    component-min label all intact; the persisted labels pass
    *    straight through;
    *  - components that a new pair DOES touch can MERGE (one batch doc
    *    bridging two base clusters collapses them into one), so
    *    connected components re-run over those components' base edges
    *    PLUS all new pairs — work bounded by the touched clusters'
    *    pair count plus the batch's pairs, not the corpus.
    */
  private[graft] def extendChain(s: SparkSession, basePairs0: DataFrame,
      baseLabels0: DataFrame, newPairs0: DataFrame): DataFrame = {
    val P = graft.api.GraftPipelines
    // consumed twice each (affected-edge cut + pass-through
    // complement) — materialized once, but NOT re-checkpointed when
    // the caller already did (ckptOnce: the loops pass checkpointed
    // frames every trigger)
    val basePairs = P.labeled(s, "extendChain: base pairs ckpt") {
      P.ckptOnce(basePairs0, "d1", "d2")
    }
    val baseLabels = P.labeled(s, "extendChain: base labels ckpt") {
      P.ckptOnce(baseLabels0)
    }
    val newPairs = P.labeled(s, "extendChain: new pairs ckpt") {
      P.ckptOnce(newPairs0, "d1", "d2")
    }
    // components any new pair touches: either endpoint's OLD label
    // (batch-only endpoints have no base label and contribute nothing
    // here — their pairs still relabel below)
    val touchedDocs = newPairs.select(col("d1").as("doc_id"))
      .union(newPairs.select(col("d2").as("doc_id"))).distinct()
    val affected = baseLabels
      .join(touchedDocs, Seq("doc_id"), "left_semi")
      .select(col("cluster_id")).distinct()
    val untouched = baseLabels.join(affected, Seq("cluster_id"), "left_anti")
      .select(col("doc_id"), col("cluster_id"))
    val affectedBaseEdges = basePairs
      .join(baseLabels.select(col("doc_id").as("d1"), col("cluster_id")),
        Seq("d1"))
      .join(affected, Seq("cluster_id"), "left_semi")
      .select(col("d1"), col("d2"))
    untouched.union(graft.api.GraftPipelines
      .dupClusters(affectedBaseEdges.union(newPairs)))
  }

  /** BOTH halves of incremental chain maintenance in one step — the
    * composition a real recurring pipeline runs per cycle (docs arrive
    * AND takedowns land in the same window): apply the delete set with
    * [[retractChain]] (O(pairs) anti-joins, CC only inside
    * deletion-affected components), then extend the retracted chain
    * with the ingest batch's verified new pairs via [[extendChain]]
    * (CC only over add-touched components). Produces the (pairs,
    * labels) a full rebuild over (base \ deletes) ∪ batch would.
    *
    * The composition is exact because the two algebras commute through
    * the intermediate state: retraction's output IS a valid persisted
    * chain (its oracle proves that), and extension only requires its
    * base to be a valid chain over the live corpus. `newPairs` must be
    * verified against the POST-delete corpus — no pair may touch a
    * deleted doc (the caller cuts candidates against the delete set;
    * at the stream layer the tombstone anti-join does it).
    */
  private[graft] def upsertChain(s: SparkSession, basePairs: DataFrame,
      baseLabels: DataFrame, del: DataFrame,
      newPairs: DataFrame): (DataFrame, DataFrame) = {
    val (keptPairs, midLabels) = retractChain(s, basePairs, baseLabels, del)
    val kept = graft.api.GraftPipelines
      .labeled(s, "upsertChain: kept pairs ckpt") {
        // feeds extend AND the union
        graft.api.GraftPipelines.ckptOnce(keptPairs)
      }
    val np = graft.api.GraftPipelines
      .labeled(s, "upsertChain: new pairs ckpt") {
        graft.api.GraftPipelines.ckptOnce(newPairs, "d1", "d2")
      }
    (kept.union(np).distinct(),
      extendChain(s, kept, midLabels, np))
  }

  /** OFFLINE vacuum for the streaming chain loops' tombstone model
    * ([[graft.streaming.EventStreaming.upsertLoop]] /
    * `takedownLoop`-fed states): rewrite the `bands/` and `docs/`
    * append logs with the `dels/` tombstones APPLIED, so a taken-down
    * document's text (and its band rows, which derive from that text)
    * physically leave disk — the right-to-be-forgotten completion of
    * the read-side tombstone filter. The serving view is unchanged by
    * construction: every reader already anti-joins `dels/`, and the
    * vacuum removes exactly the rows that filter was hiding. `dels/`
    * itself is kept (tombstones are permanent by the loop contract —
    * they carry only ids, no content) and folded to a few files.
    *
    * Run with the loop STOPPED (it is an offline operator, like every
    * log-store compaction); the loops refuse to start over a
    * half-vacuumed state (a `*.vold` backup present) and name this
    * method as the recovery.
    *
    * Crash-safe swap per log, in the publish-then-swap discipline the
    * generation publisher uses (never a delete-then-rename window):
    *
    *  1. recovery sweep — a stale `<log>.tmpv` is deleted (rewrite
    *     never started swapping); `<log>.vold` with the live log
    *     present means the previous vacuum crashed after swap-in, so
    *     the backup is dropped; `<log>.vold` WITHOUT the live log
    *     means it crashed between the two renames, so the backup is
    *     rolled back — content is never lost in any window;
    *  2. write the tombstone-filtered log to `<log>.tmpv`, preserving
    *     the `pb=` bucketing (the partition column round-trips through
    *     the read, so the rewrite lands in the identical layout the
    *     loops' pruned reads expect);
    *  3. rename live → `.vold`, rename `.tmpv` → live, delete `.vold`.
    */
  def vacuumChainState(s: SparkSession, statePath: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(statePath)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    def p(x: String) = new org.apache.hadoop.fs.Path(x)
    val logs = Seq("bands", "docs")
    // recovery sweep — make every prior crash window whole first
    (logs :+ "dels").foreach { log =>
      val live = s"$statePath/$log"
      fs.delete(p(s"$live.tmpv"), true)
      if (fs.exists(p(s"$live.vold"))) {
        if (fs.exists(p(live))) fs.delete(p(s"$live.vold"), true)
        else require(fs.rename(p(s"$live.vold"), p(live)),
          s"vacuumChainState: rollback rename of $live.vold failed")
      }
    }
    val delsPath = s"$statePath/dels"
    if (!fs.exists(p(delsPath))) return // nothing tombstoned
    val tombs = s.read.parquet(delsPath)
      .select(col("del_id")).distinct().localCheckpoint()
    if (tombs.isEmpty) return
    logs.foreach { log =>
      val live = s"$statePath/$log"
      if (fs.exists(p(live))) {
        // unhinted anti-join: the vacuum is offline, and the tombstone
        // set is unbounded over the state's lifetime — AQE broadcasts
        // it when it is actually small
        val kept = s.read.parquet(live)
          .join(tombs, col("doc_id") === col("del_id"), "left_anti")
        kept.repartition(col("pb"))
          .write.mode("overwrite").partitionBy("pb")
          .parquet(s"$live.tmpv")
        require(fs.rename(p(live), p(s"$live.vold")),
          s"vacuumChainState: backup rename of $live failed")
        require(fs.rename(p(s"$live.tmpv"), p(live)),
          s"vacuumChainState: swap-in rename of $live.tmpv failed — " +
            s"$live.vold holds the pre-vacuum log; re-run to recover")
        fs.delete(p(s"$live.vold"), true)
      }
    }
    // fold the tombstone log itself (ids only — content never lives
    // here) so an unbounded delete stream cannot grow its file count
    val delsTmp = s"$delsPath.tmpv"
    fs.delete(p(delsTmp), true)
    tombs.coalesce(1).write.mode("overwrite").parquet(delsTmp)
    require(fs.rename(p(delsPath), p(s"$delsPath.vold")),
      "vacuumChainState: backup rename of dels failed")
    require(fs.rename(p(delsTmp), p(delsPath)),
      s"vacuumChainState: swap-in rename of $delsTmp failed — " +
        s"$delsPath.vold holds the tombstones; re-run to recover")
    fs.delete(p(s"$delsPath.vold"), true)
  }

  /** Corpus-proportional base/batch ingest split: base = the first 95%
    * of the doc-id range, batch = the last 5%, at EVERY scale factor.
    * A fixed split id (the 250 this replaces) makes the sf0.1+ "batch"
    * most of the corpus, so the maintained path's benched figure
    * approximates a rebuild instead of demonstrating the incremental
    * win; proportional, the batch stays batch-sized as the corpus
    * grows — the shape a recurring ingest actually has. Integer
    * arithmetic so every engine lands on the same threshold.
    */
  private[graft] def ingestSplitId(s: SparkSession, dir: String): Long = {
    val maxId = Tables.documents(s, dir)
      .agg(max(col("doc_id"))).head().getLong(0)
    math.max(1L, (maxId + 1L) * 95L / 100L)
  }

  /** Write-once BASE chain (pairs + labels over the existing corpus,
    * doc_id below the [[ingestSplitId]] threshold): what a recurring
    * pipeline would have persisted BEFORE the batch arrived. Pairs
    * derive by filtering the full dupchain fixture (band hashes and
    * pairwise verification are per-doc/per-pair, so the full chain's
    * both-endpoints-base pairs ARE the base-only chain's pairs);
    * labels must be recomputed (the full fixture's components may
    * span the split).
    */
  private def dupChainBaseServed(s: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val split = ingestSplitId(s, dir)
    val idx = buildIndexOnce(dir, "dupchain_base",
      s"n=3,seeds=8,bands=4,theta=0.7,split=$split") { tmp =>
      val base = dupChainServed(s, dir)._1
        .filter(col("d1") < split && col("d2") < split)
        .select(col("d1"), col("d2")).localCheckpoint()
      base.write.parquet(s"$tmp/pairs.parquet")
      graft.api.GraftPipelines.dupClusters(base)
        .write.parquet(s"$tmp/clusters.parquet")
    }
    (s.read.parquet(s"$idx/pairs.parquet"),
      s.read.parquet(s"$idx/clusters.parquet"))
  }

  /** Write-once PPJoin index (token + prefix tables), shared by
    * llm_ppjoin_served and llm_dup_matrix. Persist-oriented build:
    * write the token table, RE-READ it to derive the prefix index — no
    * localCheckpoint copy of the corpus-scaled tables stays pinned in
    * executor memory for the rest of the JVM (ppjoinIndex's checkpoints
    * serve the in-plan join; here the only consumer is the parquet
    * write).
    */
  private def ppjoinIndexServed(s: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    // fmt=sets: the token table persists as per-doc DISTINCT shingle
    // SETS (id, sz, sarr) — the verify step consumes the arrays as-is
    // instead of re-aggregating token rows per query, and the prefix
    // build reads sz off the row instead of a count window (see
    // GraftPipelines.ppjoinTokenSets). h64 (round 15): the prefix
    // table's token key is the 8-byte xxhash64 instead of the shingle
    // string (GraftPipelines.ppjoinRanked) — schema change, so a new
    // params key; the old fixture is simply superseded.
    val idx = buildIndexOnce(dir, "ppjoin", "num=1,den=2,w=3,fmt=sets-h64") {
      tmp =>
      graft.api.GraftPipelines
        .ppjoinTokenSets(Tables.documents(s, dir))
        .write.parquet(s"$tmp/toksets.parquet")
      graft.api.GraftPipelines
        .ppjoinPrefix(graft.api.GraftPipelines
          .ppjoinTokensOf(s.read.parquet(s"$tmp/toksets.parquet")),
          num = 1, den = 2)
        .write.parquet(s"$tmp/pref.parquet")
    }
    // the probe phase consumes BOTH tables twice (pref self-join,
    // set-array verify joins) — materialize each read-back once per
    // query; without this the sf1 serve path re-decodes parquet per
    // join side and loses to the refit's checkpointed tables
    (s.read.parquet(s"$idx/toksets.parquet").localCheckpoint(),
      s.read.parquet(s"$idx/pref.parquet").localCheckpoint())
  }

  /** Write-once (token, container-slice) tables for the CONTAINMENT
    * join — the ppjoinIndexServed idiom for the asymmetric variant.
    * The container side persists as the PER-τ SLICE of the ranked
    * table ([[graft.api.GraftPipelines.containmentContainerSlice]]:
    * only rows whose token appears in some doc's τ-prefix — pruned
    * rows can never collide, so serving from the slice is bit-
    * identical, and `slice.filter(prefixCond) == pref` lets the slice
    * drop straight into `containmentPairsFromIndex` as `ranked`). The
    * round-12 design persisted the UNFILTERED ranked table so one
    * index could serve every τ, but the sf10 probe priced that
    * generality: the all-τ read-back carries every token occurrence —
    * dominated by the high-df tokens the prefix never selects — and
    * grew 12.1× for 10× data. The entry's contract declares τ = 4/5,
    * so the fixture is keyed by τ (`num=4,den=5`) and a different τ
    * builds its own slice; a τ' ≥ τ could even be served from this one
    * (its prefixes shrink), but the key stays exact for clarity.
    */
  private def containmentIndexServed(s: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val idx = buildIndexOnce(dir, "containment_sliced",
        "num=4,den=5,w=3,fmt=sets-h64") { tmp =>
      graft.api.GraftPipelines
        .ppjoinTokenSets(Tables.documents(s, dir))
        .write.parquet(s"$tmp/toksets.parquet")
      graft.api.GraftPipelines
        .containmentContainerSlice(
          graft.api.GraftPipelines.ppjoinRanked(
            graft.api.GraftPipelines
              .ppjoinTokensOf(s.read.parquet(s"$tmp/toksets.parquet"))),
          num = 4, den = 5)
        .write.parquet(s"$tmp/cont.parquet")
    }
    // the set table feeds the verify joins twice — materialize once
    // (see ppjoinIndexServed); the slice is consumed once per side,
    // read as-is
    (s.read.parquet(s"$idx/toksets.parquet").localCheckpoint(),
      s.read.parquet(s"$idx/cont.parquet"))
  }

  /** Write-once exact θ≥1/2 PPJoin pair set — the dedup family's
    * ground-TRUTH table, built FROM the served prefix index and read
    * back by every truth-consuming measurement (llm_minhash_recall,
    * llm_lsh_tuning). Before this split each measurement refit the
    * full prefix-filtered self-join per query — the single most
    * expensive constant in the headline (the tiny-vocabulary verify,
    * ~6.5 s at sf0.1); served, the truth is a pair-count-sized
    * parquet read. Output identical — a storage refactor under the
    * same oracles, the dupClustersServed discipline.
    */
  private def ppjoinTruthServed(s: SparkSession, dir: String): DataFrame = {
    val idx = buildIndexOnce(dir, "ppjoin_truth", "num=1,den=2,w=3") { tmp =>
      val (toks, pref) = ppjoinIndexServed(s, dir)
      graft.api.GraftPipelines.ppjoinPairsFromIndex(toks, pref,
          num = 1, den = 2)
        .write.parquet(s"$tmp/pairs.parquet")
    }
    s.read.parquet(s"$idx/pairs.parquet")
  }

  /** Cluster presentation (label map + sizes + keeper flag) shared by
    * llm_dup_clusters (refit) and llm_dup_clusters_served (read-back);
    * both hash against the same oracle. The label map is consumed
    * twice (size agg + join-back) — materialized once, it is
    * pair-count-sized, never corpus-sized.
    */
  private def dupClustersEntry(s: SparkSession,
      clusters0: DataFrame): DataFrame = {
    import s.implicits._
    val clusters = clusters0.localCheckpoint()
    val sizes = clusters.groupBy($"cluster_id")
      .agg(count(lit(1)).as("csize"))
    clusters.join(sizes, "cluster_id")
      .select($"doc_id", $"cluster_id", $"csize",
        ($"doc_id" === $"cluster_id").cast("int").as("is_keeper"))
      .orderBy($"doc_id")
  }

  /** Write-once SimHash signature fixture (one (doc_id, source,
    * simhash) row per doc): the signature agg was the last near-dup
    * family member still derived per query — the pair entries used to
    * pin it with `persist()` for the JVM's life, the warm-cache hazard
    * the round-10/11 reviews flagged twice. The ppjoinIndexServed
    * discipline instead: built offline once per corpus (mtime-keyed),
    * read back as a doc-count-sized parquet by the `_served` twin.
    */
  private def simhashIndexServed(s: SparkSession, dir: String): DataFrame = {
    val idx = buildIndexOnce(dir, "simhash", s"bits=$SIM_BITS") { tmp =>
      simhash(s, dir).write.parquet(s"$tmp/sig.parquet")
    }
    s.read.parquet(s"$idx/sig.parquet")
  }

  /** 4×8-bit blocked + 1-bit multi-probe simhash pair scan (scheme
    * rationale at the llm_simhash_pairs entry). `sh` must be a
    * MATERIALIZED (doc_id, source, simhash) frame — both join sides
    * consume it, so a lazy plan would run the signature agg twice.
    */
  private def simhashPairsEntry(s: SparkSession, sh: DataFrame): DataFrame = {
    import s.implicits._
    def block(i: Int): Column =
      shiftright($"simhash", 8 * i).bitwiseAND(lit(255L))
    // Bucket key as ONE long, (block index << 8) | block value —
    // injective over (bi ∈ 0..3, bv ∈ 0..255), so the join matches
    // exactly the pairs the old struct(bi, bv) key did while the
    // exchanges and the join hash a single 8-byte column instead of a
    // 2-field struct (round 15; the r14 'not yet' list named it).
    // explode_outer: the array of 4/36 literals is never null/empty,
    // and plain explode would plant the pushed-down implicit filter
    // that re-evaluates the array chain (the r14 Generate pathology).
    // Exact side: one row per (doc, block). Probe side: 9 rows per
    // (doc, block) — the block value and its 8 one-bit flips.
    val exact = sh.select($"doc_id", $"source", $"simhash",
      explode_outer(array((0 until 4).map(i =>
        (lit((i.toLong) << 8) + block(i)).as("b")): _*)).as("b"))
    val probes = sh.select($"doc_id", $"source", $"simhash",
      explode_outer(array((for {
        i <- 0 until 4
        j <- -1 until 8
      } yield lit((i.toLong) << 8) +
        (if (j < 0) block(i)
         else block(i).bitwiseXOR(lit(1L << j)))): _*)).as("b"))
    exact.as("l").join(probes.as("r"),
        col("l.source") === col("r.source") &&
        col("l.b") === col("r.b") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("d1"), col("r.doc_id").as("d2"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash")))
          .cast("int").as("hamming"))
      .filter($"hamming" <= 6)
      .distinct()
      .orderBy($"d1", $"d2")
  }

  /** 2×16-bit blocked + ≤3-bit multi-probe simhash pair scan (scheme
    * rationale at the llm_simhash_pairs_wide entry); same
    * materialized-`sh` contract as [[simhashPairsEntry]].
    */
  private def simhashPairsWideEntry(s: SparkSession,
      sh: DataFrame): DataFrame = {
    import s.implicits._
    def block(i: Int): Column =
      shiftright($"simhash", 16 * i).bitwiseAND(lit(65535L))
    val masks = (Seq(0L) ++
      (0 until 16).map(a => 1L << a) ++
      (for { a <- 0 until 16; b <- a + 1 until 16 }
        yield (1L << a) | (1L << b)) ++
      (for { a <- 0 until 16; b <- a + 1 until 16; c <- b + 1 until 16 }
        yield (1L << a) | (1L << b) | (1L << c))).toDF("mask")
    // single-long bucket key (bi << 16 | bv) + explode_outer — the
    // simhashPairsEntry rationale; the probe side XORs the mask into
    // the LOW 16 bits only (mask < 2^16), so the block index rides
    // untouched in the high bits
    val blocked = sh.select($"doc_id", $"source", $"simhash",
      explode_outer(array((0 until 2).map(i =>
        (lit((i.toLong) << 16) + block(i)).as("b")): _*)).as("b"))
    val probes = blocked
      .crossJoin(broadcast(masks))
      .select($"doc_id", $"source", $"simhash",
        $"b".bitwiseXOR($"mask").as("b"))
    blocked.as("l").join(probes.as("r"),
        col("l.source") === col("r.source") &&
        col("l.b") === col("r.b") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("d1"), col("r.doc_id").as("d2"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash")))
          .cast("int").as("hamming"))
      .filter($"hamming" <= 6)
      .distinct()
      .orderBy($"d1", $"d2")
  }

  /** MinHash signature: per doc, min(md5(seed || shingle)) per seed. */
  private def minhash(s: SparkSession, dir: String): DataFrame =
    graft.api.GraftPipelines.minhashSignature(shingles(s, dir), SEEDS.size)

  /** LSH bands: 4 bands × 2 rows, band index baked into the band hash. */
  private def bands(s: SparkSession, dir: String): DataFrame =
    graft.api.GraftPipelines.lshBands(minhash(s, dir), 4, 2)

  /** 32-bit SimHash over word unigrams. Bit j is bit (31-j) of the
    * big-endian first 4 digest bytes — the same bits the hex-nibble
    * formulation reads, but derived from one numeric Md5Half60 value with
    * integer ops instead of 32 conv(substring(...)) chains.
    */
  private def simhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Repartition pre-explode: parallelizes the per-word digest work past
    // the single-row-group scan and co-partitions with the groupBy below.
    val words = Tables.documents(s, dir)
      .select($"doc_id", $"source", $"text")
      .repartition($"doc_id")
      .select($"doc_id", $"source", explode_outer(split($"text", " ")).as("word"))
      // null-text guard (GraftPipelines.postingsOf note): the filter
      // references the generator output, so it is not pushed below
      .filter($"word".isNotNull)
      // LE low bytes of the digest's first half; mask to BE 32-bit word
      .withColumn("u",
        graft.functions.VectorExpressions.md5Half60($"word", upperHalf = true))
      .withColumn("v32",
        (($"u" % 256) * 16777216L) +
          (shiftright($"u", 8).bitwiseAND(lit(255L)) * 65536L) +
          (shiftright($"u", 16).bitwiseAND(lit(255L)) * 256L) +
          shiftright($"u", 24).bitwiseAND(lit(255L)))
    def bit(j: Int): Column =
      shiftright($"v32", 31 - j).bitwiseAND(lit(1L)).cast("int")
    val contribs =
      (0 until SIM_BITS).map(j => sum(bit(j) * 2 - 1).as(s"c$j"))
    val agg = words.groupBy($"doc_id", $"source")
      .agg(contribs.head, contribs.tail: _*)
    val sim = (0 until SIM_BITS)
      .map(j => when(col(s"c$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select($"doc_id", $"source", sim.as("simhash"))
  }

  // ---- DuckDB oracle fragments (identical hash math, 1-based lists) ----

  private def shinglesSqlFrom(table: String) =
    s"""sh AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
       |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM $table)
       |  WHERE len(w) >= 3)""".stripMargin

  private val shinglesSql = shinglesSqlFrom("documents")

  // 60-bit numeric min-hashes, Kirsch–Mitzenmacher family from ONE md5
  // per shingle: u/v = md5_number_lower/upper % 2^60 mirror the engine's
  // Md5Km expression bit-for-bit, and h_i = (u + i·v) % 2^60 stays inside
  // BIGINT (u + 7v < 2^63), so the arithmetic is exact on both sides.
  private val minhashSql = {
    val aggs = SEEDS.map { i =>
      s"min(CAST((u + $i * v) % 1152921504606846976 AS BIGINT)) AS h$i"
    }.mkString(", ")
    s"""mh AS (SELECT doc_id, $aggs FROM (
       |  SELECT doc_id,
       |   CAST(md5_number_lower(s) % 1152921504606846976 AS BIGINT) AS u,
       |   CAST(md5_number_upper(s) % 1152921504606846976 AS BIGINT) AS v
       |  FROM sh) GROUP BY doc_id)""".stripMargin
  }

  /** LSH candidates → Jaccard verify → symmetric closure → connected
    * components (the transitive-closure mirror of
    * [[graft.api.GraftPipelines.dupClusters]]'s min-label propagation);
    * shared by the llm_dup_clusters and llm_golden_record oracles.
    * Requires a WITH RECURSIVE prelude containing sh/mh/bands.
    */
  private val clusterChainSql = clusterChainSqlFrom("documents")

  /** [[clusterChainSql]] over an arbitrary docs table (e.g. the
    * post-deletion `live` view the retraction oracle recomputes from).
    */
  private def clusterChainSqlFrom(table: String) =
    s"""cands AS (
      |  SELECT DISTINCT l.doc_id AS d1, r.doc_id AS d2
      |  FROM bands l JOIN bands r ON l.b = r.b AND l.doc_id < r.doc_id),
      |sets AS (
      |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS wset
      |  FROM $table),
      |vpairs AS (
      |  SELECT d1, d2 FROM cands
      |  JOIN sets s1 ON d1 = s1.doc_id
      |  JOIN sets s2 ON d2 = s2.doc_id
      |  WHERE CAST(len(list_intersect(s1.wset, s2.wset)) AS DOUBLE)
      |        / len(list_distinct(list_concat(s1.wset, s2.wset))) >= 0.7),
      |edges AS (
      |  SELECT d1 AS a, d2 AS b FROM vpairs
      |  UNION SELECT d2, d1 FROM vpairs),
      |reach(a, b) AS (
      |  SELECT a, a FROM edges
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      |clusters AS (
      |  SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a)""".stripMargin

  private val bandsSql = {
    val rows = (0 until 4).map(b =>
      s"SELECT doc_id, md5('b$b|' || CAST(h${2 * b} AS VARCHAR) || ',' || CAST(h${2 * b + 1} AS VARCHAR)) AS b FROM mh")
    s"bands AS (${rows.mkString(" UNION ALL ")})"
  }

  /** Band CTE for an arbitrary (bands × rowsPerBand) slicing of the
    * 8-seed signature — the parameterized twin of [[bandsSql]], mirror
    * of [[graft.api.GraftPipelines.lshBands]]'s hash format.
    */
  private def bandsSqlCfg(nb: Int, r: Int, name: String) = {
    val rows = (0 until nb).map { b =>
      val cols = (0 until r).map(j => s"CAST(h${b * r + j} AS VARCHAR)")
        .mkString(" || ',' || ")
      s"SELECT doc_id, md5('b$b|' || $cols) AS b FROM mh"
    }
    s"$name AS (${rows.mkString(" UNION ALL ")})"
  }

  /** Shared by llm_dup_clusters and llm_dup_clusters_served (the
    * read-back twin of the persisted label map).
    */
  private lazy val dupClustersOracleSql: String =
    s"""WITH RECURSIVE $shinglesSql, $minhashSql, $bandsSql,
       |$clusterChainSql
       |SELECT doc_id, cluster_id, csize,
       | CAST(doc_id = cluster_id AS INTEGER) AS is_keeper
       |FROM clusters
       |JOIN (SELECT cluster_id, count(*) AS csize FROM clusters GROUP BY 1)
       |  USING (cluster_id)
       |ORDER BY doc_id""".stripMargin

  /** llm_dedup_retract's recompute oracle: the full dup-clusters chain
    * over the corpus MINUS the delete batch — the maintained path must
    * equal what a from-scratch rebuild on the remaining docs produces,
    * including component splits where a deleted doc was the bridge.
    */
  private lazy val dedupRetractOracleSql: String =
    s"""WITH RECURSIVE live AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 7),
       |${shinglesSqlFrom("live")}, $minhashSql, $bandsSql,
       |${clusterChainSqlFrom("live")}
       |SELECT doc_id, cluster_id, csize,
       | CAST(doc_id = cluster_id AS INTEGER) AS is_keeper
       |FROM clusters
       |JOIN (SELECT cluster_id, count(*) AS csize FROM clusters GROUP BY 1)
       |  USING (cluster_id)
       |ORDER BY doc_id""".stripMargin

  /** llm_dedup_upsert's recompute oracle: the full dup-clusters chain
    * over (base \ deletes) ∪ batch — base = doc ids below the
    * corpus-proportional 95% split, deletes = base ids with
    * doc_id % 10 == 7, batch = the last 5%. The maintained
    * retract-then-extend path must equal this from-scratch rebuild,
    * splits and merges included. DuckDB integer division is `//`
    * (its `/` is float), and the `greatest(1, …)` floor mirrors
    * [[ingestSplitId]]'s `math.max(1L, …)` exactly — on a degenerate
    * corpus where maxId*95/100 rounds to 0 both engines must land on
    * the same threshold or the hash check fails spuriously.
    */
  private lazy val dedupUpsertOracleSql: String =
    s"""WITH RECURSIVE live AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE doc_id >= (SELECT greatest(1, ((max(doc_id) + 1) * 95) // 100)
       |                   FROM documents)
       |     OR doc_id % 10 <> 7),
       |${shinglesSqlFrom("live")}, $minhashSql, $bandsSql,
       |${clusterChainSqlFrom("live")}
       |SELECT doc_id, cluster_id, csize,
       | CAST(doc_id = cluster_id AS INTEGER) AS is_keeper
       |FROM clusters
       |JOIN (SELECT cluster_id, count(*) AS csize FROM clusters GROUP BY 1)
       |  USING (cluster_id)
       |ORDER BY doc_id""".stripMargin

  /** Shared by llm_neardup_verified and llm_neardup_served: the serve
    * path reads a persisted band index, but the rows must be identical.
    */
  /** Shared by llm_decontaminate and llm_bloom_decontaminate: the exact
    * 5-gram overlap flag — the Bloom variant must agree byte-for-byte.
    */
  private lazy val decontaminateOracleSql: String = {
    val gram5 =
      "w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]"
    def grams(pred: String) =
      s"""SELECT DISTINCT doc_id,
         |   CAST(md5_number_lower(s) % 1152921504606846976 AS BIGINT) AS g
         |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(w) - 3),
         |           i -> $gram5)) AS s
         |        FROM (SELECT doc_id, string_split(text, ' ') AS w
         |              FROM documents WHERE $pred)
         |        WHERE len(w) >= 5)""".stripMargin
    s"""WITH cg AS (${grams("source <> 'src19'")}),
       |eg AS (SELECT DISTINCT g FROM (${grams("source = 'src19'")})),
       |hits AS (
       |  SELECT doc_id, count(*) AS n_eval_grams
       |  FROM cg JOIN eg USING (g) GROUP BY doc_id)
       |SELECT d.doc_id,
       | CAST(coalesce(n_eval_grams, 0) AS BIGINT) AS n_eval_grams,
       | CAST(coalesce(n_eval_grams, 0) > 0 AS INTEGER) AS is_contaminated
       |FROM (SELECT doc_id FROM documents WHERE source <> 'src19') d
       |LEFT JOIN hits USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  private lazy val neardupOracleSql: String =
    s"""WITH $shinglesSql, $minhashSql, $bandsSql,
       |cands AS (
       |  SELECT DISTINCT l.doc_id AS d1, r.doc_id AS d2
       |  FROM bands l JOIN bands r ON l.b = r.b AND l.doc_id < r.doc_id),
       |sets AS (
       |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS wset
       |  FROM documents)
       |SELECT d1, d2, n_common, n_union, jaccard FROM (
       |  SELECT d1, d2,
       |   CAST(len(list_intersect(s1.wset, s2.wset)) AS INTEGER) AS n_common,
       |   CAST(len(list_distinct(list_concat(s1.wset, s2.wset))) AS INTEGER) AS n_union,
       |   CAST(len(list_intersect(s1.wset, s2.wset)) AS DOUBLE)
       |     / len(list_distinct(list_concat(s1.wset, s2.wset))) AS jaccard
       |  FROM cands
       |  JOIN sets s1 ON d1 = s1.doc_id
       |  JOIN sets s2 ON d2 = s2.doc_id)
       |WHERE jaccard >= 0.7 ORDER BY d1, d2""".stripMargin

  /** Shared by llm_ppjoin and llm_ppjoin_served: the serve path reads
    * a persisted index, but the rows must be identical.
    */
  /** Shared by llm_containment_join (refit) and llm_containment_served
    * (read-back index) — the serve path is a storage refactor, so both
    * hash against the one oracle.
    */
  private lazy val containmentOracleSql: String =
    s"""WITH $shinglesSql,
       |toks AS (SELECT DISTINCT doc_id, s FROM sh),
       |dfreq AS (SELECT s, count(*) AS df FROM toks GROUP BY s),
       |ranked AS (
       |  SELECT doc_id, s,
       |   row_number() OVER (PARTITION BY doc_id ORDER BY df, s) AS rn,
       |   count(*) OVER (PARTITION BY doc_id) AS sz
       |  FROM toks JOIN dfreq USING (s)),
       |pref AS (SELECT doc_id, s FROM ranked
       |         WHERE rn <= sz - ((4 * sz + 4) // 5) + 1),
       |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |         FROM pref a JOIN toks b
       |           ON a.s = b.s AND a.doc_id <> b.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
       |inter AS (
       |  SELECT a_id, b_id, count(*) AS inter
       |  FROM cand JOIN toks ta ON ta.doc_id = a_id
       |  JOIN toks tb ON tb.doc_id = b_id AND tb.s = ta.s
       |  GROUP BY a_id, b_id)
       |SELECT a_id, b_id, sa.sz AS na, sb.sz AS nb, inter,
       | (1000 * inter) // sa.sz AS contain_x1000
       |FROM inter JOIN sizes sa ON sa.doc_id = a_id
       |JOIN sizes sb ON sb.doc_id = b_id
       |WHERE 5 * inter >= 4 * sa.sz
       |ORDER BY a_id, b_id""".stripMargin

  private lazy val ppjoinOracleSql: String =
    s"""WITH $shinglesSql,
       |toks AS (SELECT DISTINCT doc_id, s FROM sh),
       |dfreq AS (SELECT s, count(*) AS df FROM toks GROUP BY s),
       |ranked AS (
       |  SELECT doc_id, s,
       |   row_number() OVER (PARTITION BY doc_id ORDER BY df, s) AS rn,
       |   count(*) OVER (PARTITION BY doc_id) AS sz
       |  FROM toks JOIN dfreq USING (s)),
       |pref AS (SELECT doc_id, s FROM ranked
       |         WHERE rn <= sz - ((sz + 1) // 2) + 1),
       |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |         FROM pref a JOIN pref b
       |           ON a.s = b.s AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
       |inter AS (
       |  SELECT a_id, b_id, count(*) AS inter
       |  FROM cand JOIN toks ta ON ta.doc_id = a_id
       |  JOIN toks tb ON tb.doc_id = b_id AND tb.s = ta.s
       |  GROUP BY a_id, b_id)
       |SELECT a_id, b_id, sa.sz AS na, sb.sz AS nb, inter,
       | (1000 * inter) // (sa.sz + sb.sz - inter) AS jac_x1000
       |FROM inter JOIN sizes sa ON sa.doc_id = a_id
       |JOIN sizes sb ON sb.doc_id = b_id
       |WHERE 3 * inter >= sa.sz + sb.sz
       |ORDER BY a_id, b_id""".stripMargin

  private val simhashSql = {
    val contribs = (0 until SIM_BITS)
      .map(j => s"sum((CAST((v32 >> ${31 - j}) & 1 AS INTEGER)) * 2 - 1) AS c$j")
      .mkString(", ")
    val value = (0 until SIM_BITS)
      .map(j => s"(CASE WHEN c$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")
    s"""simagg AS (
       |  SELECT doc_id, source, $contribs
       |  FROM (SELECT doc_id, source,
       |         CAST(((u % 256) * 16777216) + (((u >> 8) % 256) * 65536) +
       |              (((u >> 16) % 256) * 256) + ((u >> 24) % 256) AS BIGINT) AS v32
       |        FROM (SELECT doc_id, source,
       |               md5_number_upper(unnest(string_split(text, ' '))) AS u
       |              FROM documents))
       |  GROUP BY doc_id, source),
       |sh AS (SELECT doc_id, source, $value AS simhash FROM simagg)""".stripMargin
  }

  // Shared CTE chain for the curate oracles: quality gate → exact dedup
  // → LSH candidates over the survivors → Jaccard-verified pairs.
  /** Curate CTE chain rooted at `base` (any relation with the documents
    * schema): quality gate -> exact dedup -> LSH candidates -> verified
    * pairs. */
  private def curatePrefixSqlFrom(base: String) = {
    val stopList = graft.api.GraftPipelines.DefaultStopwords
      .map(w => s"'$w'").mkString(", ")
    s"""q AS (
       |  SELECT doc_id, len(w) AS n_words,
       |   (CAST(len(list_distinct(w)) AS DOUBLE) / len(w)) * 0.5 +
       |   (CAST(len(list_filter(w, x -> x IN ($stopList))) AS DOUBLE)
       |      / len(w)) * 0.3 +
       |   (CASE WHEN CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
       |              / len(w) >= 3.0
       |          AND CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
       |              / len(w) <= 8.0
       |         THEN 0.2 ELSE 0.0 END) AS score
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM $base)),
       |kept AS (
       |  SELECT d.* FROM $base d JOIN q USING (doc_id)
       |  WHERE q.score >= 0.45 AND q.n_words >= 5),
       |exact AS (
       |  SELECT doc_id, source, text FROM (
       |    SELECT doc_id, source, text,
       |     row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
       |    FROM kept) WHERE rn = 1),
       |${shinglesSqlFrom("exact")}, $minhashSql, $bandsSql,
       |cands AS (
       |  SELECT DISTINCT l.doc_id AS d1, r.doc_id AS d2
       |  FROM bands l JOIN bands r ON l.b = r.b AND l.doc_id < r.doc_id),
       |sets AS (
       |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS wset
       |  FROM exact),
       |vpairs AS (
       |  SELECT d1, d2 FROM cands
       |  JOIN sets s1 ON d1 = s1.doc_id
       |  JOIN sets s2 ON d2 = s2.doc_id
       |  WHERE CAST(len(list_intersect(s1.wset, s2.wset)) AS DOUBLE)
       |        / len(list_distinct(list_concat(s1.wset, s2.wset))) >= 0.7)""".stripMargin
  }

  private val curatePrefixSql = curatePrefixSqlFrom("documents")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: group by content digest, keep lowest doc_id.
    "llm_dedup_exact" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .groupBy(md5($"text").as("h"))
        .agg(min($"doc_id").as("keeper"), count(lit(1)).as("n_copies"))
        .orderBy($"h")
    }),

    // Normalization-insensitive exact dedup: lowercase, strip
    // non-alphanumerics, collapse space runs, trim — the canonical-form
    // pass that catches trivial reformattings (case, punctuation,
    // spacing) byte-exact md5 dedup misses, at the same pure-map-side
    // cost: only the 32-char digest shuffles, never text.
    "llm_dedup_normalized" -> ((s, dir) => {
      import s.implicits._
      val norm = trim(regexp_replace(
        regexp_replace(lower($"text"), "[^a-z0-9 ]", ""), " +", " "))
      Tables.documents(s, dir)
        .groupBy(md5(norm).as("h"))
        .agg(min($"doc_id").as("keeper"), count(lit(1)).as("n_copies"))
        .orderBy($"h")
    }),

    // Dedup-aware effective dataset size: per source, the whitespace
    // tokens surviving cluster-level dedup (keepers only) vs the raw
    // total — the "effective tokens" a data-mix planner actually
    // budgets, since raw counts over-state near-duplicated sources
    // (keepers attribute their tokens to their own source). Composes
    // the verified near-dup cluster chain (docs outside any cluster
    // are their own keeper) with llm_token_count's tokenization.
    "llm_effective_tokens" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      // reads the buildOnce-persisted label map (see dupClustersServed)
      val clusters = dupClustersServed(s, dir)
      docs.select($"doc_id", $"source",
          size(split($"text", " ")).cast("long").as("n_ws"))
        .join(clusters, Seq("doc_id"), "left_outer")
        .withColumn("cluster_id", coalesce($"cluster_id", $"doc_id"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_ws").as("total_tokens"),
          sum(when($"doc_id" === $"cluster_id", $"n_ws").otherwise(0L))
            .as("effective_tokens"))
        .withColumn("eff_x1000",
          expr("(1000 * effective_tokens) div total_tokens"))
        .orderBy($"source")
    }),

    // Exact set-containment join at τ = 4/5 (see
    // GraftPipelines.containmentPairs): ordered pairs where ≥ 80 % of
    // a's 3-gram shingles appear in b — quotes, excerpts, and
    // boilerplate supersets that symmetric Jaccard misses when the
    // container is much larger than the contained doc.
    "llm_containment_join" -> ((s, dir) => {
      import s.implicits._
      graft.api.GraftPipelines
        .containmentPairs(Tables.documents(s, dir), num = 4, den = 5)
        .orderBy($"a_id", $"b_id")
    }),

    // Build/serve split of llm_containment_join (the llm_ppjoin_served
    // idiom for the asymmetric join): the (token, container-slice)
    // tables persist once per corpus and the timed query is candidate
    // + verify over the read-back — identical output, shared oracle.
    // The container side persists τ-SLICED (rows whose token appears
    // in some τ-prefix — the rest can never collide), replacing the
    // all-τ unfiltered ranked table whose read-back the sf10 probe
    // measured at 12.1x for 10x data.
    "llm_containment_served" -> ((s, dir) => {
      import s.implicits._
      val (toks, contSlice) = containmentIndexServed(s, dir)
      graft.api.GraftPipelines
        .containmentPairsFromIndex(toks, contSlice, num = 4, den = 5)
        .orderBy($"a_id", $"b_id")
    }),

    // Prefix dedup: group by the digest of the first 10 words — the
    // shared-header case (mirrored boilerplate, templated openings)
    // that whole-document digests miss and near-dup thresholds may not
    // reach. Same map-side digest + keyed groupBy shape as exact dedup.
    "llm_dedup_prefix" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .groupBy(md5(concat_ws(" ",
          slice(split($"text", " "), 1, 10))).as("h"))
        .agg(min($"doc_id").as("keeper"), count(lit(1)).as("n_docs"))
        .filter($"n_docs" > 1)
        .orderBy($"keeper")
    }),

    // Exact dedup, distinct-rows form: survivors per source.
    "llm_dedup_distinct" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"source", $"text").distinct()
        .groupBy($"source").agg(count(lit(1)).as("n_unique"))
        .orderBy($"source")
    }),

    // MinHash+LSH candidate pairs via band-bucket self-join. Routed
    // through the library pipeline, which persists the band table so the
    // shingle-explode + md5-min lineage runs once, not once per join side.
    "llm_minhash_pairs" -> ((s, dir) => {
      import s.implicits._
      graft.api.GraftPipelines
        .minhashCandidates(Tables.documents(s, dir), 3, 8, 4)
        .orderBy($"d1", $"d2")
    }),

    // End-to-end curation: quality gate → exact dedup → verified
    // near-dup drop → token budget (the composed pretraining-corpus
    // pipeline; see GraftPipelines.curate). Output = surviving docs
    // with their token counts.
    "llm_curate" -> ((s, dir) => {
      import s.implicits._
      graft.api.GraftPipelines.curate(Tables.documents(s, dir))
        .select($"doc_id", $"source", $"n_tokens")
        .orderBy($"doc_id")
    }),

    // Five-stage curation: decontaminate (vs the held-out src19 eval
    // set) → quality gate → exact dedup → verified near-dup drop →
    // token budget — the complete production chain in one composition.
    "llm_curate_full" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      graft.api.GraftPipelines.curateClean(
          docs.filter($"source" =!= "src19"),
          docs.filter($"source" === "src19"))
        .select($"doc_id", $"source", $"n_tokens")
        .orderBy($"doc_id")
    }),

    // Cluster-keeper curation: same gates, but the near-dup drop keeps
    // exactly one doc (component min) per VERIFIED-pair connected
    // component — the full-strength policy where the pairwise rule
    // under-deletes on chained dups.
    "llm_curate_clustered" -> ((s, dir) => {
      import s.implicits._
      graft.api.GraftPipelines
        .curate(Tables.documents(s, dir), clusterKeepers = true)
        .select($"doc_id", $"source", $"n_tokens")
        .orderBy($"doc_id")
    }),

    // Incremental ingest dedup: flag each NEW-batch doc (doc_id >= 250)
    // with its count of LSH near-dup candidates in the EXISTING corpus
    // (doc_id < 250) plus a survivor flag — corpus↔corpus and
    // batch↔batch pairs never form. The recurring-pipeline shape: the
    // corpus band table is the persisted index, only the batch re-hashes.
    "llm_dedup_incremental" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      graft.api.GraftPipelines.incrementalDedup(
          docs.filter($"doc_id" < 250), docs.filter($"doc_id" >= 250))
        .orderBy($"batch_id")
    }),

    // MinHash signatures themselves (first two hash mins per doc).
    "llm_minhash_signature" -> ((s, dir) => {
      import s.implicits._
      minhash(s, dir).select($"doc_id", $"h0", $"h1").orderBy($"doc_id")
    }),

    // SimHash value per document.
    "llm_simhash" -> ((s, dir) => {
      import s.implicits._
      simhash(s, dir).select($"doc_id", $"simhash").orderBy($"doc_id")
    }),

    // SimHash near-dup pairs within a source (hamming ≤ 6 of 32 bits).
    // The self-join is keyed on simhash *blocks with one-bit multi-probe*
    // (the permute-and-probe scheme of Manku et al., WWW'07, adapted to
    // 32 bits): split the 32 bits into 4 blocks of 8; if ≤6 bits differ
    // in total, some block differs in ≤1 bit (pigeonhole), so joining
    // block-exact values against {value} ∪ {value ⊕ 2^j} probes finds
    // every qualifying pair. Join cardinality follows 8-bit bucket sizes
    // — O(Σ bucket²/256) — instead of O(docs-per-source²); hamming ≤ 6
    // stays as the residual filter, so results are provably identical to
    // the all-pairs form. The signature table is small (one row/doc) but
    // expensive to derive — localCheckpoint materializes it ONCE for the
    // two join sides without pinning a CacheManager entry for the JVM's
    // life (blocks are GC-reclaimed with the frame; a persist() here
    // let later bench passes time against warm cache).
    "llm_simhash_pairs" -> ((s, dir) =>
      simhashPairsEntry(s, simhash(s, dir).localCheckpoint())),

    // The WIDENED-BLOCK production twin of llm_simhash_pairs: 2 blocks
    // of 16 bits instead of 4×8, with ≤3-bit multi-probe (pigeonhole:
    // hamming ≤ 6 over 2 blocks → some block differs in ≤ 3 bits), so
    // the join keys on 2^16 bucket values instead of 2^8 — bucket
    // occupancy, and with it Σ bucket² candidate pairs, drops 256× at
    // the same corpus, which is how simhash blocking stays linear as
    // data grows (BASELINE.md round-5/7: "block width widens with
    // corpus in production" — now an oracle row, not a note). The 697
    // probe masks (Σ C(16,0..3)) live in a bounded broadcast table, so
    // probe fan-out is a map-side explode against literals; both
    // schemes are LOSSLESS for the hamming ≤ 6 residual, so this entry
    // shares llm_simhash_pairs' all-pairs DuckDB oracle verbatim and
    // must produce the identical pair list.
    "llm_simhash_pairs_wide" -> ((s, dir) =>
      simhashPairsWideEntry(s, simhash(s, dir).localCheckpoint())),

    // Build/serve split of the simhash family — the last near-dup
    // member whose signature table was still derived per query. The
    // one-time fixture ([[simhashIndexServed]]) persists the signature
    // agg; the timed per-run cost is the production (wide-block)
    // candidate join + hamming residual over the doc-count-sized
    // read-back — no text scan, no digest agg. Output and oracle
    // identical to both refit twins (all three are lossless candidate
    // generators for the same hamming ≤ 6 residual).
    "llm_simhash_pairs_served" -> ((s, dir) =>
      simhashPairsWideEntry(s, simhashIndexServed(s, dir).localCheckpoint())),

    // End-to-end near-dup pipeline: LSH candidates → Jaccard verify.
    "llm_neardup_verified" -> ((s, dir) => {
      import s.implicits._
      graft.api.GraftPipelines
        .nearDuplicates(Tables.documents(s, dir), 0.7)
        .orderBy($"d1", $"d2")
    }),

    // The build/serve split of llm_neardup_verified, completing the
    // trilogy (ANN, PPJoin, MinHash): the band index — already THE
    // persisted artifact the incremental ingest loop maintains — is
    // written to parquet once (offline, Bench-warmed, corpus-mtime-
    // keyed); the timed per-run cost is the band self-join over the
    // read-back plus the candidate-bounded Jaccard verify. The corpus
    // TEXT is still read for verification (by design: the index holds
    // hashes, not words), but the expensive shingle→md5→min-per-seed
    // signature derivation never re-runs. Identical output and oracle
    // to llm_neardup_verified.
    "llm_neardup_served" -> ((s, dir) => {
      import s.implicits._
      val idx = buildIndexOnce(dir, "band", "n=3,seeds=8,bands=4") { tmp =>
        graft.api.GraftPipelines.bandIndex(Tables.documents(s, dir))
          .write.parquet(s"$tmp/bands.parquet")
      }
      graft.api.GraftPipelines.nearDuplicatesFromCandidates(
          Tables.documents(s, dir),
          graft.api.GraftPipelines.bandCandidates(
            s.read.parquet(s"$idx/bands.parquet")), 0.7)
        .orderBy($"d1", $"d2")
    }),

    // Duplicate clusters: connected components over the VERIFIED
    // near-dup pairs (transitive closure — A~B, B~C puts A,B,C in one
    // cluster with one keeper, where the naive drop-the-higher-id rule
    // over-deletes). cluster_id = min doc id in the component.
    // This is the cluster chain's REFIT entry — the one place the
    // pair→component derivation runs from the corpus; golden-record,
    // effective-tokens, and the served twin read the buildOnce-
    // persisted label map ([[dupClustersServed]]).
    "llm_dup_clusters" -> ((s, dir) => {
      dupClustersEntry(s, graft.api.GraftPipelines.dupClusters(
        graft.api.GraftPipelines
          .nearDuplicates(Tables.documents(s, dir), 0.7)))
    }),

    // Build/serve twin of llm_dup_clusters: identical output over the
    // READ-BACK persisted label map (shared oracle — a storage
    // refactor). The timed figure is the production per-analysis cost
    // once the chain artifact exists: an id-keyed join against a
    // pair-count-sized table, no shingle→minhash→band→verify refit.
    "llm_dup_clusters_served" -> ((s, dir) =>
      dupClustersEntry(s, dupClustersServed(s, dir))),

    // Retraction maintenance of the dup-cluster map: delete every doc
    // with doc_id % 10 == 7 (a provenance-takedown stand-in) and emit
    // the label map a full rebuild over the remaining corpus would —
    // computed INCREMENTALLY from the persisted chain ([[retractClusters]]:
    // O(pairs) edge retraction, untouched components pass through,
    // CC re-runs only inside deletion-affected components). The oracle
    // recomputes the whole chain over the filtered corpus, so the
    // hash check proves the incremental algebra — including component
    // SPLITS where a deleted doc was the only bridge.
    "llm_dedup_retract" -> ((s, dir) => {
      import s.implicits._
      val (pairs, labels) = dupChainServed(s, dir)
      val del = Tables.documents(s, dir)
        .filter($"doc_id" % 10 === 7).select($"doc_id".as("del_id"))
      dupClustersEntry(s, retractClusters(s, pairs, labels, del))
    }),

    // Ingest maintenance of the dup-cluster map — the ADDITION dual of
    // llm_dedup_retract, and the cluster-level completion of
    // llm_dedup_incremental's per-doc flags: the persisted BASE chain
    // (the first 95% of doc ids at every sf — [[ingestSplitId]], so
    // the batch stays batch-sized as the corpus grows) extends with
    // the batch's verified new pairs (every one has a batch endpoint —
    // candidates come from the persisted band index, d2 >= split cuts
    // corpus↔corpus pairs for free since d1 < d2), components MERGE
    // where a batch doc bridges two base clusters ([[extendChain]]:
    // CC re-runs only over touched components' edges plus the new
    // pairs; untouched labels pass through). Output = the full-corpus
    // cluster map, so the oracle is llm_dup_clusters' full-rebuild SQL
    // VERBATIM — the hash proves the merge algebra end-to-end.
    "llm_dup_clusters_incremental" -> ((s, dir) => {
      import s.implicits._
      val split = ingestSplitId(s, dir)
      val (basePairs, baseLabels) = dupChainBaseServed(s, dir)
      val bands = {
        val idx = buildIndexOnce(dir, "band", "n=3,seeds=8,bands=4") { tmp =>
          graft.api.GraftPipelines.bandIndex(Tables.documents(s, dir))
            .write.parquet(s"$tmp/bands.parquet")
        }
        s.read.parquet(s"$idx/bands.parquet")
      }
      val newPairs = graft.api.GraftPipelines.nearDuplicatesFromCandidates(
        Tables.documents(s, dir),
        graft.api.GraftPipelines.bandCandidatesFromBatch(bands, split),
        0.7)
      dupClustersEntry(s, extendChain(s, basePairs, baseLabels, newPairs))
    }),

    // Combined UPSERT maintenance — one cycle of the real recurring
    // pipeline: a takedown (base docs with doc_id % 10 == 7) AND an
    // ingest batch (the last 5% of doc ids) land in the same window,
    // and the persisted chain is maintained by retract-then-extend
    // ([[upsertChain]]) without re-shingling the corpus. Candidates
    // for the batch's pairs are cut against the delete set (a pair
    // touching a deleted doc must not verify). Output = the cluster
    // map a full rebuild over (base \ deletes) ∪ batch produces — the
    // oracle recomputes exactly that corpus from scratch, so the hash
    // proves the composed algebra including splits AND merges in one
    // step.
    "llm_dedup_upsert" -> ((s, dir) => {
      import s.implicits._
      val split = ingestSplitId(s, dir)
      val (basePairs, baseLabels) = dupChainBaseServed(s, dir)
      val del = Tables.documents(s, dir)
        .filter($"doc_id" < split && $"doc_id" % 10 === 7)
        .select($"doc_id".as("del_id"))
      val bands = {
        val idx = buildIndexOnce(dir, "band", "n=3,seeds=8,bands=4") { tmp =>
          graft.api.GraftPipelines.bandIndex(Tables.documents(s, dir))
            .write.parquet(s"$tmp/bands.parquet")
        }
        s.read.parquet(s"$idx/bands.parquet")
      }
      val newPairs = graft.api.GraftPipelines.nearDuplicatesFromCandidates(
        Tables.documents(s, dir),
        graft.api.GraftPipelines.bandCandidatesFromBatch(bands, split)
          .filter(!($"d1" < split && $"d1" % 10 === 7)), 0.7)
      dupClustersEntry(s,
        upsertChain(s, basePairs, baseLabels, del, newPairs)._2)
    }),

    // Leakage-safe train/val/test split: the assignment unit is the
    // VERIFIED near-dup cluster, not the document. Per-doc hashing
    // (llm_split) routinely lands two near-identical docs on opposite
    // sides of the train/eval wall — contamination that the
    // decontaminate gate then has to catch after the fact; assigning
    // by the salted hash of the CLUSTER id (component-min doc id,
    // inherited by every member) makes near-dups co-travel by
    // construction. Docs outside any verified pair hash by their own
    // id — bitwise the llm_split rule, so the two entries agree
    // everywhere dedup found nothing. Serves from the persisted
    // dup-chain label map: at 100 TB this is one id-keyed join against
    // a pair-count-sized table plus the same map-side bucket rule —
    // the split NEVER re-runs the dedup.
    "llm_split_leakage_safe" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir).select($"doc_id")
      val labels = dupClustersServed(s, dir)
        .select($"doc_id", $"cluster_id")
      val units = docs.join(labels, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"cluster_id", $"doc_id").as("split_unit"))
      graft.api.GraftPipelines.hashSplit(units, id = "split_unit")
        .select($"doc_id", $"split_unit", $"split")
        .orderBy($"doc_id")
    }),

    // Golden record (survivorship): collapse each duplicate cluster to
    // ONE canonical record by explicit, deterministic survivorship
    // rules — the master-data step that follows clustering in every ER
    // pipeline (and the "which copy do we train on" decision in corpus
    // dedup). Rules: canonical text = longest (ties → lowest doc id);
    // lang = most frequent (ties → lexicographically first); plus
    // cluster provenance stats. All three aggregates ride the SAME
    // cluster_id shuffle layout; the doc join is id-keyed. Window
    // tie-breaks are total orders, so results are deterministic at any
    // parallelism.
    "llm_golden_record" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      // reads the buildOnce-persisted label map (see dupClustersServed)
      val clusters = dupClustersServed(s, dir)
      val docsj = clusters
        .join(docs.select($"doc_id", $"lang", $"source", $"n_chars"), "doc_id")
      val wSurv = Window.partitionBy($"cluster_id")
        .orderBy($"n_chars".desc, $"doc_id")
      val surv = docsj
        .withColumn("rn", row_number().over(wSurv)).filter($"rn" === 1)
        .select($"cluster_id", $"doc_id".as("canon_doc"),
          $"n_chars".as("canon_chars"))
      val wLang = Window.partitionBy($"cluster_id")
        .orderBy($"lc".desc, $"lang")
      val lng = docsj.groupBy($"cluster_id", $"lang")
        .agg(count(lit(1)).as("lc"))
        .withColumn("rn", row_number().over(wLang)).filter($"rn" === 1)
        .select($"cluster_id", $"lang".as("lang_consensus"))
      docsj.groupBy($"cluster_id")
        .agg(count(lit(1)).as("csize"),
          countDistinct($"source").as("n_sources"),
          sum($"n_chars").as("total_chars"))
        .join(surv, "cluster_id").join(lng, "cluster_id")
        .select($"cluster_id", $"csize", $"canon_doc", $"canon_chars",
          $"lang_consensus", $"n_sources", $"total_chars")
        .orderBy($"cluster_id")
    }),

    // Sub-document span dedup: chunk every doc into fixed 10-word
    // windows (stride 10, trailing partial dropped) and report each
    // doc's fraction of chunks that also appear verbatim in ANOTHER
    // doc — the span-level scrub (boilerplate headers, licence blocks)
    // that doc-level near-dup misses. Chunk identity is md5, grouping
    // is chunk-hash keyed — shuffle-bounded at any scale.
    "llm_span_dedup" -> ((s, dir) => {
      import s.implicits._
      // split once into a named column: the transform's lambda used to
      // call split(text) PER CHUNK (O(words²/10) per doc), and the
      // explode's implicit non-empty filter re-ran the whole chain
      // twice more — outer explode + the hoisted array remove both
      val tagged = Tables.documents(s, dir)
        .select($"doc_id", split($"text", " ").as("wds"))
        .filter(size($"wds") >= 10)
        .select($"doc_id", explode_outer(expr(
          "transform(sequence(1, size(wds) div 10), " +
            "i -> concat_ws(' ', slice(wds, (i-1)*10+1, 10)))"))
          .as("chunk"))
        .select($"doc_id", md5($"chunk").as("h"))
      val dupH = tagged.groupBy($"h")
        .agg(countDistinct($"doc_id").as("nd"))
        .filter($"nd" > 1).select($"h", lit(1).as("isdup"))
      tagged.join(dupH, Seq("h"), "left")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(coalesce($"isdup", lit(0))).as("n_dup_chunks"))
        .withColumn("dup_frac",
          $"n_dup_chunks".cast("double") / $"n_chunks")
        .orderBy($"doc_id")
    }),

    // Benchmark decontamination: 5-gram overlap of every corpus doc
    // (sources src0..src18) against the held-out eval set (src19) —
    // the leak check every pretraining corpus runs before training.
    "llm_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      graft.api.GraftPipelines.decontaminate(
          docs.filter($"source" =!= "src19"),
          docs.filter($"source" === "src19"), 5)
        .orderBy($"doc_id")
    }),

    // llm_decontaminate with the corpus-side Bloom pre-prune (see
    // GraftPipelines.bloomDecontaminate): the eval suite's gram set
    // compresses into a ~300 KB Bloom filter probed inside the
    // codegen'd scan filter, so at 100 TB the gram join's corpus-side
    // exchange carries probable hits only, not every corpus gram. The
    // result is bit-identical to the plain entry — same oracle SQL.
    "llm_bloom_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      graft.api.GraftPipelines.bloomDecontaminate(
          docs.filter($"source" =!= "src19"),
          docs.filter($"source" === "src19"), 5)
        .orderBy($"doc_id")
    }),

    // n-gram Jaccard similarity for adjacent docs within a source —
    // the verify step a MinHash candidate pair would go through.
    "llm_jaccard_adjacent" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"source").orderBy($"doc_id")
      Tables.documents(s, dir)
        .select($"doc_id", $"source",
          array_distinct(split($"text", " ")).as("wset"))
        .withColumn("d2", lead($"doc_id", 1).over(w))
        .withColumn("wset2", lead($"wset", 1).over(w))
        .filter($"d2".isNotNull)
        .select($"source", $"doc_id".as("d1"), $"d2",
          size(array_intersect($"wset", $"wset2")).as("n_common"),
          size(array_distinct(concat($"wset", $"wset2"))).as("n_union"))
        .withColumn("jaccard",
          $"n_common".cast("double") / $"n_union")
        .orderBy($"d1")
    }),

    // PPJoin-style exact set-similarity join (prefix filtering:
    // Chaudhuri et al. ICDE'06 / Xiao et al. WWW'08) — the EXACT
    // complement to the MinHash family: every pair with shingle-set
    // Jaccard ≥ 1/2 is returned with its true similarity, no sketch
    // recall loss. Sets are distinct word-3-shingles ordered by
    // (global df ASC, shingle) — rarest first; a doc's PREFIX is its
    // first |t| − ceil(|t|/2) + 1 tokens, and two sets can reach the
    // threshold only if their prefixes share a token, so the self-join
    // key is rare-shingle collisions (candidate count is bounded by
    // Σ_prefix-token block², the same Σ bucket² discipline as every
    // candidate generator here — never all-pairs). Verification is the
    // exact intersection count on candidates only, and the threshold
    // test is cross-multiplied to integers: jac ≥ 1/2 ⟺ 3·|∩| ≥
    // |a|+|b| — no float compare. jac_x1000 is truncating int division
    // (div ≡ //).
    "llm_ppjoin" -> ((s, dir) => {
      import s.implicits._
      // The distinct token table and the df-ordered prefix index are
      // each materialized ONCE (localCheckpoint) — they are index
      // artifacts a production deployment persists (the band-index
      // pattern), and every downstream use (candidate join + two-sided
      // verify) reads the materialized form instead of re-running the
      // explode/distinct/window chain per use.
      graft.api.GraftPipelines
        .ppjoinPairs(Tables.documents(s, dir), num = 1, den = 2)
        .orderBy($"a_id", $"b_id")
    }),

    // The build/serve split of llm_ppjoin, same pattern as
    // llm_embed_pq_served / llm_embed_ivf_served: the shingle table
    // and df-ordered prefix index are written to parquet ONCE (an
    // offline job — Bench warms the fixture outside the timed region,
    // keyed on the corpus mtime so a regenerated corpus never serves a
    // stale index), and the timed query is the production per-run
    // cost: candidate + verify joins over the READ-BACK index.
    // Identical output and oracle to llm_ppjoin — the serve path is a
    // storage refactor, not a semantic one; unlike localCheckpoint
    // blocks the parquet artifacts survive executor loss.
    "llm_ppjoin_served" -> ((s, dir) => {
      import s.implicits._
      val (toks, pref) = ppjoinIndexServed(s, dir)
      graft.api.GraftPipelines
        .ppjoinPairsFromIndex(toks, pref, num = 1, den = 2)
        .orderBy($"a_id", $"b_id")
    }),

    // MinHash/LSH recall, MEASURED against the exact truth — the dedup
    // twin of llm_ann_recall: with PPJoin's lossless θ≥1/2 shingle
    // pairs as ground truth, what fraction does the 8-seed/4-band LSH
    // candidate generator surface? The number every sketch-dedup
    // deployment must know before trusting its miss rate (banding
    // theory predicts recall from (seeds, bands, θ); this MEASURES it
    // on the corpus, and the measurement itself is oracle-checked).
    // Both sides are bounded pair sets; the comparison is one keyed
    // left join + a 1-row aggregate.
    "llm_minhash_recall" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      // truth read back from the write-once pair set (ppjoinTruthServed)
      val exact = ppjoinTruthServed(s, dir)
        .select($"a_id".as("d1"), $"b_id".as("d2"))
      val cands = graft.api.GraftPipelines.minhashCandidates(docs)
      exact.join(cands.withColumn("hit", lit(1L)), Seq("d1", "d2"), "left")
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce($"hit", lit(0L))).as("n_hit"))
        .select($"n_exact", $"n_hit",
          expr("(1000 * n_hit) div n_exact").as("recall_x1000"))
    }),

    // LSH band-tuning curve: the S-curve measurement behind the "which
    // banding do I run?" decision. The SAME 8-hash signature is sliced
    // three ways — 8 bands × 1 row (recall-max), 4 × 2 (the committed
    // production scheme), 2 × 4 (precision-max) — and each config is
    // scored against the exact θ≥1/2 PPJoin truth set: candidate mass,
    // recall, and candidate precision. The signature is computed ONCE
    // and persisted (one shingle-explode + md5-min pass feeds all three
    // band joins); the truth set likewise. At 100 TB this runs on a
    // SAMPLE and the chosen (b, r) goes into the production dedup —
    // exactly how the committed 4×2 scheme and the simhash/knn "widen"
    // twins were justified, now as a first-class queryable audit.
    "llm_lsh_tuning" -> ((s, dir) => {
      import s.implicits._
      // localCheckpoint (eager), not persist+count: the returned plan
      // references both tables, so a persist here could never be
      // unpersisted and would pin CacheManager entries for the whole
      // session — later bench iterations would then time against warm
      // cache. Checkpointed blocks are ContextCleaner-reclaimable once
      // the plan is dropped (the ppjoinIndexServed / rel_incremental_topk
      // pattern).
      val sig = minhash(s, dir).localCheckpoint()
      // truth read back from the write-once pair set (ppjoinTruthServed)
      val exact = ppjoinTruthServed(s, dir)
        .select($"a_id".as("d1"), $"b_id".as("d2")).localCheckpoint()
      val rows = Seq((8, 1), (4, 2), (2, 4)).map { case (b, r) =>
        val cands = graft.api.GraftPipelines.bandCandidates(
          graft.api.GraftPipelines.lshBands(sig, b, r))
        val nCand = cands.agg(count(lit(1)).as("n_candidates"))
        exact.join(cands.withColumn("hit", lit(1L)), Seq("d1", "d2"),
            "left")
          .agg(count(lit(1)).as("n_exact"),
            sum(coalesce($"hit", lit(0L))).as("n_hit"))
          .crossJoin(nCand)
          .select(lit(b).as("n_bands"), lit(r).as("rows_per_band"),
            $"n_candidates", $"n_exact", $"n_hit",
            expr("(1000 * n_hit) div n_exact").as("recall_x1000"),
            expr("CASE WHEN n_candidates = 0 THEN NULL " +
              "ELSE (1000 * n_hit) div n_candidates END")
              .as("precision_x1000"))
      }
      rows.reduce(_.unionByName(_)).orderBy($"n_bands".desc)
    }),

    // Cross-source duplication matrix: PPJoin's exact θ≥1/2 pairs
    // rolled up to (source_a, source_b) — the "which crawls overlap
    // each other" audit that decides what to ingest next (within-source
    // cells = internal redundancy, off-diagonal = cross-crawl overlap).
    // Sources are ordered lexically per pair so the matrix is upper-
    // triangular and deterministic; the |sources|² output is bounded,
    // and the doc→source lookup joins on doc_id AFTER the pair set is
    // formed — the corpus never re-shuffles for the rollup.
    "llm_dup_matrix" -> ((s, dir) => {
      import s.implicits._
      val src = Tables.documents(s, dir).select($"doc_id", $"source")
      // rides the write-once exact pair SET (ppjoinTruthServed) — the
      // rollup is O(pairs); rebuilding even the probe per query was
      // the heaviest non-ppjoin constant at sf1 (11.9 s measured)
      ppjoinTruthServed(s, dir)
        .join(src.as("sa"), $"sa.doc_id" === $"a_id")
        .join(src.as("sb"), $"sb.doc_id" === $"b_id")
        .select(least($"sa.source", $"sb.source").as("src_lo"),
          greatest($"sa.source", $"sb.source").as("src_hi"),
          $"jac_x1000")
        .groupBy($"src_lo", $"src_hi")
        .agg(count(lit(1)).as("n_pairs"), max($"jac_x1000").as("max_jac"))
        .orderBy($"src_lo", $"src_hi")
    }),

    // Fuzzy entity resolution, blocked-join form: catalog-name variants
    // within edit distance 3. DICTIONARY-FIRST — the map-side-combined
    // distinct-name aggregate shrinks the pairing problem from rows to
    // entities (64 names for 2,000 parts here; the same ratio holds for
    // real catalogs), then a blocked self-join (first char × length
    // band) bounds candidates at Σ block² — never all-pairs. The
    // codegen'd levenshtein runs only on within-block candidates. At
    // 100 TB: widen the block key (more prefix chars / soundex) to keep
    // Σ block² linear; the dictionary stays broadcast-size long after
    // the corpus doesn't.
    "llm_fuzzy_pairs" -> ((s, dir) => {
      import s.implicits._
      graft.api.GraftPipelines
        .fuzzyBlockedPairs(Tables.part(s, dir), "p_name", maxDist = 3)
        .orderBy($"name_a", $"name_b")
    }),

    // Fuzzy entity resolution, sorted-neighborhood form (Hernández &
    // Stolfo SIGMOD'95): sort the entity dictionary, compare each name
    // only to its w=2 successors — LINEAR in entities instead of
    // Σ block². The window partitions by a first-char block (never a
    // global unpartitioned sort); at scale the block key doubles as the
    // range-partitioning key, so each partition sorts locally.
    // Complementary recall to llm_fuzzy_pairs by construction: SNM
    // catches pairs straddling a length band ("hot ring"/"hot rod"
    // land in different /4 bands), the blocked join catches similar
    // names that sort far apart ("blue bolt"/"blue rod") — a
    // production pipeline unions both candidate sets.
    "llm_sorted_neighborhood" -> ((s, dir) => {
      import s.implicits._
      graft.api.GraftPipelines
        .sortedNeighborhoodPairs(Tables.part(s, dir), "p_name",
          window = 2, maxDist = 3)
        .orderBy($"name_a", $"name_b")
    }),

    // Boilerplate SCRUB — the rewrite completion of llm_span_dedup
    // (which only SCORES chunk duplication): C4-style removal of
    // corpus-frequent spans (Raffel et al. 2020 drop lines shared by
    // ≥3 pages; here the unit is the 10-word chunk, the corpus has no
    // newlines). Every doc is re-emitted with its boilerplate chunks
    // deleted and the survivors rejoined in order — licence blocks,
    // shared headers, templated footers disappear from the training
    // text instead of merely being counted. Plan shape at 100 TB:
    //   1. chunk + hash (narrow — no shuffle),
    //   2. ONE hash-keyed shuffle for the frequency count
    //      (partial-agg'd map-side; countDistinct(doc_id) is the
    //      standard two-phase expand),
    //   3. the ≥3-docs filter usually leaves a small boilerplate set
    //      (in practice the few templated spans) that stats/AQE
    //      broadcast back, tagging the corpus-sized chunk table
    //      WITHOUT a second shuffle — but the bound is only chunks/3,
    //      corpus-scaled on pathological crawl data, so the broadcast
    //      is deliberately NOT a hard hint (see the join below),
    //   4. one doc_id shuffle to reassemble — the unavoidable
    //      rewrite pass, same size as the corpus itself.
    // Chunking runs twice (freq pass + tag pass) on purpose: re-doing
    // cheap narrow CPU beats pinning an exploded corpus-sized chunk
    // table in executor storage.
    "llm_boilerplate_scrub" -> ((s, dir) => {
      import s.implicits._
      // hoisted split + outer explode, same rationale as llm_span_dedup
      def chunks = Tables.documents(s, dir)
        .select($"doc_id", split($"text", " ").as("wds"))
        .select($"doc_id", posexplode_outer(expr(
          "transform(sequence(0, cast(ceil(size(wds) / 10.0) as int) - 1), " +
            "i -> concat_ws(' ', slice(wds, i*10+1, 10)))"))
          .as(Seq("pos", "chunk")))
        .withColumn("h", md5($"chunk"))
      val boiler = chunks.groupBy($"h")
        .agg(countDistinct($"doc_id").as("nd"))
        .filter($"nd" >= 3)
        .select($"h", lit(1).as("bp"))
      // No broadcast hint: the >=3-doc chunk set is bounded only by
      // chunks/3 — corpus-scaled on heavily templated crawl data, so a
      // HARD broadcast would risk driver OOM at 100 TB (the same "never
      // broadcast a data-scaled table" rule as minhashCandidates).
      // Stats decide instead: at any sane boilerplate density the agg
      // output is far under autoBroadcastJoinThreshold and the planner
      // (or AQE at runtime, once real sizes are known) broadcasts it;
      // on pathological corpora it degrades to a shuffle join rather
      // than an OOM. DedupOpsSpec pins the small-scale broadcast plan.
      chunks.join(boiler, Seq("h"), "left")
        .withColumn("keep", $"bp".isNull)
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(when($"keep", 0L).otherwise(1L)).as("n_removed"),
          concat_ws(" ", expr(
            "transform(filter(sort_array(collect_list(struct(pos, keep, chunk))), " +
              "x -> x.keep), x -> x.chunk)")).as("clean_text"))
        .orderBy($"doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "llm_dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY h""".stripMargin,

    "llm_dedup_normalized" ->
      """SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
        |         '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS h,
        | min(doc_id) AS keeper, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY h""".stripMargin,

    "llm_effective_tokens" ->
      s"""WITH RECURSIVE $shinglesSql, $minhashSql, $bandsSql,
         |$clusterChainSql,
         |tok AS (SELECT doc_id, source,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws
         |  FROM documents),
         |lab AS (SELECT t.doc_id, t.source, t.n_ws,
         |  coalesce(c.cluster_id, t.doc_id) AS cluster_id
         |  FROM tok t LEFT JOIN clusters c USING (doc_id))
         |SELECT source, count(*) AS n_docs,
         | CAST(sum(n_ws) AS BIGINT) AS total_tokens,
         | CAST(sum(CASE WHEN doc_id = cluster_id THEN n_ws ELSE 0 END)
         |   AS BIGINT) AS effective_tokens,
         | CAST((1000 * sum(CASE WHEN doc_id = cluster_id THEN n_ws
         |   ELSE 0 END)) // sum(n_ws) AS BIGINT) AS eff_x1000
         |FROM lab GROUP BY source ORDER BY source""".stripMargin,

    // Same prefix-filter construction as the engine (complete by the
    // pigeonhole argument in GraftPipelines.containmentPairs, so it IS
    // the exact answer) — the ppjoin-oracle precedent: candidates from
    // the contained side's prefix against the container's full tokens.
    // The served twin writes exactly the refit's rows — shared oracle.
    "llm_containment_join" -> containmentOracleSql,
    "llm_containment_served" -> containmentOracleSql,
    "llm_dedup_prefix" ->
      """SELECT md5(array_to_string(w[1:10], ' ')) AS h,
        | min(doc_id) AS keeper, count(*) AS n_docs
        |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |GROUP BY 1 HAVING count(*) > 1 ORDER BY keeper""".stripMargin,

    "llm_dedup_distinct" ->
      """SELECT source, count(*) AS n_unique
        |FROM (SELECT DISTINCT source, text FROM documents)
        |GROUP BY source ORDER BY source""".stripMargin,

    "llm_minhash_pairs" ->
      s"""WITH $shinglesSql, $minhashSql, $bandsSql
         |SELECT DISTINCT l.doc_id AS d1, r.doc_id AS d2
         |FROM bands l JOIN bands r ON l.b = r.b AND l.doc_id < r.doc_id
         |ORDER BY d1, d2""".stripMargin,

    "llm_minhash_signature" ->
      s"""WITH $shinglesSql, $minhashSql
         |SELECT doc_id, h0, h1 FROM mh ORDER BY doc_id""".stripMargin,

    "llm_dedup_incremental" ->
      s"""WITH $shinglesSql, $minhashSql, $bandsSql,
         |pairs AS (
         |  SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
         |  FROM bands b JOIN bands c ON b.b = c.b
         |  WHERE b.doc_id >= 250 AND c.doc_id < 250)
         |SELECT d.doc_id AS batch_id,
         | coalesce(n, 0) AS n_corpus_dups,
         | CAST(CASE WHEN coalesce(n, 0) = 0 THEN 1 ELSE 0 END AS INTEGER)
         |   AS is_new
         |FROM (SELECT doc_id FROM documents WHERE doc_id >= 250) d
         |LEFT JOIN (SELECT batch_id, count(*) AS n FROM pairs GROUP BY 1) p
         |  ON d.doc_id = p.batch_id
         |ORDER BY batch_id""".stripMargin,

    "llm_curate" ->
      s"""WITH $curatePrefixSql,
         |drops AS (SELECT DISTINCT d2 FROM vpairs)
         |SELECT doc_id, source,
         | CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
         |FROM exact
         |WHERE doc_id NOT IN (SELECT d2 FROM drops)
         |ORDER BY doc_id""".stripMargin,

    // Decontamination pre-gate composed onto the curate chain (the
    // 5-gram overlap CTEs mirror llm_decontaminate; the curate chain is
    // rooted at the cleaned base relation).
    "llm_curate_full" -> {
      val gram5 =
        "w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]"
      def grams(pred: String) =
        s"""SELECT DISTINCT doc_id,
           |   CAST(md5_number_lower(s) % 1152921504606846976 AS BIGINT) AS g
           |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(w) - 3),
           |           i -> $gram5)) AS s
           |        FROM (SELECT doc_id, string_split(text, ' ') AS w
           |              FROM documents WHERE $pred)
           |        WHERE len(w) >= 5)""".stripMargin
      s"""WITH cg AS (${grams("source <> 'src19'")}),
         |eg AS (SELECT DISTINCT g FROM (${grams("source = 'src19'")})),
         |contaminated AS (SELECT DISTINCT cg.doc_id FROM cg JOIN eg USING (g)),
         |base AS (
         |  SELECT * FROM documents WHERE source <> 'src19'
         |   AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
         |${curatePrefixSqlFrom("base")},
         |drops AS (SELECT DISTINCT d2 FROM vpairs)
         |SELECT doc_id, source,
         | CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
         |FROM exact
         |WHERE doc_id NOT IN (SELECT d2 FROM drops)
         |ORDER BY doc_id""".stripMargin
    },

    // Same gates; the drop step is the connected-component closure over
    // the verified pairs (keep only each component's min id).
    "llm_curate_clustered" ->
      s"""WITH RECURSIVE $curatePrefixSql,
         |edges AS (
         |  SELECT d1 AS a, d2 AS b FROM vpairs
         |  UNION SELECT d2, d1 FROM vpairs),
         |reach(a, b) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |drops AS (
         |  SELECT a AS doc_id FROM reach GROUP BY a HAVING a <> min(b))
         |SELECT doc_id, source,
         | CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
         |FROM exact
         |WHERE doc_id NOT IN (SELECT doc_id FROM drops)
         |ORDER BY doc_id""".stripMargin,

    "llm_simhash" ->
      s"""WITH $simhashSql
         |SELECT doc_id, simhash FROM sh ORDER BY doc_id""".stripMargin,

    "llm_simhash_pairs" ->
      s"""WITH $simhashSql
         |SELECT l.doc_id AS d1, r.doc_id AS d2,
         | CAST(bit_count(xor(l.simhash, r.simhash)) AS INTEGER) AS hamming
         |FROM sh l JOIN sh r ON l.source = r.source AND l.doc_id < r.doc_id
         |WHERE bit_count(xor(l.simhash, r.simhash)) <= 6
         |ORDER BY d1, d2""".stripMargin,

    // same all-pairs mirror: every block scheme (and the served
    // signature read-back) is a lossless candidate generator for the
    // identical hamming <= 6 residual
    "llm_simhash_pairs_served" ->
      s"""WITH $simhashSql
         |SELECT l.doc_id AS d1, r.doc_id AS d2,
         | CAST(bit_count(xor(l.simhash, r.simhash)) AS INTEGER) AS hamming
         |FROM sh l JOIN sh r ON l.source = r.source AND l.doc_id < r.doc_id
         |WHERE bit_count(xor(l.simhash, r.simhash)) <= 6
         |ORDER BY d1, d2""".stripMargin,

    "llm_simhash_pairs_wide" ->
      s"""WITH $simhashSql
         |SELECT l.doc_id AS d1, r.doc_id AS d2,
         | CAST(bit_count(xor(l.simhash, r.simhash)) AS INTEGER) AS hamming
         |FROM sh l JOIN sh r ON l.source = r.source AND l.doc_id < r.doc_id
         |WHERE bit_count(xor(l.simhash, r.simhash)) <= 6
         |ORDER BY d1, d2""".stripMargin,

    "llm_neardup_verified" -> neardupOracleSql,

    // identical mirror: the serve path reads the persisted band index
    // but candidates — and therefore verified pairs — must be identical
    "llm_neardup_served" -> neardupOracleSql,

    "llm_span_dedup" ->
      """WITH ch AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(w) // 10 + 1),
        |           i -> array_to_string(w[(i-1)*10+1 : (i-1)*10+10], ' '))) AS chunk
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 10),
        |t AS (SELECT doc_id, md5(chunk) AS h FROM ch),
        |d AS (SELECT h FROM t GROUP BY h HAVING count(DISTINCT doc_id) > 1)
        |SELECT doc_id, count(*) AS n_chunks,
        | CAST(sum(CASE WHEN h IN (SELECT h FROM d) THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_dup_chunks,
        | CAST(sum(CASE WHEN h IN (SELECT h FROM d) THEN 1 ELSE 0 END)
        |   AS DOUBLE) / count(*) AS dup_frac
        |FROM t GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "llm_decontaminate" -> decontaminateOracleSql,

    // Bit-identical to llm_decontaminate by construction (the Bloom
    // pre-prune has no false negatives and the exact confirm join
    // removes false positives), so the two entries share one oracle —
    // the same twin-oracle contract as the *_served family.
    "llm_bloom_decontaminate" -> decontaminateOracleSql,

    // Transitive closure (small at test scale) mirrors the engine's
    // min-label-propagation connected components exactly: both define
    // cluster_id = min doc id reachable through verified pairs.
    "llm_dup_clusters" -> dupClustersOracleSql,
    // read-back of the persisted label map ≡ the refit (buildOnce
    // writes exactly dupClusters' rows) — shared oracle
    "llm_dup_clusters_served" -> dupClustersOracleSql,
    "llm_dedup_retract" -> dedupRetractOracleSql,
    "llm_dup_clusters_incremental" -> dupClustersOracleSql,
    "llm_dedup_upsert" -> dedupUpsertOracleSql,

    "llm_golden_record" ->
      s"""WITH RECURSIVE $shinglesSql, $minhashSql, $bandsSql,
         |$clusterChainSql,
         |docsj AS (
         |  SELECT c.doc_id, c.cluster_id, d.lang, d.source, d.n_chars
         |  FROM clusters c JOIN documents d USING (doc_id)),
         |surv AS (
         |  SELECT cluster_id, doc_id AS canon_doc, n_chars AS canon_chars
         |  FROM (SELECT cluster_id, doc_id, n_chars,
         |         row_number() OVER (PARTITION BY cluster_id
         |           ORDER BY n_chars DESC, doc_id) AS rn
         |        FROM docsj) WHERE rn = 1),
         |lng AS (
         |  SELECT cluster_id, lang AS lang_consensus
         |  FROM (SELECT cluster_id, lang,
         |         row_number() OVER (PARTITION BY cluster_id
         |           ORDER BY count(*) DESC, lang) AS rn
         |        FROM docsj GROUP BY cluster_id, lang) WHERE rn = 1)
         |SELECT cluster_id, count(*) AS csize, canon_doc, canon_chars,
         | lang_consensus,
         | CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         | CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM docsj JOIN surv USING (cluster_id) JOIN lng USING (cluster_id)
         |GROUP BY cluster_id, canon_doc, canon_chars, lang_consensus
         |ORDER BY cluster_id""".stripMargin,

    "llm_jaccard_adjacent" ->
      """SELECT source, d1, d2, n_common, n_union,
        | CAST(n_common AS DOUBLE) / n_union AS jaccard
        |FROM (
        |  SELECT source, doc_id AS d1,
        |   lead(doc_id) OVER w AS d2,
        |   CAST(len(list_intersect(wset, lead(wset) OVER w)) AS INTEGER) AS n_common,
        |   CAST(len(list_distinct(list_concat(wset, lead(wset) OVER w))) AS INTEGER) AS n_union
        |  FROM (SELECT doc_id, source,
        |         list_distinct(string_split(text, ' ')) AS wset FROM documents)
        |  WINDOW w AS (PARTITION BY source ORDER BY doc_id))
        |WHERE d2 IS NOT NULL ORDER BY d1""".stripMargin,

    "llm_ppjoin" -> ppjoinOracleSql,

    // identical mirror: the serve path is a storage refactor of the
    // same lossless join, so the hash compare proves read-back
    // equivalence
    "llm_ppjoin_served" -> ppjoinOracleSql,

    "llm_minhash_recall" ->
      s"""WITH $shinglesSql, $minhashSql, $bandsSql,
         |cands AS (
         |  SELECT DISTINCT l.doc_id AS d1, r.doc_id AS d2
         |  FROM bands l JOIN bands r ON l.b = r.b AND l.doc_id < r.doc_id),
         |toks AS (SELECT DISTINCT doc_id, s FROM sh),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
         |inter AS (
         |  SELECT ta.doc_id AS d1, tb.doc_id AS d2, count(*) AS i
         |  FROM toks ta JOIN toks tb
         |    ON ta.s = tb.s AND ta.doc_id < tb.doc_id
         |  GROUP BY 1, 2),
         |exact AS (
         |  SELECT d1, d2 FROM inter
         |  JOIN sizes sa ON sa.doc_id = d1
         |  JOIN sizes sb ON sb.doc_id = d2
         |  WHERE 3 * i >= sa.sz + sb.sz)
         |SELECT count(*) AS n_exact,
         | CAST(sum(CASE WHEN c.d1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_hit,
         | (1000 * CAST(sum(CASE WHEN c.d1 IS NOT NULL THEN 1 ELSE 0 END)
         |          AS BIGINT)) // count(*) AS recall_x1000
         |FROM exact e LEFT JOIN cands c ON e.d1 = c.d1 AND e.d2 = c.d2""".stripMargin,

    // three band slicings of the one signature vs the exact PPJoin
    // truth set (toks/sizes/inter/exact mirror llm_minhash_recall)
    "llm_lsh_tuning" -> {
      def cfg(nb: Int, r: Int) = {
        val t = s"bands${nb}x$r"
        s"""c$t AS (
           |  SELECT DISTINCT l.doc_id AS d1, r.doc_id AS d2
           |  FROM $t l JOIN $t r ON l.b = r.b AND l.doc_id < r.doc_id),
           |m$t AS (
           |  SELECT $nb AS n_bands, $r AS rows_per_band,
           |   (SELECT count(*) FROM c$t) AS n_candidates,
           |   (SELECT count(*) FROM exact) AS n_exact,
           |   (SELECT count(*) FROM exact e JOIN c$t c
           |      ON e.d1 = c.d1 AND e.d2 = c.d2) AS n_hit)""".stripMargin
      }
      s"""WITH $shinglesSql, $minhashSql,
         |${bandsSqlCfg(8, 1, "bands8x1")},
         |${bandsSqlCfg(4, 2, "bands4x2")},
         |${bandsSqlCfg(2, 4, "bands2x4")},
         |toks AS (SELECT DISTINCT doc_id, s FROM sh),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
         |inter AS (
         |  SELECT ta.doc_id AS d1, tb.doc_id AS d2, count(*) AS i
         |  FROM toks ta JOIN toks tb
         |    ON ta.s = tb.s AND ta.doc_id < tb.doc_id
         |  GROUP BY 1, 2),
         |exact AS (
         |  SELECT d1, d2 FROM inter
         |  JOIN sizes sa ON sa.doc_id = d1
         |  JOIN sizes sb ON sb.doc_id = d2
         |  WHERE 3 * i >= sa.sz + sb.sz),
         |${cfg(8, 1)},
         |${cfg(4, 2)},
         |${cfg(2, 4)}
         |SELECT n_bands, rows_per_band, n_candidates, n_exact, n_hit,
         | (1000 * n_hit) // n_exact AS recall_x1000,
         | CASE WHEN n_candidates = 0 THEN NULL
         |      ELSE (1000 * n_hit) // n_candidates END AS precision_x1000
         |FROM (SELECT * FROM mbands8x1 UNION ALL
         |      SELECT * FROM mbands4x2 UNION ALL
         |      SELECT * FROM mbands2x4)
         |ORDER BY n_bands DESC""".stripMargin
    },

    // cluster-unit split: clusters CTE = the verified-pair components;
    // singletons fall through to their own id (the llm_split rule)
    "llm_split_leakage_safe" ->
      s"""WITH RECURSIVE $shinglesSql, $minhashSql, $bandsSql,
         |$clusterChainSql,
         |u AS (
         |  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS split_unit
         |  FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id)
         |SELECT doc_id, split_unit,
         | CASE WHEN b < 800 THEN 'train' WHEN b < 900 THEN 'val'
         |      ELSE 'test' END AS split
         |FROM (SELECT doc_id, split_unit,
         |       CAST(md5_number_lower('spl|' || CAST(split_unit AS VARCHAR))
         |            % 1152921504606846976 AS BIGINT) % 1000 AS b
         |      FROM u)
         |ORDER BY doc_id""".stripMargin,

    "llm_dup_matrix" ->
      s"""WITH $shinglesSql,
         |toks AS (SELECT DISTINCT doc_id, s FROM sh),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
         |inter AS (
         |  SELECT ta.doc_id AS a_id, tb.doc_id AS b_id, count(*) AS i
         |  FROM toks ta JOIN toks tb
         |    ON ta.s = tb.s AND ta.doc_id < tb.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT a_id, b_id,
         |   (1000 * i) // (sa.sz + sb.sz - i) AS jac_x1000
         |  FROM inter JOIN sizes sa ON sa.doc_id = a_id
         |  JOIN sizes sb ON sb.doc_id = b_id
         |  WHERE 3 * i >= sa.sz + sb.sz)
         |SELECT least(da.source, db.source) AS src_lo,
         | greatest(da.source, db.source) AS src_hi,
         | count(*) AS n_pairs, max(jac_x1000) AS max_jac
         |FROM pairs JOIN documents da ON da.doc_id = a_id
         |JOIN documents db ON db.doc_id = b_id
         |GROUP BY 1, 2 ORDER BY src_lo, src_hi""".stripMargin,

    "llm_fuzzy_pairs" ->
      """WITH names AS (
        |  SELECT p_name, count(*) AS n_items FROM part GROUP BY p_name)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        | CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist,
        | a.n_items AS n_a, b.n_items AS n_b
        |FROM names a JOIN names b
        | ON substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
        | AND CAST(floor(length(a.p_name) / 4) AS INTEGER)
        |   = CAST(floor(length(b.p_name) / 4) AS INTEGER)
        | AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 3
        |ORDER BY name_a, name_b""".stripMargin,

    "llm_sorted_neighborhood" ->
      """WITH names AS (
        |  SELECT p_name, count(*) AS n_items FROM part GROUP BY p_name),
        |seq AS (
        |  SELECT p_name,
        |   lead(p_name, 1) OVER w AS nb1, lead(p_name, 2) OVER w AS nb2
        |  FROM names
        |  WINDOW w AS (PARTITION BY substr(p_name, 1, 1) ORDER BY p_name)),
        |pairs AS (
        |  SELECT p_name AS name_a, nb1 AS name_b FROM seq WHERE nb1 IS NOT NULL
        |  UNION ALL
        |  SELECT p_name, nb2 FROM seq WHERE nb2 IS NOT NULL)
        |SELECT name_a, name_b,
        | CAST(levenshtein(name_a, name_b) AS INTEGER) AS dist
        |FROM pairs WHERE levenshtein(name_a, name_b) <= 3
        |ORDER BY name_a, name_b""".stripMargin,

    "llm_boilerplate_scrub" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |ch AS (SELECT doc_id,
        |  unnest(range(0, CAST(ceil(len(w) / 10.0) AS BIGINT))) AS pos, w
        | FROM w),
        |t AS (SELECT doc_id, pos,
        |  array_to_string(w[pos*10+1 : pos*10+10], ' ') AS chunk FROM ch),
        |t2 AS (SELECT doc_id, pos, chunk, md5(chunk) AS h FROM t),
        |b AS (SELECT h FROM t2 GROUP BY h HAVING count(DISTINCT doc_id) >= 3)
        |SELECT doc_id, count(*) AS n_chunks,
        | CAST(sum(CASE WHEN h IN (SELECT h FROM b) THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_removed,
        | coalesce(string_agg(CASE WHEN h NOT IN (SELECT h FROM b) THEN chunk END,
        |   ' ' ORDER BY pos), '') AS clean_text
        |FROM t2 GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
