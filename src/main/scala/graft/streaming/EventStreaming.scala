package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types.StructType

/** Structured Streaming layer (SURVEY.md §2.9).
  *
  * The reference delivers query results incrementally — a worker thread
  * decodes batches and the UI polls them non-blocking every frame
  * (/root/reference/src/main.cpp:1097, 1273;
  * /root/reference/src/utils/TaskHandler.h:40-45). Structured Streaming is
  * the Spark-native form of that loop: a source feeds micro-batches through
  * the same declarative plan, and sinks observe increments.
  *
  * These transforms are *source-agnostic*: they take any streaming (or
  * batch) DataFrame with the events schema (`ts: timestamp, event_type:
  * string, user_id: long, value: double`), so tests drive them from
  * `MemoryStream` and production attaches `readStream.parquet`/Kafka. The
  * tumbling-window aggregation is the streaming twin of the oracle-checked
  * batch query `ev_tumbling_1h`.
  *
  * Scale notes: watermark + windowed agg is incremental state keyed by
  * (window, event_type) — bounded cardinality; per-user session state in
  * [[sessionCounts]] uses mapGroupsWithState with an explicit timeout so
  * state is evicted, never unbounded.
  */
object EventStreaming {

  /** Tumbling 1-hour window counts with a 30-minute watermark for late
    * data. Append-mode compatible (finalized windows only).
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"),
        col("sum_value"))

  /** Sliding windows: 1-hour window advancing every 15 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"))

  /** Session windows via event-time gap (built-in session_window) —
    * the live twin of the batch `ev_session_window` entry, emitting the
    * same shape: window end (= last event + gap) and the exact-decimal
    * value sum alongside the count.
    */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double")
          .as("sum_value"))
      .select(col("w.start").as("sess_start"), col("w.end").as("sess_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  final case class UserEvent(user_id: Long, event_type: String)
  final case class UserCount(user_id: Long, n_events: Long)

  /** Custom stateful op: running per-user event counts via
    * mapGroupsWithState (the reference's per-query incremental counter,
    * generalized). Production passes ProcessingTimeTimeout so idle users'
    * state is evicted; tests pass NoTimeout so processAllAvailable()
    * settles (timeout-driven batches never let the stream go idle).
    */
  def sessionCounts(events: Dataset[UserEvent],
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)
      : Dataset[UserCount] = {
    import events.sparkSession.implicits._
    val evict = timeout == GroupStateTimeout.ProcessingTimeTimeout
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(timeout) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            val n = state.getOption.getOrElse(0L)
            state.remove()
            UserCount(uid, n)
          } else {
            val n = state.getOption.getOrElse(0L) + rows.size
            state.update(n)
            if (evict) state.setTimeoutDuration("1 hour")
            UserCount(uid, n)
          }
      }
  }

  final case class BucketItem(bucket: Int, item: String)
  final case class HeavyHitter(item: String, count: Long, maxError: Long)

  /** Streaming heavy hitters with BOUNDED state: each of `buckets`
    * hash-partitioned groups maintains a capacity-`k` Space-Saving
    * summary (Metwally et al., ICDT'05) over its items, so total state
    * is buckets × k counters no matter how many distinct items the
    * stream carries — the property a `groupBy(item).count` loses the
    * moment item cardinality is unbounded (every distinct key lives in
    * state forever). Per update: present items increment; a new item
    * evicts the current minimum and inherits its count, recording that
    * count as `maxError` (Space-Saving's overestimate bound:
    * `count - maxError ≤ true ≤ count`). Items hash to a fixed bucket,
    * so a true heavy hitter always lands in ONE summary and is
    * guaranteed present once its frequency exceeds bucket_size/k.
    */
  def heavyHitters(items: Dataset[String], k: Int, buckets: Int = 8,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)
      : Dataset[HeavyHitter] = {
    import items.sparkSession.implicits._
    items
      .map(s => BucketItem(math.floorMod(s.hashCode, buckets), s))
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Update(), timeout) {
        (_: Int, rows: Iterator[BucketItem],
            state: GroupState[Map[String, (Long, Long)]]) =>
          var summary = state.getOption.getOrElse(Map.empty)
          rows.foreach { r =>
            summary.get(r.item) match {
              case Some((n, e)) => summary += r.item -> (n + 1, e)
              case None if summary.size < k => summary += r.item -> (1L, 0L)
              case None =>
                // evict the minimum (ties: lexicographic — deterministic),
                // inherit its count as the new item's error bound
                val (minItem, (minN, _)) = summary.minBy { case (i, (n, _)) => (n, i) }
                summary = summary - minItem + (r.item -> (minN + 1, minN))
            }
          }
          state.update(summary)
          summary.iterator.map { case (i, (n, e)) => HeavyHitter(i, n, e) }
      }
  }

  /** Output-mode helper used by the tests and any foreachBatch consumer. */
  val appendMode: OutputMode = OutputMode.Append()

  /** Live-trace file source (SURVEY.md §7.2 slice 6): tail a directory of
    * event parquet files — each file that appears becomes part of the next
    * micro-batch, the engine analog of the reference's live ETW session
    * feeding `ProcessTrace` incrementally (src/main.cpp:1081-1089).
    * `maxFilesPerTrigger` bounds batch size so a backlog drains in steady
    * increments rather than one giant batch.
    */
  def fileSource(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int = 4): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Streaming exact dedup with bounded state: the streaming twin of the
    * batch `llm_dedup_exact`. Duplicate keys arriving within the
    * watermark horizon are dropped; state for a key is evicted once the
    * watermark passes it, so state size follows the horizon × key
    * arrival rate, never the stream's full history — the only viable
    * dedup contract over an unbounded ingest. (Full-history dedup at
    * scale is the batch incremental form: `GraftPipelines
    * .incrementalDedup` against the persisted corpus index.)
    */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
      horizon: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-static enrichment: join a live event stream against a static
    * dimension (the streaming twin of the dictionary decode). The static
    * side re-plans per micro-batch, so Spark broadcasts it when small —
    * no state store involved, which is why this is the right shape for
    * dimension enrichment (a stream-stream join would buffer state).
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(dim, Seq(key), "left")

  /** Watermarked STREAM-STREAM interval join — two live feeds correlated
    * on key + time band, the streaming twin of the batch `ev_range_join`
    * (follow-on events within `bandSeconds` after the same user's
    * signup) and the engine form of the reference's dual live queues
    * (`src/utils/TaskHandler.h:33-45`: trace events and UI requests
    * arriving on independent threads, correlated by the session).
    *
    * Unlike [[enrich]] (stream-static, stateless), BOTH sides buffer
    * state. The two watermarks plus the two-sided time bound are what
    * make that state finite: Spark derives each side's eviction horizon
    * from the join condition — a buffered signup is dropped once the
    * event-side watermark passes `sig_ts + band` (no future event can
    * match it), and a buffered event once the signup-side watermark
    * passes `ev_ts` (no future signup can precede it). State is
    * horizon × arrival rate, never stream history — the only viable
    * contract for an unbounded dual-feed join. In append mode a pair
    * emits as soon as both rows have arrived; rows later than their
    * side's watermark are dropped, matching the windowed-agg lateness
    * contract.
    *
    * `joinType`: "inner" emits matches only; "left_outer" ALSO emits
    * each signup with null event columns once the event-side watermark
    * has passed `sig_ts + band` — i.e. once no future event can match —
    * the live "signups that never converted" query (a batch engine
    * needs a full re-scan for it; here it falls out of state eviction).
    */
  def followWithinBand(signups: DataFrame, events: DataFrame,
      bandSeconds: Long = 3600, late: String = "30 minutes",
      joinType: String = "inner"): DataFrame = {
    val sig = signups.filter(col("event_type") === "signup")
      .withWatermark("ts", late)
      .select(col("ts").as("sig_ts"), col("user_id").as("su"))
    val ev = events.withWatermark("ts", late)
      .select(col("ts").as("ev_ts"), col("user_id"), col("event_type"))
    sig.join(ev,
        col("user_id") === col("su") &&
        col("ev_ts") > col("sig_ts") &&
        col("ev_ts") <= col("sig_ts") + expr(s"INTERVAL $bandSeconds SECONDS"),
        joinType)
      .select(col("su").as("user_id"), col("sig_ts"), col("ev_ts"),
        col("event_type"))
  }

  /** Streaming near-dup ingest against a self-maintaining persisted band
    * index: the production loop [[graft.api.GraftPipelines.incrementalDedup]]
    * describes, as running code. Per micro-batch of documents:
    *
    *  1. read the corpus band index from `indexPath` (empty on bootstrap);
    *  2. flag the batch against it
    *     ([[graft.api.GraftPipelines.incrementalDedupWithIndex]]) and
    *     materialize the flags BEFORE the index changes (localCheckpoint);
    *  3. hand the flagged batch to the caller's sink;
    *  4. append the bands of the batch's NEW docs (is_new = 1) to the
    *     index — duplicates contribute no index entries, so the index
    *     grows with unique content, not ingest volume.
    *
    * Only the batch is re-hashed per trigger; the corpus text is never
    * re-scanned. A foreachBatch replay after a sink failure can append a
    * batch's bands twice — harmless for flag semantics, because the
    * candidate count dedups (batch, corpus) doc pairs before counting.
    *
    * Scheme discipline ([[StateScheme]]): a hidden `_scheme` marker
    * inside the index pins `(shingleN, seeds, bands)` — appending band
    * hashes from a DIFFERENT hash scheme to the same log would make
    * new↔old candidate pairs silently never collide (missed
    * duplicates, the silent-wrong-answer class), so a mismatched
    * restart refuses loudly. The log itself is batch-id-agnostic
    * (dup-tolerant append; flags derive from accumulated content, not
    * trigger numbering), so a DIFFERENT query continuing ingest over
    * the same index is semantically sound — but it must say so:
    * `adoptExisting = true` is the deliberate continuation path, and
    * the default refuses a foreign batch-0 start so an accidental
    * re-stream of an already-ingested corpus (every doc flagged dup,
    * zero new index growth) cannot happen silently.
    */
  def ingestDedupLoop(docs: DataFrame, indexPath: String,
      checkpointDir: Option[String] = None, shingleN: Int = 3,
      seeds: Int = 8, bands: Int = 4, id: String = "doc_id",
      text: String = "text", compactThreshold: Int = 64,
      adoptExisting: Boolean = false)
      (sink: (Dataset[Row], Long) => Unit): StreamingQuery = {
    val runId = StateScheme.runIdentity(checkpointDir)
    deliver(docs, checkpointDir) { (batch, batchId) =>
      val spark = batch.sparkSession
      val fs = StateScheme.fsFor(spark, indexPath)
      def indexExists: Boolean = {
        val p = new org.apache.hadoop.fs.Path(indexPath)
        fs.exists(p) && fs.listStatus(p).toSeq
          .exists(_.getPath.getName.startsWith("part-"))
      }
      val pinnedRun = StateScheme.ensure(spark, fs, s"$indexPath/_scheme",
        s"n=$shingleN,seeds=$seeds,bands=$bands", runId, "ingestDedupLoop",
        "band hashes from two hash schemes must never share one index " +
          "(new↔old candidates would silently never collide)",
        indexExists, adoptExisting)
      if (!adoptExisting)
        StateScheme.refuseForeign("ingestDedupLoop", batchId, pinnedRun,
          runId, indexExists, s"the band index at $indexPath",
          "pass adoptExisting = true to deliberately continue ingest " +
            "into this index")
      val index =
        try spark.read.parquet(indexPath)
        catch {
          case _: org.apache.spark.sql.AnalysisException => // bootstrap
            graft.api.GraftPipelines.bandIndex(
              batch.toDF.limit(0), shingleN, seeds, bands, id, text)
        }
      val flagged = graft.api.GraftPipelines
        .incrementalDedupWithIndex(index, batch.toDF,
          shingleN, seeds, bands, id, text)
        .localCheckpoint()
      sink(flagged, batchId)
      val survivors = batch.toDF.join(
        flagged.filter(col("is_new") === 1)
          .select(col("batch_id").as(id)),
        Seq(id), "left_semi")
      graft.api.GraftPipelines
        .bandIndex(survivors, shingleN, seeds, bands, id, text)
        .write.mode("append").parquet(indexPath)
      compactDupTolerantLog(spark, indexPath, compactThreshold)
    }
  }

  /** Streaming decontamination gate: flag every arriving doc's n-gram
    * overlap with a persisted eval gram set at INGEST time — dropping
    * benchmark leaks before they ever enter the corpus, instead of a
    * post-hoc scrub over 100 TB. The eval artifact is built once
    * (`GraftPipelines.corpusGramIndex(evalSuite).select("g")`, written
    * to `evalGramsPath`) and reread per micro-batch as a static side
    * (broadcast when small — eval suites usually are); per-trigger work
    * shingles only the batch. The sink sees each doc with
    * `n_eval_grams` + `is_contaminated` — same columns as the batch
    * `llm_decontaminate`.
    */
  def decontaminationGate(docs: DataFrame, evalGramsPath: String,
      checkpointDir: Option[String] = None, n: Int = 5,
      id: String = "doc_id", text: String = "text")
      (sink: (Dataset[Row], Long) => Unit): StreamingQuery =
    deliver(docs, checkpointDir) { (batch, batchId) =>
      val evalGrams = batch.sparkSession.read.parquet(evalGramsPath)
      val flagged = graft.api.GraftPipelines
        .decontaminateAgainstGrams(batch.toDF, evalGrams, n, id, text)
        .localCheckpoint()
      sink(flagged, batchId)
    }

  /** Streaming END-TO-END curation: the full five-stage batch pipeline
    * (`GraftPipelines.curateClean` — decontaminate → quality gate →
    * exact dedup → verified near-dup drop → token count) as an ingest
    * loop whose per-trigger work is O(batch + touched candidates),
    * never a corpus re-scan. Composes the independently-proven gates:
    * [[decontaminationGate]]'s gram check, the quality filter,
    * [[ingestDedupLoop]]'s growing band index, plus a digest log and a
    * doc store. State under `statePath` (all dup-tolerant append logs,
    * the ingestDedupLoop discipline):
    *
    *  - `digests/` — md5(text) of every EXACT survivor so far; the
    *    arriving batch anti-joins it (exact dedup across triggers).
    *  - `bands/` — the LSH band index of every exact survivor; cross
    *    near-dup candidates are band collisions batch × index.
    *  - `docs/` — (id, text) of every exact survivor, for the verify
    *    stage's word-set Jaccard (candidates only — the store is read
    *    by id-keyed semi-join, never scanned for shingling).
    *
    * BATCH-EQUIVALENCE (proven in StreamingSpec): under id-monotone
    * ingest (doc ids non-decreasing across triggers — the natural
    * ingest order), the accumulated survivor set EQUALS
    * `curateClean(allBatches, evalSet)` exactly, including dup CHAINS:
    * the batch rule drops every verified pair's larger id even when the
    * smaller was itself dropped, so the state logs append ALL exact
    * survivors (dropped-or-not), not just emitted ones — an index of
    * emitted survivors only would let the third link of an a~b~c chain
    * slip through (b dropped by a, c similar only to b). Out-of-order
    * ingest degrades gracefully to first-seen-wins (a cross pair drops
    * the BATCH member — the already-emitted doc can't be retracted),
    * which is the same policy at a different tie-break, not a
    * correctness hole.
    *
    * Replay caveat (shared with [[ingestDedupLoop]]): the logs are
    * append-only and dup-tolerant on read (`dropDuplicates` on the id /
    * digest key), so a foreachBatch retry re-appends rows harmlessly;
    * however a retried batch whose digests already landed emits no
    * survivors on the retry — the sink must treat emissions as
    * at-least-once per batch id, not per doc.
    *
    * Scheme discipline ([[StateScheme]]): the marker pins EVERY
    * parameter that shapes the state logs — the gates decide which
    * docs enter `digests/`/`docs/`, the hash scheme shapes `bands/` —
    * so a mismatched restart refuses instead of mixing two curation
    * policies in one corpus state. The logs are batch-id-agnostic
    * appends, so `adoptExisting = true` is the deliberate
    * continue-with-a-new-query path ([[ingestDedupLoop]] contract).
    */
  def curationIngest(docs: DataFrame, evalGramsPath: String,
      statePath: String, checkpointDir: Option[String] = None,
      stopwords: Seq[String] = graft.api.GraftPipelines.DefaultStopwords,
      nGram: Int = 5, minScore: Double = 0.45, minWords: Int = 5,
      minJaccard: Double = 0.7, shingleN: Int = 3, seeds: Int = 8,
      bands: Int = 4, id: String = "doc_id", text: String = "text",
      adoptExisting: Boolean = false)
      (sink: (Dataset[Row], Long) => Unit): StreamingQuery = {
    val runId = StateScheme.runIdentity(checkpointDir)
    val paramFp = {
      val sw = java.security.MessageDigest.getInstance("SHA-256")
        .digest(stopwords.mkString(" ").getBytes("UTF-8"))
        .take(8).map("%02x".format(_)).mkString
      s"ng=$nGram,score=$minScore,words=$minWords,j=$minJaccard," +
        s"n=$shingleN,seeds=$seeds,bands=$bands,sw=$sw"
    }
    deliver(docs, checkpointDir) { (batch0, batchId) =>
      val spark = batch0.sparkSession
      val schemeFs = StateScheme.fsFor(spark, statePath)
      def logsExist: Boolean = Seq("digests", "docs", "bands").exists { sub =>
        schemeFs.exists(new org.apache.hadoop.fs.Path(s"$statePath/$sub"))
      }
      val pinnedRun = StateScheme.ensure(spark, schemeFs,
        s"$statePath/scheme", paramFp, runId, "curationIngest",
        "state logs written under two curation policies or hash " +
          "schemes must never mix (missed duplicates and inconsistent " +
          "gates are silent wrong answers)", logsExist, adoptExisting)
      if (!adoptExisting)
        StateScheme.refuseForeign("curationIngest", batchId, pinnedRun,
          runId, logsExist, s"the curation state at $statePath",
          "pass adoptExisting = true to deliberately continue ingest " +
            "into this state")
      val P = graft.api.GraftPipelines
      def readLog(sub: String, bootstrap: => DataFrame): DataFrame =
        try spark.read.parquet(s"$statePath/$sub")
        catch {
          case _: org.apache.spark.sql.AnalysisException => bootstrap.limit(0)
        }
      val batch = batch0.toDF.localCheckpoint()
      // 1. decontamination gate (per-doc, vs the persisted eval grams)
      val evalGrams = spark.read.parquet(evalGramsPath)
      val clean = batch.join(
        P.decontaminateAgainstGrams(batch, evalGrams, nGram, id, text)
          .filter(col("is_contaminated") === 1).select(col(id)),
        Seq(id), "left_anti")
      // 2. quality gate (per-doc)
      val kept = clean.join(
        P.qualityScores(clean, stopwords, id, text)
          .filter(col("score") >= minScore && col("n_words") >= minWords)
          .select(col(id)),
        Seq(id), "left_semi")
      // 3. exact dedup: min-id per digest within the batch, then
      // anti-join the cross-trigger digest log
      val inBatch = kept.withColumn("__digest", md5(col(text)))
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("__digest")).orderBy(col(id))))
        .filter(col("__rn") === 1).drop("__rn")
      val digestLog = readLog("digests",
        inBatch.select(col("__digest").as("digest")))
        .dropDuplicates("digest")
      val exact = inBatch.join(
          digestLog.withColumnRenamed("digest", "__digest"),
          Seq("__digest"), "left_anti")
        .localCheckpoint()
      // 4. near-dup: in-batch candidates (d1 < d2) + cross candidates
      // against the band index of ALL prior exact survivors
      val batchBands = P
        .bandIndex(exact, shingleN, seeds, bands, id, text)
        .localCheckpoint()
      val priorBands = readLog("bands", batchBands).dropDuplicates(id, "b")
      val priorDocs = readLog("docs", exact.select(col(id), col(text)))
        .dropDuplicates(id)
      val inCands = P.bandCandidates(batchBands, id)
      // cross pairs: d2 is ALWAYS the batch member (the prior doc was
      // already emitted) — equals the min-id rule under ordered ingest
      val cross = priorBands.select(col(id).as("d1"), col("b"))
        .join(batchBands.select(col(id).as("d2"), col("b")), "b")
        .filter(col("d1") =!= col("d2"))
        .select(col("d1"), col("d2")).distinct()
      val cands = inCands.unionByName(cross).distinct()
      val universe = priorDocs.select(col(id), col(text))
        .unionByName(exact.select(col(id), col(text)))
      val dropIds = P
        .nearDuplicatesFromCandidates(universe, cands, minJaccard, id, text)
        .select(col("d2").as(id)).distinct()
      val survivors = exact.join(dropIds, Seq(id), "left_anti")
        .withColumn("n_tokens", size(split(col(text), " ")))
        .drop("__digest")
        .localCheckpoint()
      sink(survivors, batchId)
      // 5. grow the state by ALL exact survivors (near-dup-dropped ones
      // included — see the chain note above)
      exact.select(col("__digest").as("digest"))
        .write.mode("append").parquet(s"$statePath/digests")
      exact.select(col(id), col(text))
        .write.mode("append").parquet(s"$statePath/docs")
      batchBands.write.mode("append").parquet(s"$statePath/bands")
    }
  }

  /** Streaming inverted-index maintenance: per micro-batch, append the
    * batch docs' (id, term) posting rows to an append-only parquet log —
    * the segment model of every production search index (writers only
    * append; readers compact). The serving view is
    * [[graft.api.GraftPipelines.invertedIndexFromPostings]] over the log,
    * whose leading distinct makes reads idempotent under foreachBatch
    * replays (a retried batch appends its postings twice, the read-side
    * dedup cancels it). Per-trigger work is O(batch terms) — the corpus
    * is never re-tokenized, and the log grows with corpus content, not
    * with read traffic.
    *
    * Scheme discipline ([[StateScheme]], the [[ingestDedupLoop]]
    * shape): the hidden `_scheme` marker pins the tokenization scheme
    * (postings from two tokenizers in one log would make term lookups
    * silently partial), and a foreign batch-0 start over an existing
    * log refuses unless `adoptExisting = true` names the continuation
    * deliberately — the append log itself is batch-id-agnostic.
    */
  def indexIngestLoop(docs: DataFrame, postingsPath: String,
      checkpointDir: Option[String] = None, id: String = "doc_id",
      text: String = "text", compactThreshold: Int = 64,
      adoptExisting: Boolean = false)
      (sink: (Dataset[Row], Long) => Unit): StreamingQuery = {
    val runId = StateScheme.runIdentity(checkpointDir)
    deliver(docs, checkpointDir) { (batch, batchId) =>
      val spark = batch.sparkSession
      val fs = StateScheme.fsFor(spark, postingsPath)
      def logExists: Boolean = {
        val p = new org.apache.hadoop.fs.Path(postingsPath)
        fs.exists(p) && fs.listStatus(p).toSeq
          .exists(_.getPath.getName.startsWith("part-"))
      }
      val pinnedRun = StateScheme.ensure(spark, fs,
        s"$postingsPath/_scheme", "tok=ws-unigram", runId,
        "indexIngestLoop",
        "postings from two tokenization schemes must never share one " +
          "log (term lookups would be silently partial)",
        logExists, adoptExisting)
      if (!adoptExisting)
        StateScheme.refuseForeign("indexIngestLoop", batchId, pinnedRun,
          runId, logExists, s"the postings log at $postingsPath",
          "pass adoptExisting = true to deliberately continue ingest " +
            "into this log")
      val postings = graft.api.GraftPipelines
        .postingsOf(batch.toDF, id, text)
        .localCheckpoint()
      postings.write.mode("append").parquet(postingsPath)
      sink(postings, batchId)
      compactDupTolerantLog(spark, postingsPath, compactThreshold)
    }
  }

  /** Fold a flat append-only parquet log into a few files once its
    * data-file count exceeds `threshold`: read the CURRENT part files,
    * append their DISTINCT rows as one compacted segment, then delete
    * exactly the files that were read — the `rel_compact` small-file
    * discipline applied to streaming log state (without it, per-trigger
    * listing cost and file count grow one-file-per-batch over an
    * unbounded stream, the same growth class the knn loop's
    * consolidated generations close).
    *
    * Correct at EVERY instant because both logs this serves are
    * duplicate-tolerant by contract (the band index dedups candidate
    * pairs before counting; the postings read side leads with
    * `distinct`): mid-compaction a reader sees old + folded rows
    * (duplicates — harmless), after the deletes it sees only the folded
    * segment, and a crash between append and delete leaves duplicates
    * the NEXT compaction removes. Appending before deleting means the
    * log never passes through an empty or partial state, so no reader
    * (including the loop's own next trigger) can bootstrap against a
    * half-compacted index. `distinct` is semantics-preserving for the
    * same reason: the only duplicate rows are replay artifacts the
    * readers already cancel.
    *
    * An EXTERNAL reader that listed the log just before a fold can hit
    * a transient missing-file on the deleted segments — the standard
    * log-structured compaction race; content is never lost, and a
    * re-planned read (Spark re-lists at query planning, so a plain
    * retry) succeeds. The loop's own next trigger always re-lists.
    */
  private def compactDupTolerantLog(spark: SparkSession, path: String,
      threshold: Int): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath)) return
    val files = fs.listStatus(hPath).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("part-"))
    if (files.size <= threshold) return
    spark.read.parquet(files.map(_.toString): _*)
      .distinct()
      .coalesce(math.max(1, spark.sparkContext.defaultParallelism / 8))
      .write.mode("append").parquet(path)
    files.foreach(fs.delete(_, false))
  }

  /** Label every job an expression tree's ACTIONS schedule while `f`
    * runs (thread-local, so concurrent queries don't cross-label) —
    * the chain loops run 60-100 jobs per trigger, and without labels
    * the Spark UI / listener attribution reads only the foreachBatch
    * callsite. Pure observability: no plan change.
    */
  private def labeled[T](spark: SparkSession, desc: String)(f: => T): T =
    graft.api.GraftPipelines.labeled(spark, desc)(f)

  /** A `<log>.vold` backup under the chain state means
    * [[graft.operators.DedupOps.vacuumChainState]] crashed between its
    * two swap renames — the live log may be missing or half-swapped,
    * and a loop trigger that appended to it would rebuild the store
    * from just that batch, silently forgetting the corpus. Refuse and
    * name the recovery (re-running the vacuum completes the sweep).
    */
  private def refuseMidVacuum(loop: String,
      fs: org.apache.hadoop.fs.FileSystem, statePath: String): Unit =
    Seq("bands", "docs", "dels").foreach { log =>
      if (fs.exists(new org.apache.hadoop.fs.Path(s"$statePath/$log.vold")))
        throw new IllegalStateException(
          s"$loop: $statePath/$log.vold exists — a vacuum crashed " +
            "mid-swap; re-run DedupOps.vacuumChainState(statePath) to " +
            "recover before resuming the loop")
    }

  /** Hash-bucket partition id for the chain loops' store logs:
    * `pb = pmod(xxhash64(key), buckets)`, written as a hive partition
    * column so every per-trigger read can prune to exactly the buckets
    * the batch touches (`PartitionFilters` on the scan — the directory
    * analog of the bucketed band index GraftIOSpec pins, usable on a
    * bare path without a session catalog). Int-typed on purpose:
    * partition discovery infers int for these values, and the pruning
    * filter must compare the identical type — a cast wrapped around
    * the partition attribute would block pruning.
    */
  private def storeBucket(key: Column, buckets: Int): Column =
    pmod(xxhash64(key), lit(buckets)).cast("int")

  /** The bucket ids `df` touches under `storeBucket(key, buckets)` —
    * a driver-side collect BOUNDED by `buckets` (at most that many
    * distinct values exist), never by data size.
    */
  private[graft] def touchedBuckets(df: DataFrame, key: Column,
      buckets: Int): Seq[Int] =
    df.select(storeBucket(key, buckets).as("pb")).distinct()
      .collect().map(_.getInt(0)).toSeq

  /** Append `df` to the hash-bucketed (`pb=`) log at `path`, then fold
    * any TOUCHED bucket directory whose file count passed
    * `compactThreshold` ([[compactDupTolerantLog]] per leaf dir).
    * Untouched buckets never grow, so compaction checks only the
    * touched ones — per-trigger listing is O(touched buckets), not
    * O(buckets). The pre-write repartition is batch-proportional and
    * bounds the file count at one per bucket; its partition count is
    * EXPLICIT (max(defaultParallelism, buckets)) because an
    * expression-only repartition is AQE-coalescible and a micro-batch
    * shuffle coalesces to ONE task that then writes every bucket's
    * file sequentially — measured 0.86 s of a 7.5 s extend trigger per
    * log (DevTrigProf r15); pinning the count keeps the per-bucket
    * writers parallel at every batch size while the file count stays
    * one per bucket (each pb hashes to exactly one partition).
    * Returns the touched bucket ids for the caller's pruned read plus
    * the appended row count (read off the same collect — callers like
    * [[chainCandidatePairs]] need it for the counted-broadcast rule,
    * and a separate count() job per trigger is pure floor).
    */
  private def appendBucketedLog(df: DataFrame, path: String, key: Column,
      buckets: Int, compactThreshold: Int): (Seq[Int], Long) = {
    val spark = df.sparkSession
    df.withColumn("pb", storeBucket(key, buckets))
      .repartition(
        math.max(spark.sparkContext.defaultParallelism, buckets),
        col("pb"))
      .write.mode("append").partitionBy("pb").parquet(path)
    // one job for touched buckets AND the row count (≤ `buckets` rows)
    val perBucket = df.select(storeBucket(key, buckets).as("pb"))
      .groupBy(col("pb")).count().collect()
    val touched = perBucket.map(_.getInt(0)).toSeq
    touched.foreach { pb =>
      compactDupTolerantLog(spark, s"$path/pb=$pb", compactThreshold)
    }
    (touched, perBucket.map(_.getLong(1)).sum)
  }

  /** Bucket-pruned read of a `pb=` log: only the named buckets' files
    * are scanned — the filter lands in the scan's `PartitionFilters`,
    * so unnamed buckets are pruned at planning, before any I/O.
    * (Partition DISCOVERY still lists the directory tree per trigger;
    * at a genuine 100 TB deployment a table catalog with a partition
    * manifest replaces discovery — the query shape is unchanged.)
    */
  private[graft] def readBucketedLog(spark: SparkSession, path: String,
      pbs: Seq[Int]): DataFrame = {
    val all = spark.read.parquet(path)
    if (pbs.isEmpty) all.filter(lit(false))
    else all.filter(col("pb").isin(pbs: _*))
  }

  /** Per-trigger candidate generation for the chain loops
    * ([[extendLoop]]/[[upsertLoop]]): batch bands PROBE the bucketed
    * band store and the result is normalized to `d1 < d2` candidate
    * pairs. The per-trigger cost is O(batch + touched buckets), never
    * O(store):
    *
    *  - the store read is pruned to `bandPbs` (the batch's own band
    *    buckets — a bucket the batch has no band in cannot hold a
    *    candidate partner);
    *  - the store side is NEVER deduplicated before the join — the old
    *    flat-log `distinct()` was a full-store shuffle every trigger
    *    (the round-13 scale ceiling); a duplicate band row can only
    *    produce a duplicate candidate pair, and the pair-level
    *    `distinct()` below removes those at candidate cost;
    *  - when the batch is small (a COUNTED decision against
    *    `broadcastRowCap` — batch-band row count, an O(batch) job on
    *    an already-checkpointed frame) the probe side broadcasts, so
    *    the store side streams through the join with NO shuffle at
    *    all; a seed-scale batch (bootstrap streams the initial corpus
    *    through this same code path) falls back to a two-sided
    *    shuffle-hash join, which is the correct rebuild-shaped plan —
    *    compile-time broadcast of an unbounded side is the driver-OOM
    *    cliff [[graft.api.GraftPipelines.nearDuplicatesFromCandidates]]
    *    documents;
    *  - `tombs` (upsert's tombstone ids, anti-joined so a deleted doc
    *    never generates another candidate) follows the same counted
    *    broadcast rule.
    */
  private[graft] def chainCandidatePairs(spark: SparkSession,
      bandsPath: String, batchBands: DataFrame, bandPbs: Seq[Int],
      tombs: Option[DataFrame] = None,
      broadcastRowCap: Long = 1L << 20,
      knownBatchRows: Option[Long] = None): DataFrame = {
    // the loop callers already counted the batch rows on the append's
    // bucket collect — a fresh count() job here is pure trigger floor
    val nBatch = knownBatchRows.getOrElse(batchBands.count())
    val store0 = readBucketedLog(spark, bandsPath, bandPbs)
      .select(col("doc_id"), col("b"))
    val store = tombs.fold(store0) { t =>
      if (t.count() <= broadcastRowCap)
        store0.join(broadcast(t), col("doc_id") === col("del_id"),
          "left_anti")
      else store0.join(t, col("doc_id") === col("del_id"), "left_anti")
    }
    val bb = batchBands.select(col("doc_id").as("bid"), col("b"))
    val joined =
      if (nBatch <= broadcastRowCap) store.join(broadcast(bb), "b")
      else bb.hint("shuffle_hash").join(store.hint("shuffle_hash"), "b")
    joined.filter(col("bid") =!= col("doc_id"))
      .select(least(col("bid"), col("doc_id")).as("d1"),
        greatest(col("bid"), col("doc_id")).as("d2"))
      .distinct()
  }

  /** Candidate docs' texts for verification: a bucket-pruned scan of
    * the doc log semi-joined to the candidate ids BEFORE the
    * one-text-per-doc dedup, so `dropDuplicates` runs on
    * candidate-count rows — the round-13 version deduplicated the
    * ENTIRE doc store per trigger (a full-corpus shuffle per
    * micro-batch at 100 TB). The semi join broadcasts the candidate
    * ids under the same counted `broadcastRowCap` rule as
    * [[chainCandidatePairs]] (a dup-heavy corpus can put a large
    * fraction of all docs in candidate pairs — unbounded, so the
    * broadcast is a measured decision, not a compile-time hint).
    */
  private[graft] def candidateDocTexts(spark: SparkSession,
      docsPath: String, cands: DataFrame, storeBuckets: Int,
      broadcastRowCap: Long = 1L << 20): DataFrame = {
    val candIds = cands.select(col("d1").as("doc_id"))
      .union(cands.select(col("d2"))).distinct().localCheckpoint()
    // count + touched buckets off ONE aggregate job (collect_set is
    // bounded by `storeBuckets` values); the two separate jobs the
    // round-14 shape ran were pure trigger floor
    val stats = candIds.agg(count(lit(1)).as("n"),
      collect_set(storeBucket(col("doc_id"), storeBuckets)).as("pbs"))
      .head()
    val n = stats.getLong(0)
    val pbs = stats.getSeq[Int](1)
    val store = readBucketedLog(spark, docsPath, pbs)
      .select(col("doc_id"), col("text"))
    (if (n <= broadcastRowCap)
      store.join(broadcast(candIds), Seq("doc_id"), "left_semi")
    else store.join(candIds, Seq("doc_id"), "left_semi"))
      .dropDuplicates("doc_id")
  }

  /** Streaming k-NN graph maintenance — the streaming twin of the batch
    * `llm_knn_incremental` (whose bucket-locality identity is
    * hash-checked against the full-rebuild oracle), with per-trigger
    * I/O proportional to the DELTA, not the corpus. State under
    * `statePath`:
    *
    *  - `scheme/` — the (params, run-identity) marker
    *    ([[StateScheme]], crash-safe tmp→rename publication): every
    *    batch `require`s (k, lshBits) match, because edges built under
    *    one bucketing are meaningless under another — restarting with
    *    a widened `lshBits` against existing state must fail loudly
    *    and force a rebuild, never silently corrupt the graph. And a
    *    query that does NOT own the state (fresh or absent checkpoint
    *    — batch ids restart at 0) refuses over existing vectors: its
    *    b=0 overwrite would silently replace the owner's first batch
    *    while stale b=N dirs persist — a mixed-run graph no parameter
    *    check can catch.
    *  - `vectors/b=<batchId>/bucket=<v>/` — each batch's vectors,
    *    bucket-partitioned; append-only corpus expressed as idempotent
    *    per-batch directory overwrites (a replayed batch rewrites only
    *    its own `b=` dir).
    *  - `vectors/c=<batchId>/bucket=<v>/` — the CONSOLIDATED vector
    *    state: once `compactEvery` per-batch `b=` dirs accumulate, the
    *    batch folds the previous consolidation plus every live `b=`
    *    dir into one bucket-partitioned generation and deletes the
    *    inputs, so the per-trigger directory walk and the small-file
    *    count stay O(compactEvery) over an UNBOUNDED stream lifetime
    *    instead of growing one directory per batch forever (the
    *    `rel_compact` coalesce discipline applied to stream state).
    *    Crash-safe: the generation is written to a `tmpc-` temp and
    *    published by a single rename; inputs are deleted only after
    *    publication, and readers always take the NEWEST `c=` plus the
    *    `b=` dirs above it, so a crash between publish and delete
    *    only leaves redundant dirs the next compaction removes.
    *  - `edges/bucket=<v>/` — the directed top-k edge table,
    *    partitioned by bucket; a batch rewrites ONLY its touched
    *    buckets' partitions (dynamic partition overwrite — idempotent,
    *    the recompute is deterministic). Already consolidated per
    *    bucket — compaction never needs to touch it.
    *
    * Per micro-batch: touched = the delta's distinct buckets (a
    * bounded, ≤ 2^lshBits set); read PRIOR vectors of touched buckets
    * only (explicit `bucket=<touched>` subdirs of the newest `c=` and
    * the `b=` dirs above it — never this attempt's half-written
    * output, never an untouched bucket); recompute
    * [[graft.api.GraftPipelines.knnEdges]] over that membership ∪
    * delta; overwrite those edge partitions. Untouched buckets'
    * vectors and edges are never read OR written — per-trigger work is
    * Σ touched-bucket² compute plus touched-partition I/O. The prior
    * membership is anti-joined on vec_id against the delta, so a
    * replayed batch whose rows already reached a consolidation cannot
    * double-count them (vector ids must be unique across the stream).
    * The sink sees the CHANGED edges (readers consume the full graph
    * from `edges/` directly). BASELINE round-9 measures the recompute
    * fraction and `llm_lsh_occupancy` is the widen-the-bits signal —
    * and past `maxBucketFraction` occupancy the loop REFUSES a trigger
    * over existing state instead of silently degrading to a rebuild
    * (the measured 8-bit 1:100 pathology in bench_streaming.json).
    */
  def knnMaintenanceLoop(vectors: DataFrame, statePath: String,
      k: Int = 3, lshBits: Int = 8,
      checkpointDir: Option[String] = None, compactEvery: Int = 8,
      maxBucketFraction: Double = 0.5)
      (sink: (Dataset[Row], Long) => Unit = (_, _) => ()): StreamingQuery = {
    val runId = StateScheme.runIdentity(checkpointDir)
    deliver(vectors, checkpointDir) { (batch, batchId) =>
      require(compactEvery >= 2,
        s"compactEvery must be >= 2, got $compactEvery")
      val spark = batch.sparkSession
      val vPath = s"$statePath/vectors"
      val ePath = s"$statePath/edges"
      val fs = StateScheme.fsFor(spark, statePath)
      def subdirs(path: String, prefix: String): Seq[(Long, String)] = {
        val hPath = new org.apache.hadoop.fs.Path(path)
        if (fs.exists(hPath))
          fs.listStatus(hPath).toSeq.map(_.getPath.getName)
            .filter(_.startsWith(prefix))
            .map(n => n.stripPrefix(prefix).toLong -> s"$path/$n")
        else Seq.empty
      }
      val pinnedRun = StateScheme.ensure(spark, fs, s"$statePath/scheme",
        s"k=$k,lshBits=$lshBits", runId, "knnMaintenanceLoop",
        "edges built under one (k, lshBits) bucketing are meaningless " +
          "under another — continuing would corrupt the graph",
        subdirs(vPath, "b=").nonEmpty || subdirs(vPath, "c=").nonEmpty)
      StateScheme.refuseForeign("knnMaintenanceLoop", batchId, pinnedRun,
        runId, subdirs(vPath, "b=").nonEmpty || subdirs(vPath, "c=").nonEmpty,
        s"the vector/edge state at $statePath",
        "its b=0 overwrite would silently replace the owner's first " +
          "batch while stale b=N dirs persist — a mixed-run graph")
      val delta = batch.toDF.withColumn("bucket",
          graft.api.GraftPipelines.signLshBucket(col("embedding"), lshBits, 0))
        .localCheckpoint()
      val touchedSet = delta.select(col("bucket")).distinct()
        .collect().map(_.getInt(0)).toSet
      // the measured lshBits-too-narrow degeneration
      // (bench_streaming.json: 8-bit 1:100 triggers approximate a full
      // rebuild because the delta touches nearly every bucket) must
      // REFUSE, not just be documented: once prior state exists, a
      // delta occupying more than `maxBucketFraction` of the 2^lshBits
      // buckets makes the touched-bucket recompute rebuild-scale, so
      // fail loudly before writing anything and name the remedy.
      // Bootstrap seeding (no prior state yet) is exempt — the first
      // fill IS a build, rebuild-scale by definition.
      val hasPrior = subdirs(vPath, "c=").nonEmpty ||
        subdirs(vPath, "b=").exists(_._1 < batchId)
      val occupancy = touchedSet.size.toDouble / (1 << lshBits)
      if (hasPrior && occupancy > maxBucketFraction)
        throw new IllegalStateException(
          f"knnMaintenanceLoop batch $batchId: the delta touches " +
            f"${touchedSet.size}/${1 << lshBits} LSH buckets " +
            f"($occupancy%.2f > maxBucketFraction=$maxBucketFraction) — " +
            "the touched-bucket recompute would approximate a full " +
            "rebuild per trigger; widen lshBits (llm_lsh_occupancy is " +
            "the offline signal) or raise maxBucketFraction to " +
            "deliberately accept rebuild-scale triggers")
      delta.write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$vPath/b=$batchId")
      // newest consolidation at or below this batch (a replayed batch
      // may find its OWN consolidation already published — the
      // anti-join below makes that safe), then the per-batch dirs
      // strictly between it and this batch
      val cid = subdirs(vPath, "c=").map(_._1).filter(_ <= batchId)
        .maxOption.getOrElse(-1L)
      val priorTopDirs =
        (if (cid >= 0) Seq(s"$vPath/c=$cid") else Seq.empty) ++
          subdirs(vPath, "b=")
            .collect { case (b, d) if b > cid && b < batchId => d }
      // per top dir, only the touched buckets' partition subdirs;
      // basePath = the top dir itself so `bucket` is the only inferred
      // partition column regardless of b=/c= generation naming
      val prior = priorTopDirs.flatMap { td =>
        val bs = subdirs(td, "bucket=")
          .collect { case (v, p) if touchedSet.contains(v.toInt) => p }
        if (bs.isEmpty) None
        else Some(spark.read.option("basePath", td).parquet(bs: _*))
      }.reduceOption(_ unionByName _)
      val members = prior match {
        case None => delta
        case Some(p) => delta.unionByName(
          p.join(delta.select(col("vec_id")), Seq("vec_id"), "left_anti"))
      }
      val recomputed = graft.api.GraftPipelines
        .knnEdges(members.drop("bucket"), k, lshBits)
        .join(members.select(col("vec_id").as("src"), col("bucket")), "src")
        .localCheckpoint()
      recomputed.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket").parquet(ePath)
      // fold b= dirs into a fresh consolidated generation once enough
      // accumulate: inputs = newest c= plus ALL b= in (cid, batchId]
      // (disjoint by the unique-id contract — b= dirs at or below cid
      // are already inside it and are ignored, then swept). Publish by
      // rename BEFORE deleting inputs; a crash in between leaves only
      // redundant dirs that the next compaction's sweep removes.
      val liveB = subdirs(vPath, "b=")
        .filter { case (b, _) => b > cid && b <= batchId }
      if (liveB.size >= compactEvery) {
        // sweep temp dirs a crashed attempt may have left (any batch id
        // — they were never published, so they are pure garbage)
        val vDir = new org.apache.hadoop.fs.Path(vPath)
        fs.listStatus(vDir).toSeq.map(_.getPath)
          .filter(_.getName.startsWith("tmpc-"))
          .foreach(fs.delete(_, true))
        val inputs =
          (if (cid >= 0) Seq(s"$vPath/c=$cid") else Seq.empty) ++
            liveB.map(_._2)
        val tmp = new org.apache.hadoop.fs.Path(s"$vPath/tmpc-$batchId")
        inputs.map(td => spark.read.option("basePath", td).parquet(td))
          .reduce(_ unionByName _)
          .write.mode("overwrite").partitionBy("bucket")
          .parquet(tmp.toString)
        fs.rename(tmp, new org.apache.hadoop.fs.Path(s"$vPath/c=$batchId"))
        subdirs(vPath, "b=").filter(_._1 <= batchId)
          .foreach { case (_, d) =>
            fs.delete(new org.apache.hadoop.fs.Path(d), true) }
        subdirs(vPath, "c=").filter(_._1 < batchId)
          .foreach { case (_, d) =>
            fs.delete(new org.apache.hadoop.fs.Path(d), true) }
      }
      sink(recomputed.drop("bucket"), batchId)
    }
  }

  /** Streaming classification of incoming embedding vectors against a
    * FROZEN k-means fit — the streaming consumer of the batch serve
    * split's persisted centroids (`SimilarityOps.kmeansFitServed`):
    * per micro-batch, one k-row broadcast and one map-side
    * argmax-cosine pass over the delta
    * ([[graft.api.GraftPipelines.assignToCentroids]], the fit's OWN
    * assignment step, so stream and batch agree bit-for-bit), written
    * to `statePath/assign/b=<batchId>`. No shuffle of history, no
    * refit — per-trigger work is O(delta); the per-batch overwrite
    * directory makes a foreachBatch replay idempotent (at-least-once
    * delivery rewrites the same dir instead of double-appending).
    * Replay-by-overwrite requires monotonic batch ids, so resuming an
    * existing log requires the original `checkpointDir`; the scheme
    * marker pins the owning run's identity, and ANY other query —
    * un-checkpointed or started with a fresh checkpoint — refuses at
    * batch 0 over a non-empty log (its b=0 would clobber the prior
    * run's first batch while stranding its later ones).
    * Readers consume `statePath/assign` (the `b` partition column
    * records the trigger). The centroid table's fingerprint (cluster
    * ids + exact float bits) is pinned at first trigger: restarting
    * the loop against DIFFERENT centroids refuses loudly — the
    * knnMaintenanceLoop scheme-marker discipline — instead of
    * silently mixing two clusterings in one assignment log. Vector
    * ids are assumed unique across the stream (same contract as
    * knnMaintenanceLoop); the sink sees each trigger's assignment.
    */
  def clusterAssignLoop(vectors: DataFrame, centroids: DataFrame,
      statePath: String, checkpointDir: Option[String] = None)
      (sink: (Dataset[Row], Long) => Unit = (_, _) => ()): StreamingQuery = {
    // Materialize the fit ONCE on the DRIVER (k rows) and rebuild the
    // frame from the collected rows: a localCheckpoint here would park
    // the k-row blocks non-reliably on executors, and over a streaming
    // query's indefinite life any executor loss drops them — every
    // later micro-batch then dies with missing-block errors instead of
    // recomputing. A LocalRelation built from the driver-held rows
    // broadcasts fresh each trigger and survives anything short of
    // driver loss; fingerprint and assignments both derive from the
    // SAME single materialization (collecting the lazy plan twice
    // could pin bits from two different Lloyd runs).
    val centRows = centroids.collect()
    val cent = centroids.sparkSession.createDataFrame(
      java.util.Arrays.asList(centRows: _*), centroids.schema)
    val fp = {
      val rows = cent.select(col("cluster").cast("int"), col("c"))
        .collect()
        .map(r => s"${r.getInt(0)}:" + r.getSeq[Float](1)
          .map(java.lang.Float.floatToRawIntBits).mkString(","))
        .sorted.mkString("|")
      require(rows.nonEmpty,
        "clusterAssignLoop needs a non-empty centroid table — an empty " +
          "fit would pin an empty-string fingerprint and log zero-row " +
          "assignments forever (check the centroids path/fit)")
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(rows.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    // Run identity + marker via the shared [[StateScheme]] discipline:
    // only the run that OWNS an assignment log (same checkpointDir, so
    // batch ids resume monotonically) may keep appending to it. Any
    // OTHER query — un-checkpointed, or started with a fresh
    // checkpoint over the same statePath — restarts at batch 0, and
    // its b=0 overwrite would clobber the prior run's first batch
    // while stranding its later ones: a mixed log the centroid
    // fingerprint cannot catch when the fit is unchanged (caught by
    // the torn-scheme spec before the guard existed: 100 of 200
    // assignments vanished).
    val runId = StateScheme.runIdentity(checkpointDir)
    deliver(vectors, checkpointDir) { (batch, batchId) =>
      val spark = batch.sparkSession
      val fs = StateScheme.fsFor(spark, statePath)
      val pinnedRun = StateScheme.ensure(spark, fs, s"$statePath/scheme",
        fp, runId, "clusterAssignLoop",
        "the fingerprint pins the centroid table (cluster ids + exact " +
          "float bits) — mixing two clusterings in one assignment log " +
          "would be a silent wrong answer",
        fs.exists(new org.apache.hadoop.fs.Path(s"$statePath/assign")))
      StateScheme.refuseForeign("clusterAssignLoop", batchId, pinnedRun,
        runId,
        fs.exists(new org.apache.hadoop.fs.Path(s"$statePath/assign")),
        s"the assignment log at $statePath/assign",
        "its b=0 write would silently overwrite the prior run's first " +
          "batch while stranding its later ones")
      val asg = graft.api.GraftPipelines
        .assignToCentroids(batch.toDF, cent)
        .select(col("vec_id"), col("cluster"), col("ccos"))
      asg.write.mode("overwrite").parquet(s"$statePath/assign/b=$batchId")
      sink(spark.read.parquet(s"$statePath/assign/b=$batchId"), batchId)
    }
  }

  /** Streaming ingest maintenance of the near-dup cluster map — the
    * ADDITION twin of [[takedownLoop]], and the cluster-level upgrade
    * of [[ingestDedupLoop]]'s per-doc flags: document batches arrive
    * as a stream and the full chain (band index, doc store, verified
    * pairs, cluster labels) is maintained per trigger with the batch
    * extension algebra ([[graft.operators.DedupOps]]'s `extendChain`,
    * oracle-checked as `llm_dup_clusters_incremental`): components
    * MERGE where a new doc bridges two existing clusters, connected
    * components re-run only over touched components' edges plus the
    * batch's verified pairs, and untouched labels pass through.
    *
    * State under `statePath` (all bootstrapped EMPTY — production
    * seeds by streaming the initial corpus through, which is the same
    * code path):
    *
    *  - `scheme/` — run-identity marker ([[takedownLoop]] discipline):
    *    a non-owning query refuses at batch 0 over maintained state.
    *  - `bands/`, `docs/` — the batch's band rows and (id, text) rows
    *    as HASH-BUCKETED (`pb=`) dup-tolerant append logs
    *    ([[appendBucketedLog]]: bands bucketed by the band hash, docs
    *    by doc id), each bucket folded by [[compactDupTolerantLog]]
    *    once its file count passes `compactThreshold`. Bucketing is
    *    what makes the per-trigger read O(batch + touched buckets)
    *    instead of O(store): candidates scan only the batch's band
    *    buckets, verification scans only the candidate ids' doc
    *    buckets, and neither store is ever deduplicated or shuffled
    *    whole (the round-13 flat-log `distinct()`/`dropDuplicates`
    *    full-store shuffles are gone — dup tolerance moved to
    *    candidate-level dedup, see [[chainCandidatePairs]]). A
    *    replayed batch's double-append and a mid-compaction read
    *    remain harmless for the same reason.
    *  - `chain/g=<id>/{pairs,labels}` — crash-safe generations exactly
    *    as in [[takedownLoop]]; extension is IDEMPOTENT (re-adding
    *    present pairs adds nothing and CC is deterministic), so a
    *    replay landing on its own published generation rewrites
    *    identical content.
    *
    * Per trigger: only the BATCH is shingled/hashed; candidates come
    * from the batch bands joined against the accumulated band store
    * (every candidate has a batch endpoint by construction — old↔old
    * pairs are already in the chain); verification reads only
    * candidate docs' texts from the store. The sink sees the label
    * rows the batch ADDED or CHANGED (new docs entering the map and
    * old docs whose component merged under a smaller label).
    */
  def extendLoop(docs: DataFrame, statePath: String,
      checkpointDir: Option[String] = None, minJaccard: Double = 0.7,
      shingleN: Int = 3, seeds: Int = 8, bands: Int = 4,
      compactThreshold: Int = 64, storeBuckets: Int = 64,
      broadcastRowCap: Long = 1L << 20)
      (sink: (Dataset[Row], Long) => Unit = (_, _) => ()): StreamingQuery = {
    val runId = StateScheme.runIdentity(checkpointDir)
    deliver(docs, checkpointDir) { (batch, batchId) =>
      val spark = batch.sparkSession
      import spark.implicits._
      val fs = StateScheme.fsFor(spark, statePath)
      val chainRoot = s"$statePath/chain"
      val chainPath = new org.apache.hadoop.fs.Path(chainRoot)
      def gens(): Seq[Long] =
        if (!fs.exists(chainPath)) Seq.empty
        else fs.listStatus(chainPath).toSeq.map(_.getPath.getName)
          .filter(_.startsWith("g=")).map(_.stripPrefix("g=").toLong)
      def stateExists: Boolean = gens().nonEmpty ||
        Seq("bands", "docs").exists(sub =>
          fs.exists(new org.apache.hadoop.fs.Path(s"$statePath/$sub")))
      // store=pb<N> is part of the fingerprint: the bucket count IS
      // the physical layout — a pruned read under a different count
      // would silently miss candidate buckets, and pre-bucketing flat
      // state must refuse loudly rather than be misread
      val pinnedRun = labeled(spark, s"extend[$batchId] scheme guard") {
        StateScheme.ensure(spark, fs, s"$statePath/scheme",
          s"j=$minJaccard,n=$shingleN,seeds=$seeds,bands=$bands," +
            s"store=pb$storeBuckets", runId,
          "extendLoop",
          "bands/pairs from two hash schemes must never mix", stateExists)
      }
      StateScheme.refuseForeign("extendLoop", batchId, pinnedRun, runId,
        gens().exists(_ >= 0), s"the maintained chain at $chainRoot",
        "rewinding the chain would drop ingested docs from the map")
      refuseMidVacuum("extendLoop", fs, statePath)
      if (gens().isEmpty)
        publishGeneration(fs, chainRoot, -1L, Seq(
          "pairs" -> Seq.empty[(Long, Long)].toDF("d1", "d2"),
          "labels" -> Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")))
      val allGens = gens()
      val priorBelow = allGens.filter(_ < batchId).maxOption
      if (allGens.contains(batchId)) {
        // REPLAY landing on this batch's own published generation (the
        // first attempt crashed after publish): the published content
        // is final — the recompute is deterministic and
        // [[publishGeneration]] never deletes a live generation, so
        // recovery is a pure read. Re-deliver the delta from stable
        // files when the pre-publish generation still exists (the fold
        // below had not run), else the sink already saw it — empty
        // redelivery, the at-least-once contract.
        priorBelow match {
          case Some(p) =>
            val published =
              spark.read.parquet(s"$chainRoot/g=$batchId/labels")
            val pLabels = spark.read.parquet(s"$chainRoot/g=$p/labels")
            sink(published.join(pLabels, Seq("doc_id", "cluster_id"),
              "left_anti"), batchId)
            allGens.filter(_ < batchId).foreach { g =>
              fs.delete(new org.apache.hadoop.fs.Path(
                s"$chainRoot/g=$g"), true)
            }
          case None =>
            sink(Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id"),
              batchId)
        }
      } else {
      val b = batch.toDF.select(col("doc_id").cast("long").as("doc_id"),
        col("text").cast("string").as("text"))
      if (!labeled(spark, s"extend[$batchId] guard")(b.isEmpty)) {
        // hash-bucketed dup-tolerant append logs: bands of THIS batch
        // (bucketed by band hash), text of THIS batch (bucketed by doc
        // id) — a replayed batch re-appends, and candidate-level dedup
        // below cancels the double rows
        val batchBands = labeled(spark, s"extend[$batchId] batch bands") {
          graft.api.GraftPipelines
            .bandIndex(b, shingleN, seeds, bands).localCheckpoint()
        }
        val (bandPbs, nBandRows) =
          labeled(spark, s"extend[$batchId] append band log") {
            appendBucketedLog(batchBands, s"$statePath/bands",
              col("b"), storeBuckets, compactThreshold)
          }
        labeled(spark, s"extend[$batchId] append doc log") {
          appendBucketedLog(b, s"$statePath/docs", col("doc_id"),
            storeBuckets, compactThreshold)
        }
        // candidates with >= 1 batch endpoint (old↔old pairs are
        // already in the chain), normalized to d1 < d2; per-trigger
        // cost O(batch + touched buckets) — see [[chainCandidatePairs]]
        val cands = labeled(spark, s"extend[$batchId] candidates") {
          chainCandidatePairs(spark, s"$statePath/bands",
            batchBands, bandPbs, broadcastRowCap = broadcastRowCap,
            knownBatchRows = Some(nBandRows))
            .localCheckpoint()
        }
        val candDocs = labeled(spark, s"extend[$batchId] cand texts") {
          candidateDocTexts(spark, s"$statePath/docs",
            cands, storeBuckets, broadcastRowCap).localCheckpoint()
        }
        val newPairs = graft.api.GraftPipelines
          .nearDuplicatesFromCandidates(candDocs, cands, minJaccard)
          .select(col("d1"), col("d2"))
        val prior = priorBelow.get // bootstrap guaranteed g=-1
        val pPairs =
          spark.read.parquet(s"$chainRoot/g=$prior/pairs")
        val pLabels =
          spark.read.parquet(s"$chainRoot/g=$prior/labels")
        // materialize once: consumed by extendChain AND the pair union
        val np = labeled(spark, s"extend[$batchId] verify") {
          newPairs.localCheckpoint()
        }
        val next = labeled(spark, s"extend[$batchId] chain extend (CC)") {
          graft.operators.DedupOps.extendChain(spark, pPairs, pLabels, np)
        }
        labeled(spark, s"extend[$batchId] publish") {
          publishGeneration(fs, chainRoot, batchId, Seq(
            "pairs" -> pPairs.select(col("d1"), col("d2")).union(np)
              .distinct(),
            "labels" -> next))
        }
        val published =
          spark.read.parquet(s"$chainRoot/g=$batchId/labels")
        // delta = rows current now that were not current before (new
        // docs entering the map + merge relabels); the g=prior files
        // this joins still exist — publish never deletes, and older
        // generations fold only after the sink returns
        labeled(spark, s"extend[$batchId] delta sink") {
          sink(published.join(pLabels, Seq("doc_id", "cluster_id"),
            "left_anti"), batchId)
        }
        gens().filter(_ < batchId).foreach { g =>
          fs.delete(new org.apache.hadoop.fs.Path(
            s"$chainRoot/g=$g"), true)
        }
      } else sink(Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id"),
        batchId)
      }
    }
  }

  /** UNIFIED streaming chain maintenance — adds and takedowns in ONE
    * stream, the shape a real recurring pipeline has (docs arrive and
    * right-to-be-forgotten requests land in the same window). Each
    * micro-batch carries rows `(op, doc_id, text)` with op = 'add'
    * (text = document) or 'del' (text ignored); the batch applies its
    * deletes FIRST, then its adds, via the composed batch algebra
    * ([[graft.operators.DedupOps]]'s `upsertChain` = retractChain ∘
    * extendChain, oracle-checked as `llm_dedup_upsert`).
    *
    * State under `statePath` — the [[extendLoop]] layout plus a
    * tombstone log:
    *
    *  - `scheme/`, `chain/g=<id>/{pairs,labels}` — exactly as
    *    [[extendLoop]]/[[takedownLoop]] (shared [[StateScheme]] marker
    *    and [[publishGeneration]] crash-safety).
    *  - `bands/`, `docs/` — hash-bucketed (`pb=`) dup-tolerant append
    *    logs of ADDED docs ([[appendBucketedLog]] — the [[extendLoop]]
    *    bucketing, same O(batch + touched buckets) per-trigger reads).
    *  - `dels/` — the tombstone log: deleted doc ids, appended per
    *    batch, folded like the other logs. Every band/doc READ
    *    anti-joins it, so a deleted doc can never generate another
    *    candidate pair; the rows physically persist until
    *    [[graft.operators.DedupOps.vacuumChainState]] rewrites the
    *    logs offline (the tombstone model every log-structured store
    *    uses — deletion is a read-side filter plus eventual
    *    compaction, never an in-place scrub; the vacuum is the
    *    right-to-be-forgotten completion that takes the text off
    *    disk).
    *
    * Contracts: doc ids are never reused after deletion (tombstones
    * are permanent), and one batch must not both add and delete the
    * same id — ENFORCED, the batch fails loudly. (No apply order
    * rescues that case: tombstones land before candidate generation,
    * so the delete would win on the corpus side while the batch-band
    * probe side could still pair the doc — an inconsistent chain,
    * which is why the loop refuses instead of picking a winner.)
    * The sink sees the
    * label-map DELTA as `(doc_id, cluster_id, op)` rows — op 'add'
    * for rows entering the map (new docs, merge relabels, split
    * relabels) and 'del' for rows leaving it; readers consume the
    * newest `chain/g=` generation directly.
    */
  def upsertLoop(ops: DataFrame, statePath: String,
      checkpointDir: Option[String] = None, minJaccard: Double = 0.7,
      shingleN: Int = 3, seeds: Int = 8, bands: Int = 4,
      compactThreshold: Int = 64, storeBuckets: Int = 64,
      broadcastRowCap: Long = 1L << 20)
      (sink: (Dataset[Row], Long) => Unit = (_, _) => ()): StreamingQuery = {
    val runId = StateScheme.runIdentity(checkpointDir)
    deliver(ops, checkpointDir) { (batch, batchId) =>
      val spark = batch.sparkSession
      import spark.implicits._
      val fs = StateScheme.fsFor(spark, statePath)
      val chainRoot = s"$statePath/chain"
      val chainPath = new org.apache.hadoop.fs.Path(chainRoot)
      def gens(): Seq[Long] =
        if (!fs.exists(chainPath)) Seq.empty
        else fs.listStatus(chainPath).toSeq.map(_.getPath.getName)
          .filter(_.startsWith("g=")).map(_.stripPrefix("g=").toLong)
      def stateExists: Boolean = gens().nonEmpty ||
        Seq("bands", "docs", "dels").exists(sub =>
          fs.exists(new org.apache.hadoop.fs.Path(s"$statePath/$sub")))
      // store=pb<N> in the fingerprint: the extendLoop rationale — the
      // bucket count is the physical layout and must never drift
      val pinnedRun = labeled(spark, s"upsert[$batchId] scheme guard") {
        StateScheme.ensure(spark, fs, s"$statePath/scheme",
          s"j=$minJaccard,n=$shingleN,seeds=$seeds,bands=$bands," +
            s"store=pb$storeBuckets", runId,
          "upsertLoop",
          "bands/pairs from two hash schemes must never mix", stateExists)
      }
      StateScheme.refuseForeign("upsertLoop", batchId, pinnedRun, runId,
        gens().exists(_ >= 0), s"the maintained chain at $chainRoot",
        "rewinding the chain would drop ingested docs and resurrect " +
          "taken-down ones")
      refuseMidVacuum("upsertLoop", fs, statePath)
      if (gens().isEmpty)
        publishGeneration(fs, chainRoot, -1L, Seq(
          "pairs" -> Seq.empty[(Long, Long)].toDF("d1", "d2"),
          "labels" -> Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")))
      def emptyDelta() = Seq.empty[(Long, Long, String)]
        .toDF("doc_id", "cluster_id", "op")
      def labelDelta(published: DataFrame, prior: DataFrame): DataFrame =
        published.join(prior, Seq("doc_id", "cluster_id"), "left_anti")
          .select(col("doc_id"), col("cluster_id"), lit("add").as("op"))
          .unionByName(
            prior.join(published, Seq("doc_id", "cluster_id"), "left_anti")
              .select(col("doc_id"), col("cluster_id"),
                lit("del").as("op")))
      val allGens = gens()
      val priorBelow = allGens.filter(_ < batchId).maxOption
      if (allGens.contains(batchId)) {
        // REPLAY onto own published generation — the extend/takedown
        // recovery contract: published content is final, delta from
        // stable files when the pre-publish generation survives
        priorBelow match {
          case Some(p) =>
            val published =
              spark.read.parquet(s"$chainRoot/g=$batchId/labels")
            val pLabels = spark.read.parquet(s"$chainRoot/g=$p/labels")
            sink(labelDelta(published, pLabels), batchId)
            allGens.filter(_ < batchId).foreach { g =>
              fs.delete(new org.apache.hadoop.fs.Path(
                s"$chainRoot/g=$g"), true)
            }
          case None => sink(emptyDelta(), batchId)
        }
      } else {
      val b = labeled(spark, s"upsert[$batchId] guard") {
        batch.toDF.select(
          lower(col("op")).cast("string").as("op"),
          col("doc_id").cast("long").as("doc_id"),
          col("text").cast("string").as("text")).localCheckpoint()
      }
      // an unrecognized op must fail the batch, not silently drop the
      // row — a typo'd 'delete' swallowed here would be a takedown
      // that never happened. The explicit isNull arm matters: under
      // three-valued logic `!isin` is NULL for a null op, so without
      // it a null-op row would pass neither this check nor the
      // adds/dels filters below — the exact silent drop this guard
      // exists to prevent.
      // BOTH guards (bad op, same-batch add+del) plus the empty/adds/
      // dels presence tests come off ONE two-level aggregate over the
      // checkpointed batch — the round-14 shape ran them as four
      // separate collect jobs per trigger, pure floor; the detailed
      // limit-5 collects that name the offending values run only on
      // the (rare) violation path, so the messages are unchanged.
      val isBad = col("op").isNull || !col("op").isin("add", "del")
      val gstats = labeled(spark, s"upsert[$batchId] batch guards") {
        b.groupBy(col("doc_id"))
          .agg(max(when(col("op") === "add", 1).otherwise(0)).as("ha"),
            max(when(col("op") === "del", 1).otherwise(0)).as("hd"),
            sum(when(isBad, 1L).otherwise(0L)).as("bad"))
          .agg(coalesce(sum(col("bad")), lit(0L)).as("n_bad"),
            coalesce(sum(col("ha") * col("hd")).cast("long"), lit(0L))
              .as("n_add_del"),
            coalesce(sum(col("ha")).cast("long"), lit(0L)).as("n_adds"),
            coalesce(sum(col("hd")).cast("long"), lit(0L)).as("n_dels"),
            count(lit(1)).as("n_keys"))
          .head()
      }
      val adds = b.filter(col("op") === "add").drop("op")
      val dels = b.filter(col("op") === "del")
        .select(col("doc_id").as("del_id")).distinct()
      if (gstats.getLong(0) > 0L) {
        val badOps = b.filter(isBad).limit(5).collect()
        require(badOps.isEmpty,
          s"upsertLoop batch $batchId: unrecognized op value(s) " +
            s"${badOps.map(r => String.valueOf(r.getString(0))).distinct
              .mkString(", ")} — only 'add' and 'del' are defined")
      }
      // same-batch add+del of one id is a contract violation, and it
      // must fail HERE rather than rely on apply order: tombstones
      // land before candidate generation (the delete would win on the
      // corpus side) while the unfiltered batch-band probe side could
      // still pair the doc — a tombstoned doc stuck in the label map
      if (gstats.getLong(1) > 0L) {
        val addDel = adds.select(col("doc_id"))
          .join(dels, col("doc_id") === col("del_id"), "left_semi")
          .limit(5).collect()
        require(addDel.isEmpty,
          s"upsertLoop batch $batchId: doc id(s) " +
            s"${addDel.map(_.getLong(0)).mkString(", ")} appear as BOTH " +
            "add and del in one batch — the contract forbids it (split " +
            "the ops across batches: del then add re-uses a tombstoned " +
            "id, which is also forbidden)")
      }
      val batchEmpty = gstats.getLong(4) == 0L
      val addsEmpty = gstats.getLong(2) == 0L
      val delsEmpty = gstats.getLong(3) == 0L
      if (!batchEmpty) {
        // tombstones first: appended before any read, so this batch's
        // own candidate generation already excludes them
        if (!delsEmpty) {
          labeled(spark, s"upsert[$batchId] append tombstones") {
            dels.write.mode("append").parquet(s"$statePath/dels")
            compactDupTolerantLog(spark, s"$statePath/dels",
              compactThreshold)
          }
        }
        // the tombstone set: O(dels log), small relative to the corpus
        // and measured separately (bench_streaming.json records how the
        // anti-join scales with dels/ size)
        val tombs = labeled(spark, s"upsert[$batchId] tombstone set") {
          try spark.read.parquet(s"$statePath/dels")
            .select(col("del_id")).distinct().localCheckpoint()
          catch {
            case _: org.apache.spark.sql.AnalysisException =>
              Seq.empty[Long].toDF("del_id")
          }
        }
        val newPairs =
          if (addsEmpty)
            Seq.empty[(Long, Long)].toDF("d1", "d2")
          else {
            val batchBands = labeled(spark,
                s"upsert[$batchId] batch bands") {
              graft.api.GraftPipelines
                .bandIndex(adds, shingleN, seeds, bands).localCheckpoint()
            }
            val (bandPbs, nBandRows) = labeled(spark,
                s"upsert[$batchId] append band log") {
              appendBucketedLog(batchBands,
                s"$statePath/bands", col("b"), storeBuckets,
                compactThreshold)
            }
            labeled(spark, s"upsert[$batchId] append doc log") {
              appendBucketedLog(adds, s"$statePath/docs", col("doc_id"),
                storeBuckets, compactThreshold)
            }
            // candidates: bucket-pruned probe, tombstone-anti-joined so
            // a deleted doc never generates another candidate — and
            // therefore the candidate ids (batch adds on one side,
            // tombstone-filtered store on the other) are already
            // tombstone-clean when the doc texts are fetched
            val cands = labeled(spark, s"upsert[$batchId] candidates") {
              chainCandidatePairs(spark, s"$statePath/bands",
                batchBands, bandPbs, Some(tombs), broadcastRowCap,
                knownBatchRows = Some(nBandRows))
                .localCheckpoint()
            }
            val candDocs = labeled(spark, s"upsert[$batchId] cand texts") {
              candidateDocTexts(spark, s"$statePath/docs",
                cands, storeBuckets, broadcastRowCap).localCheckpoint()
            }
            graft.api.GraftPipelines
              .nearDuplicatesFromCandidates(candDocs, cands, minJaccard)
              .select(col("d1"), col("d2"))
          }
        val prior = priorBelow.get // bootstrap guaranteed g=-1
        val pPairs = spark.read.parquet(s"$chainRoot/g=$prior/pairs")
        val pLabels = spark.read.parquet(s"$chainRoot/g=$prior/labels")
        val (nextPairs, nextLabels) =
          labeled(spark, s"upsert[$batchId] chain upsert (CC)") {
            graft.operators.DedupOps
              .upsertChain(spark, pPairs, pLabels, dels, newPairs)
          }
        labeled(spark, s"upsert[$batchId] publish") {
          publishGeneration(fs, chainRoot, batchId,
            Seq("pairs" -> nextPairs, "labels" -> nextLabels))
        }
        val published =
          spark.read.parquet(s"$chainRoot/g=$batchId/labels")
        labeled(spark, s"upsert[$batchId] delta sink") {
          sink(labelDelta(published, pLabels), batchId)
        }
        gens().filter(_ < batchId).foreach { g =>
          fs.delete(new org.apache.hadoop.fs.Path(
            s"$chainRoot/g=$g"), true)
        }
      } else sink(emptyDelta(), batchId)
      }
    }
  }

  /** Streaming takedown maintenance of the near-dup cluster chain —
    * the streaming consumer of the batch retraction algebra
    * ([[graft.operators.DedupOps]]'s `retractChain`, oracle-checked as
    * `llm_dedup_retract`): delete batches (doc ids to forget) arrive
    * as a stream, and the persisted chain (surviving verified pairs +
    * cluster label map) is re-published per trigger without ever
    * re-shingling corpus text. Per-trigger work is O(pairs) for the
    * retraction anti-joins plus connected components over ONLY
    * deletion-affected clusters — a takedown naming millions of docs
    * still touches a vanishing fraction of a 100 TB corpus's clusters,
    * and untouched components' labels pass straight through.
    *
    * State under `statePath`:
    *
    *  - `scheme/` — (seed fingerprint, run identity) marker, the
    *    shared [[StateScheme]] discipline: the seed chain is
    *    fingerprinted by an order-independent aggregate (count + xor
    *    of per-row hashes — the chain tables are pair-count-sized, too
    *    big to collect like the k-row centroid table), so restarting
    *    against a DIFFERENT seed refuses loudly; and any query that
    *    does not own the state (fresh or absent checkpoint) refuses at
    *    batch 0 over already-maintained state instead of silently
    *    rewinding it to the seed.
    *  - `chain/g=<id>/{pairs,labels}` — one generation per trigger
    *    (id = batchId; the caller's seed publishes as `g=-1` at
    *    bootstrap). A batch reads the newest published generation
    *    BELOW its id, applies its deletes, publishes its own
    *    generation crash-safely ([[publishGeneration]]: pid-private
    *    tmp dir + one rename, never deleting a live generation), and
    *    folds older generations only AFTER the sink returns. A replay
    *    landing on its OWN published generation therefore skips the
    *    recompute — the published content is final (retraction is
    *    deterministic and idempotent) — and re-delivers the
    *    invalidated-label delta from stable files while the
    *    pre-publish generation still exists, or an empty frame once
    *    the fold already committed (at-least-once delivery). No code
    *    path ever deletes the newest generation, so taken-down docs
    *    can never resurrect through a crash window.
    *
    * The sink sees the label rows the batch INVALIDATED (docs dropped
    * from the map or moved to a split component's new label); readers
    * consume the newest `chain/g=` generation directly.
    */
  def takedownLoop(deletes: DataFrame, seedPairs: DataFrame,
      seedLabels: DataFrame, statePath: String,
      checkpointDir: Option[String] = None)
      (sink: (Dataset[Row], Long) => Unit = (_, _) => ()): StreamingQuery = {
    val runId = StateScheme.runIdentity(checkpointDir)
    def tableFp(df: DataFrame): String = {
      val cols = df.columns.toSeq
      val r = df.select(xxhash64(cols.map(col): _*).as("h"))
        .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("x")).head()
      s"${r.getLong(0)}:${if (r.isNullAt(1)) 0L else r.getLong(1)}"
    }
    val fp = tableFp(seedPairs.select(col("d1"), col("d2"))) + "|" +
      tableFp(seedLabels.select(col("doc_id"), col("cluster_id")))
    deliver(deletes, checkpointDir) { (batch, batchId) =>
      val spark = batch.sparkSession
      import spark.implicits._
      val fs = StateScheme.fsFor(spark, statePath)
      val chainRoot = s"$statePath/chain"
      val chainPath = new org.apache.hadoop.fs.Path(chainRoot)
      def gens(): Seq[Long] =
        if (!fs.exists(chainPath)) Seq.empty
        else fs.listStatus(chainPath).toSeq.map(_.getPath.getName)
          .filter(_.startsWith("g=")).map(_.stripPrefix("g=").toLong)
      val pinnedRun = StateScheme.ensure(spark, fs, s"$statePath/scheme",
        fp, runId, "takedownLoop",
        "the fingerprint pins the seed chain — applying takedowns " +
          "across two different dedup chains would be a silent wrong " +
          "answer", gens().nonEmpty)
      StateScheme.refuseForeign("takedownLoop", batchId, pinnedRun, runId,
        gens().exists(_ >= 0), s"the maintained chain at $chainRoot",
        "rewinding the chain to an older generation would resurrect " +
          "taken-down docs")
      if (gens().isEmpty)
        publishGeneration(fs, chainRoot, -1L, Seq(
          "pairs" -> seedPairs.select(col("d1"), col("d2")),
          "labels" -> seedLabels.select(col("doc_id"), col("cluster_id"))))
      val allGens = gens()
      val priorBelow = allGens.filter(_ < batchId).maxOption
      val del = batch.toDF
        .select(col(batch.columns.head).cast("long").as("del_id"))
        .distinct()
      if (allGens.contains(batchId)) {
        // REPLAY landing on this batch's own published generation: the
        // published content is final (see the scaladoc) — re-deliver
        // the invalidated delta from stable files when the pre-publish
        // generation survives, else the sink already saw it.
        priorBelow match {
          case Some(p) =>
            val published =
              spark.read.parquet(s"$chainRoot/g=$batchId/labels")
            val pLabels = spark.read.parquet(s"$chainRoot/g=$p/labels")
            sink(pLabels.join(published, Seq("doc_id", "cluster_id"),
              "left_anti"), batchId)
            allGens.filter(_ < batchId).foreach { g =>
              fs.delete(new org.apache.hadoop.fs.Path(
                s"$chainRoot/g=$g"), true)
            }
          case None =>
            sink(Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id"),
              batchId)
        }
      } else if (!del.isEmpty) {
        val prior = priorBelow.get // bootstrap guaranteed g=-1
        val pPairs = spark.read.parquet(s"$chainRoot/g=$prior/pairs")
        val pLabels =
          spark.read.parquet(s"$chainRoot/g=$prior/labels")
        val (kept, next) = graft.operators.DedupOps
          .retractChain(spark, pPairs, pLabels, del)
        publishGeneration(fs, chainRoot, batchId,
          Seq("pairs" -> kept, "labels" -> next))
        // invalidated = prior labels no longer current; computed while
        // the prior generation's files still exist (publish never
        // deletes), against the PUBLISHED read-back (stable files,
        // not the lazy plan)
        val published =
          spark.read.parquet(s"$chainRoot/g=$batchId/labels")
        sink(pLabels.join(published, Seq("doc_id", "cluster_id"),
          "left_anti"), batchId)
        gens().filter(_ < batchId).foreach { g =>
          fs.delete(new org.apache.hadoop.fs.Path(
            s"$chainRoot/g=$g"), true)
        }
      } else sink(Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id"),
        batchId)
    }
  }

  /** Streaming MERGE/upsert maintenance: keep a keyed snapshot current
    * against an update stream — the streaming twin of the batch
    * `rel_merge_upsert` ([[graft.operators.MaintenanceOps]]). Per
    * micro-batch:
    *
    *  1. reduce the batch to its latest update per key (`seq` orders
    *     versions within a key; it must be non-null and unique per key
    *     within a batch, the usual event-version contract — ENFORCED:
    *     a violating batch fails the query rather than silently picking
    *     an arbitrary winner);
    *  2. read the PREVIOUS snapshot version — the greatest `v=` dir
    *     strictly below this batchId, never one this attempt may have
    *     half-written, so a foreachBatch replay re-reads intact input
    *     and overwrites only its own output: exactly-once by
    *     idempotent rewrite;
    *  3. full-outer merge on the key, entire-row latest-wins;
    *  4. write snapshot `v=batchId` — copy-on-write versioning, the
    *     model production table formats use (old versions remain for
    *     time travel until vacuumed).
    *
    * At 100 TB the per-trigger merge is the same keyed full-outer
    * shuffle as the batch form (partition-prunable to touched keys);
    * the version listing is a metadata-only FS call.
    */
  def snapshotUpsertLoop(updates: DataFrame, snapshotPath: String,
      key: String, seq: String, checkpointDir: Option[String] = None)
      (sink: (Dataset[Row], Long) => Unit = (_, _) => ()): StreamingQuery = {
    val runId = StateScheme.runIdentity(checkpointDir)
    deliver(updates, checkpointDir) { (batch, batchId) =>
      val spark = batch.sparkSession
      // Scheme discipline ([[StateScheme]], hidden `_scheme` so plain
      // readers of v= dirs and partition discovery never see it): the
      // (key, seq) columns pin the merge semantics, and ownership
      // gates batch 0 — a foreign run restarts its version numbering
      // at v=0, so its first merge would read NO prior version
      // (prev = greatest v < 0) and silently re-bootstrap the snapshot
      // from empty: total state loss, the loudest possible case for
      // the refusal.
      val schemeFs = StateScheme.fsFor(spark, snapshotPath)
      def versionsExist: Boolean = {
        val p = new org.apache.hadoop.fs.Path(snapshotPath)
        schemeFs.exists(p) && schemeFs.listStatus(p).toSeq
          .exists(_.getPath.getName.startsWith("v="))
      }
      val pinnedRun = StateScheme.ensure(spark, schemeFs,
        s"$snapshotPath/_scheme", s"key=$key,seq=$seq", runId,
        "snapshotUpsertLoop",
        "merging under different (key, seq) columns would corrupt " +
          "latest-wins semantics", versionsExist)
      StateScheme.refuseForeign("snapshotUpsertLoop", batchId, pinnedRun,
        runId, versionsExist, s"the snapshot at $snapshotPath",
        "its v=0 merge would read no prior version and silently " +
          "re-bootstrap the snapshot from empty")
      val cols = batch.toDF.columns.toSeq
      // Latest-wins is only well-defined when every update carries a
      // non-null seq and (key, seq) is unique within the batch. A null
      // seq would sort last and silently lose; a duplicate (key, seq)
      // would let row_number pick a nondeterministic winner. Fail
      // loudly instead — one small agg job over the micro-batch.
      val viol = batch.toDF.agg(
        sum(when(col(seq).isNull, 1L).otherwise(0L)).as("nulls"),
        (count(lit(1)) - countDistinct(col(key), col(seq))).as("dups"))
        .head()
      require(viol.isNullAt(0) || viol.getLong(0) == 0L,
        s"snapshotUpsertLoop batch $batchId: ${viol.getLong(0)} update " +
          s"row(s) with null $seq — latest-wins undefined")
      require(viol.getLong(1) == 0L,
        s"snapshotUpsertLoop batch $batchId: ${viol.getLong(1)} duplicate " +
          s"($key, $seq) pair(s) — latest-wins ambiguous")
      val latest = batch.toDF
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col(key)).orderBy(col(seq).desc)))
        .filter(col("__rn") === 1).drop("__rn")
        // Non-null presence marker: the full-outer side test must not
        // ride on a data column (a null there would misread "absent").
        .withColumn("__upd", lit(true))
      val hPath = new org.apache.hadoop.fs.Path(snapshotPath)
      val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val prev: Option[Long] =
        if (fs.exists(hPath))
          fs.listStatus(hPath).toSeq
            .map(_.getPath.getName).filter(_.startsWith("v="))
            .map(_.stripPrefix("v=").toLong).filter(_ < batchId)
            .sorted.lastOption
        else None
      val current = prev match {
        case Some(v) => spark.read.parquet(s"$snapshotPath/v=$v")
        case None    => batch.toDF.limit(0)
      }
      val updatePresent = col("u.__upd").isNotNull
      val merged = current.as("t").join(latest.as("u"),
          col(s"t.$key") === col(s"u.$key"), "full_outer")
        .select(cols.map(c =>
          when(updatePresent, col(s"u.$c")).otherwise(col(s"t.$c")).as(c)): _*)
      merged.write.mode("overwrite").parquet(s"$snapshotPath/v=$batchId")
      sink(spark.read.parquet(s"$snapshotPath/v=$batchId"), batchId)
    }
  }

  /** The ONE scheme-marker discipline every stateful maintenance loop
    * shares (knn graph, cluster-assign, ingest dedup, inverted index,
    * curation, chain extend/takedown, snapshot upsert). A marker is a
    * 1-row parquet table `(fp, run)` published next to the loop's
    * state:
    *
    *  - `fp` — the parameter fingerprint the state was built under
    *    (hash seeds, band counts, centroid bits, key/seq columns …).
    *    State written under one scheme is meaningless — or silently
    *    WRONG — when read under another, so a mismatched restart must
    *    fail loudly, never mix.
    *  - `run` — the identity of the query that owns the state: its
    *    `checkpointDir` when given (stable across restarts — the
    *    resume IS the same run), else a per-invocation UUID. A query
    *    that does not own existing state restarts its batch ids at 0,
    *    and what batch 0 does to maintained state is loop-specific but
    *    always bad: per-batch-id overwrites clobber the owner's first
    *    batch, generation chains rewind to the seed, snapshots
    *    re-bootstrap from empty. [[refuseForeign]] makes each of those
    *    a loud refusal at batch 0.
    *
    * Publication is atomic (the GraftIO.buildOnce discipline in
    * Hadoop-FS terms): build in a pid-private temp dir, publish with
    * one rename — a crash mid-write leaves only a swept tmp dir, never
    * a torn marker that wedges every restart with a schema-inference
    * error. Losing a concurrent publish race is benign (the winner's
    * marker stands), with one Hadoop-FS wrinkle: rename(src, dst) onto
    * an EXISTING directory dst moves src INTO dst and returns true
    * (HDFS and RawLocalFileSystem alike), so the loser's tmp can land
    * nested under the winner's marker — where its parquet files would
    * read back as extra marker rows and make the `.head()` below
    * nondeterministic. The nested copy is detected and removed.
    */
  private[streaming] object StateScheme {
    import org.apache.hadoop.fs.{FileSystem, Path}

    def fsFor(spark: SparkSession, path: String): FileSystem =
      new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

    /** Run identity of the invoking query: the checkpointDir when
      * given (restarts resume it — same run), else a fresh UUID (an
      * un-checkpointed query can never prove ownership across
      * restarts, so each invocation is its own run).
      */
    def runIdentity(checkpointDir: Option[String]): String =
      checkpointDir.getOrElse(
        s"uncheckpointed-${java.util.UUID.randomUUID()}")

    /** Publish-if-absent, then verify: ensures the marker at
      * `markerPath` exists (atomic tmp→rename publication, stale
      * `<marker>.tmp-*` dirs from crashed publishers swept first),
      * requires its parameter fingerprint equals `fp`, and returns the
      * pinned run identity — null when the marker predates the run
      * column (legacy: unknown ownership, which [[refuseForeign]]
      * treats as foreign — loud, never silent). A legacy
      * knnMaintenanceLoop marker (bare `k`/`lsh_bits` columns) is
      * read back as the equivalent `k=…,lshBits=…` fingerprint.
      *
      * A marker is only MINTED over genuinely empty state: when
      * `stateExists` (the same lazily-evaluated predicate the caller
      * hands [[refuseForeign]]) reports state files but no marker —
      * pre-marker-era state, or a state dir whose marker was lost —
      * minting would pin the CURRENT run as owner and the batch-0
      * foreign-run refusal could never fire, so ensure refuses
      * instead unless `adoptExisting` names the continuation
      * deliberately (the append-log loops thread their caller flag
      * through; the generation/chain loops never adopt — markerless
      * chain state forces an explicit rebuild or a fresh statePath).
      */
    /** Per-JVM memo of SUCCESSFUL marker validations, keyed by the full
      * (markerPath, fp, runId) triple and holding the pinned run. A
      * marker is write-once (publish-if-absent; the ownership gate
      * admits one writer), so once THIS (run, params) triple validated
      * against it, re-reading the 1-row parquet every micro-batch is
      * pure trigger floor (2 jobs + a footer read — measured in the
      * DevTrigProf r15 breakdown). A DIFFERENT run or fp never hits the
      * memo (key mismatch → full validation → the refusal paths fire
      * exactly as before), and the marker's continued EXISTENCE is
      * re-checked per trigger (one FS stat, no job) so externally
      * cleared state falls back to the full publish-if-absent path.
      */
    private val validated =
      new java.util.concurrent.ConcurrentHashMap[String, Option[String]]()

    def ensure(spark: SparkSession, fs: FileSystem, markerPath: String,
        fp: String, runId: String, loop: String,
        mismatchConsequence: String, stateExists: => Boolean = false,
        adoptExisting: Boolean = false): String = {
      import spark.implicits._
      val sPath = new Path(markerPath)
      val memoKey = s"$markerPath|$fp|$runId"
      val memoHit = validated.get(memoKey)
      if (memoHit != null && fs.exists(sPath)) return memoHit.orNull
      if (!fs.exists(sPath)) {
        if (stateExists && !adoptExisting)
          throw new IllegalStateException(
            s"$loop: state files already exist under " +
              s"${sPath.getParent} but no scheme marker does — minting " +
              "one would make this run the owner and silence the " +
              "foreign-run refusal over state it never built; pass " +
              "adoptExisting = true (append-log loops) to continue " +
              "deliberately, or use a fresh statePath")
        val parent = sPath.getParent
        if (fs.exists(parent))
          fs.listStatus(parent).toSeq.map(_.getPath)
            .filter(_.getName.startsWith(s"${sPath.getName}.tmp-"))
            .foreach(fs.delete(_, true))
        val tmp = new Path(
          s"$markerPath.tmp-${ProcessHandle.current().pid()}")
        Seq((fp, runId)).toDF("fp", "run")
          .write.mode("overwrite").parquet(tmp.toString)
        if (!fs.rename(tmp, sPath)) fs.delete(tmp, true) // lost the race
        val nested = new Path(sPath, tmp.getName)
        if (fs.exists(nested)) fs.delete(nested, true)
      }
      val scheme = spark.read.parquet(sPath.toString).head()
      val names = scheme.schema.fieldNames
      val pinnedFp =
        if (names.contains("fp")) scheme.getAs[String]("fp")
        else if (names.contains("k") && names.contains("lsh_bits"))
          s"k=${scheme.getAs[Int]("k")},lshBits=${scheme.getAs[Int]("lsh_bits")}"
        else sys.error(s"$loop: unrecognizable scheme marker at $markerPath")
      require(pinnedFp == fp,
        s"$loop state at $markerPath was built under a different scheme " +
          s"(pinned $pinnedFp, got $fp) — $mismatchConsequence; rebuild " +
          "the state or restore the original parameters")
      val pinnedRun =
        if (names.contains("run")) scheme.getAs[String]("run") else null
      validated.put(memoKey, Option(pinnedRun))
      pinnedRun
    }

    /** The batch-0 ownership gate: a query whose run identity differs
      * from the marker's pin, starting at batch 0 over EXISTING state
      * (`stateExists` — evaluated lazily, an FS listing), refuses
      * loudly with the loop-specific consequence instead of silently
      * corrupting the owner's state. Only batch 0 gates: the owning
      * run's replays and resumes carry the pinned identity, and later
      * batch ids only exist under the owning checkpoint.
      */
    def refuseForeign(loop: String, batchId: Long, pinnedRun: String,
        runId: String, stateExists: => Boolean, what: String,
        consequence: String): Unit =
      if (batchId == 0 && pinnedRun != runId && stateExists)
        throw new IllegalStateException(
          s"$loop: $what is owned by a different run " +
            s"(pinned ${Option(pinnedRun).getOrElse("<legacy marker>")}, " +
            s"got $runId) but this query starts at batch 0 — " +
            s"$consequence; resume with the original checkpointDir or " +
            "use a fresh statePath")
  }

  /** Crash-safe generation publish for the chain loops (extend /
    * takedown): write every part under a pid-private `tmpg-` dir, then
    * ONE rename to `g=<id>`. Never deletes an existing destination —
    * the recompute that produced `parts` is deterministic from the
    * prior generation plus the same batch, so a replay landing on its
    * own published generation finds identical content already there
    * and SKIPS (the delete-then-rename it replaces could crash between
    * the two and wipe the only generation: extendLoop would lose every
    * old↔old pair accumulated so far, takedownLoop would re-seed and
    * resurrect taken-down docs — a right-to-be-forgotten violation).
    * A failed rename throws (unlike the scheme marker there is no
    * benign concurrent-publisher case — the ownership gate admits one
    * writer), and stale `tmpg-` dirs from crashed attempts are swept
    * before writing.
    */
  private def publishGeneration(fs: org.apache.hadoop.fs.FileSystem,
      chainRoot: String, id: Long,
      parts: Seq[(String, DataFrame)]): Unit = {
    val dst = new org.apache.hadoop.fs.Path(s"$chainRoot/g=$id")
    if (fs.exists(dst)) return // replay: identical content already live
    val rootPath = new org.apache.hadoop.fs.Path(chainRoot)
    if (fs.exists(rootPath))
      fs.listStatus(rootPath).toSeq.map(_.getPath)
        .filter(_.getName.startsWith("tmpg-"))
        .foreach(fs.delete(_, true))
    val tmp = new org.apache.hadoop.fs.Path(
      s"$chainRoot/tmpg-${ProcessHandle.current().pid()}-$id")
    parts.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$tmp/$name")
    }
    if (!fs.rename(tmp, dst)) {
      fs.delete(tmp, true)
      throw new IllegalStateException(
        s"publishGeneration: rename $tmp -> $dst failed — refusing to " +
          "continue against an unpublished generation (a silent skip " +
          "here surfaces later as a confusing missing-path read)")
    }
  }

  /** Incremental delivery via foreachBatch — the caller's sink sees each
    * micro-batch as (batchDF, batchId), the non-blocking poll loop of the
    * reference UI (src/main.cpp:1273) in Spark form. Pass a
    * `checkpointDir` and a restarted query resumes exactly where the
    * previous run stopped (source offsets + state recovered — files
    * already delivered are never reprocessed), the property that makes
    * incremental delivery restartable over a 100 TB backlog.
    */
  def deliver(df: DataFrame, checkpointDir: Option[String] = None)
      (sink: (Dataset[Row], Long) => Unit): StreamingQuery = {
    val w = df.writeStream
      .outputMode(appendMode)
      .foreachBatch(sink)
    checkpointDir.fold(w)(d => w.option("checkpointLocation", d)).start()
  }

  /** Bounded catch-up run (Trigger.AvailableNow): process everything the
    * source holds AT START — respecting its rate limits across as many
    * micro-batches as that takes, unlike the deprecated Trigger.Once —
    * then terminate on its own. This is the nightly-backfill primitive:
    * the same streaming query, checkpoint, and sink as the live run,
    * executed as a finite job. With a `checkpointDir`, a later backfill
    * resumes from the recorded offsets and processes ONLY files that
    * arrived since — exactly-once across runs, which is what lets a
    * 100 TB backlog drain in resumable rate-limited slices.
    */
  def backfill(df: DataFrame, checkpointDir: Option[String] = None)
      (sink: (Dataset[Row], Long) => Unit): StreamingQuery = {
    val w = df.writeStream
      .outputMode(appendMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch(sink)
    checkpointDir.fold(w)(d => w.option("checkpointLocation", d)).start()
  }
}
