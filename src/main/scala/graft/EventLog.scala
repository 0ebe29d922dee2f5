package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interactive event-log session — the engine-side fix for the reference's
  * core anti-pattern and its concurrency model (SURVEY.md §3.2, §4).
  *
  * The reference re-reads the ENTIRE trace file for every click
  * (/root/reference/src/main.cpp:1081-1089), caps results at 100 rows by
  * aborting the scan (`CloseTrace` mid-callback, src/main.cpp:380-387),
  * and supersedes an in-flight query when a new selection arrives
  * (src/main.cpp:1205-1211, one background worker).
  *
  * Spark-native equivalents:
  *  - re-scan → `cache()`: the log is scanned once, served from memory
  *    (columnar, partitioned) for every subsequent interactive query;
  *  - abort-at-N → `limit(n)`: `CollectLimitExec` stops consuming input
  *    exactly like the early `CloseTrace`;
  *  - supersession → job groups: each query runs in its own group and
  *    `cancelCurrent()` kills the in-flight one when a new click lands.
  */
final class EventLog(spark: SparkSession, sfDir: String) {

  /** The cached log: scanned once, reused by every query. The corpus
    * parquet is a single row group (scan parallelism 1), so the one-time
    * cache build also repartitions to the session's parallelism — every
    * interactive query after that runs on all cores.
    */
  val events: DataFrame = operators.EventOps.events(spark, sfDir)
    .repartition(spark.sparkContext.defaultParallelism).cache()

  private val seq = new AtomicInteger(0)
  @volatile private var currentGroup: Option[String] = None

  /** The reference's interactive query: key filter + ordered LIMIT n
    * (src/main.cpp:399-401 + 1073), served from the cache.
    */
  def instances(eventType: String, n: Int = 100): DataFrame =
    events.filter(col("event_type") === eventType)
      .orderBy(col("ts_ns"), col("event_id"))
      .limit(n)

  /** The catalog view (src/main.cpp:255-321 analog). */
  def catalog: DataFrame =
    events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("ts_ms")).as("first_ms"),
        max(col("ts_ms")).as("last_ms"))

  /** Run `action` over a DataFrame in a cancellable job group, superseding
    * any in-flight query first (the reference's new-click behavior).
    */
  def runInteractive[T](df: DataFrame)(action: DataFrame => T): T = {
    cancelCurrent()
    val group = s"graft-interactive-${seq.incrementAndGet()}"
    currentGroup = Some(group)
    // cooperative kill (no Thread.interrupt): codegen'd iterators check
    // the kill flag per batch, and interrupting task threads can corrupt
    // shared Netty/Parquet state (Spark's documented caveat).
    spark.sparkContext.setJobGroup(group,
      "interactive event-log query", interruptOnCancel = false)
    try action(df)
    finally {
      spark.sparkContext.clearJobGroup()
      currentGroup = currentGroup.filterNot(_ == group)
    }
  }

  /** Supersede the in-flight interactive query, if any. */
  def cancelCurrent(): Unit =
    currentGroup.foreach(spark.sparkContext.cancelJobGroup)

  def close(): Unit = events.unpersist()
}
