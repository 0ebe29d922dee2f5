package graft

import org.apache.spark.sql.functions._

/** Interactive session semantics: cache reuse, limit, supersession,
  * incremental delivery (SURVEY.md §2.9, §4).
  */
class EventLogSpec extends SparkSpec {

  test("cache: second query reads InMemoryRelation, not parquet") {
    val log = new EventLog(spark, sf)
    try {
      log.catalog.collect() // materializes the cache
      val plan = log.instances("error").queryExecution.executedPlan.toString()
      assert(plan.contains("InMemoryTableScan") ||
        plan.contains("InMemoryRelation"),
        s"expected cached scan, got:\n${plan.take(500)}")
    } finally log.close()
  }

  test("instances: ordered LIMIT semantics match the flagship query") {
    val log = new EventLog(spark, sf)
    try {
      val a = log.instances("error", 100).select("event_id").collect()
        .map(_.getLong(0))
      val b = q("ev_flagship").select("event_id").collect().map(_.getLong(0))
      assert(a.sameElements(b))
    } finally log.close()
  }

  test("runInteractive: queries run and supersession cancels in-flight work") {
    val log = new EventLog(spark, sf)
    try {
      // normal run completes inside a job group
      val n = log.runInteractive(log.catalog)(_.count())
      assert(n == 5)
      // start a slow query in another thread, then supersede it
      @volatile var failed: Option[Throwable] = None
      // ~10^12-row 4-way cross product: cannot finish before the cancel
      val e1 = log.events.select(col("event_id").as("a"))
      val slow = e1.crossJoin(e1.select(col("a").as("b")))
        .crossJoin(e1.select(col("a").as("c")))
        .crossJoin(e1.select(col("a").as("d")))
        .agg(count(lit(1)))
      val t = new Thread(() => {
        try log.runInteractive(slow)(_.collect())
        catch { case e: Throwable => failed = Some(e) }
      })
      t.start()
      Thread.sleep(2000) // let it get into the job
      log.cancelCurrent()
      t.join(60000)
      assert(!t.isAlive, "superseded query should terminate")
      assert(failed.isDefined, "cancelled query should raise")
    } finally log.close()
  }

  test("incremental delivery: toLocalIterator streams partitions") {
    val log = new EventLog(spark, sf)
    try {
      val it = log.instances("error", 50).toLocalIterator()
      val first = it.next()
      assert(first.getAs[Long]("event_id") >= 0)
      var n = 1
      while (it.hasNext) { it.next(); n += 1 }
      assert(n == 50)
    } finally log.close()
  }
}
