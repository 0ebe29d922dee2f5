package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.EventStreaming

/** Measurement probe (not part of the driver contract): per-JOB cost
  * breakdown of one streaming maintenance trigger. The round-14 verdict
  * measured the extend/upsert loops store-FLAT but with a ~7.5-9 s
  * absolute floor per trigger and guessed at the dominating jobs; this
  * probe attaches a SparkListener and prints, for each timed trigger,
  * every Spark job it scheduled with its callsite and wall duration —
  * so the floor's composition is a recorded fact instead of a guess.
  *
  * Usage: SPARK_GRAFT_SF_DIR=target/sf1 sbt "runMain graft.DevTrigProf"
  * (optional SPARK_GRAFT_TRIGPROF_LOOPS=extend,upsert and
  * SPARK_GRAFT_TRIGPROF_REPS=N).
  */
object DevTrigProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_TRIGPROF_REPS", "3").toInt
    val loops = sys.env.get("SPARK_GRAFT_TRIGPROF_LOOPS")
      .map(_.split(",").map(_.trim).toSet)
    def want(n: String) = loops.forall(_.contains(n))
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

    // job ledger: (jobId, callsite, submitted, finished)
    final case class J(id: Int, site: String, t0: Long, var t1: Long = -1L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs.put(js.jobId, J(js.jobId, site, System.nanoTime()))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val j = jobs.get(je.jobId)
        if (j != null) j.t1 = System.nanoTime()
      }
    })

    def tmp(name: String): String = java.nio.file.Files
      .createTempDirectory(s"graft_trigprof_$name").toString + "/state"

    def profiled(tag: String)(f: => Unit): Unit = {
      jobs.clear()
      val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      // drain listener events (listenerBus is private[spark]; a short
      // sleep suffices for a measurement probe)
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val done = jobs.values.asScala.toSeq.filter(_.t1 > 0)
        .sortBy(_.t0)
      val sumJobs = done.map(j => (j.t1 - j.t0) / 1e9).sum
      println(f"[trigprof] $tag wall=$wall%.3f s, ${done.size} jobs, " +
        f"sum(job)=$sumJobs%.3f s (gap=${wall - sumJobs}%.3f)")
      // per-phase rollup (jobs grouped by description), then the jobs
      done.groupBy(_.site).toSeq
        .map { case (s, js) => (s, js.size, js.map(j => (j.t1 - j.t0) / 1e9).sum) }
        .sortBy(-_._3)
        .foreach { case (s, n, t) =>
          println(f"[trigprof]   phase $t%7.3f s  $n%3d jobs  $s")
        }
      done.foreach { j =>
        println(f"[trigprof]   job ${j.id}%4d ${(j.t1 - j.t0) / 1e9}%7.3f s  ${j.site}")
      }
    }

    val docsAll = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id".cast("long").as("doc_id"), $"text")
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val n = docsAll.length
    val b100 = n / 100
    println(s"[trigprof] corpus: $n docs from $sfDir, batch=$b100")

    if (want("extend")) {
      val mem = MemoryStream[(Long, String)]
      val q = EventStreaming.extendLoop(
        mem.toDF().toDF("doc_id", "text"), tmp("extend"))()
      try {
        val seedEnd = n - (reps + 1) * b100
        mem.addData(docsAll.slice(0, seedEnd).toSeq: _*)
        q.processAllAvailable() // seed, unprofiled
        (0 until reps).foreach { i =>
          profiled(s"extend trigger ${i + 1}") {
            mem.addData(docsAll.slice(seedEnd + i * b100,
              seedEnd + (i + 1) * b100).toSeq: _*)
            q.processAllAvailable()
          }
        }
      } finally q.stop()
    }

    if (want("upsert")) {
      val mem = MemoryStream[(String, Long, String)]
      val q = EventStreaming.upsertLoop(
        mem.toDF().toDF("op", "doc_id", "text"), tmp("upsert"))()
      try {
        val seedEnd = n - (reps + 1) * b100
        mem.addData(docsAll.slice(0, seedEnd)
          .map { case (i, t) => ("add", i, t) }.toSeq: _*)
        q.processAllAvailable() // seed, unprofiled
        val d = math.max(1, b100 / 10)
        (0 until reps).foreach { i =>
          profiled(s"upsert trigger ${i + 1}") {
            val adds = docsAll.slice(seedEnd + i * b100,
              seedEnd + (i + 1) * b100)
              .map { case (id, t) => ("add", id, t) }
            val dels = docsAll.slice(i * d, (i + 1) * d)
              .map { case (id, _) => ("del", id, null: String) }
            mem.addData((adds ++ dels).toSeq: _*)
            q.processAllAvailable()
          }
        }
      } finally q.stop()
    }

    spark.stop()
  }
}
