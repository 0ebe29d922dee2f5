package graft

import org.apache.spark.sql.functions._

/** Evidence that the engine's join shapes benefit from Spark's runtime
  * Bloom-filter injection (`InjectRuntimeFilter`) at production scale.
  *
  * At 100 TB the win is row-level: a selective dimension filter becomes
  * a Bloom filter evaluated on the fact side BEFORE its shuffle, so
  * non-joining fact rows never leave the map stage. The default
  * thresholds (creation side < 10 MB, application-side scan > 10 GB)
  * are sized for exactly that regime, which is why sf0.1 plans don't
  * show the filter — this spec lowers the thresholds to simulate the
  * production size ratio and pins (a) the filter IS injected into our
  * canonical dim⋈fact shape, and (b) results are bit-identical with
  * and without it. No query code changes — the optimization is free
  * precisely because the joins are declarative equi-joins.
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def dimFactJoin = {
    val sel = Tables.customer(spark, sf)
      .filter($"c_mktsegment" === "BUILDING" && $"c_acctbal" > 0)
    Tables.orders(spark, sf)
      .join(sel, $"o_custkey" === $"c_custkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(functions.Fns.dec2($"o_totalprice"))
        .cast("double").as("total"))
      .orderBy($"o_orderpriority")
  }

  test("runtime Bloom filter injects into the dim-fact join at production thresholds") {
    val plain = dimFactJoin.collect()
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // production regime simulated: tiny creation side, any-size scan,
      // and a fact table too large to broadcast-join (injection only
      // pays when the application side has a shuffle to prune before)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val df = dimFactJoin
      val planText = df.queryExecution.optimizedPlan.toString
      assert(planText.contains("bloom_filter"),
        s"expected an injected bloom filter in:\n$planText")
      // semantics unchanged: the filter only prunes non-joining rows
      assert(df.collect().toSeq == plain.toSeq)
    }
  }

  test("runtime filter stays OFF below thresholds (no wasted build at small scale)") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true") {
      val planText = dimFactJoin.queryExecution.optimizedPlan.toString
      assert(!planText.contains("bloom_filter"),
        "default thresholds must not inject at sf0.001 sizes")
    }
  }
}
