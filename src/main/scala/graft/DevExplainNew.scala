package graft

/** Probe: scan-level plan facts (ReadSchema / PushedFilters) for the
  * round-4 queries — pruning evidence behind docs/PLANS.md "Round 4".
  * Not part of the driver contract.
  */
object DevExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs =
      if (args.nonEmpty) args.toSeq
      else Seq("ev_uint64_decode", "llm_pii_redact", "llm_substring_dedup")
    for (q <- qs) {
      val plan = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      println(s"== $q")
      plan.linesIterator.filter(l =>
        l.contains("ReadSchema") || l.contains("PushedFilters"))
        .foreach(l => println("  " + l.trim.take(220)))
    }
    spark.stop()
  }
}
