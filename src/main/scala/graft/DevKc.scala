package graft

import org.apache.spark.sql.SparkSession

/** Measurement probe for the round-8 [[graft.api.GraftPipelines.kcenterSelect]]
  * running-min refactor (round-7 verdict watch item #3): the naive
  * Gonzalez form recomputes distances to ALL r-1 prior centers each
  * round — O(k²·n·dim) total and a per-round codegen expression that
  * grows linearly in r — while the running-`dmin` form does one
  * new-center distance per round: O(k·n·dim) total, flat expression.
  *
  * The probe times the full selection at k = 8, 16, 32 on the sf0.1
  * embeddings and prints seconds-per-round: flat per-round cost as k
  * quadruples is the refactor's signature (the naive form's per-round
  * cost grows ~linearly with k, so its k=32 per-round figure would
  * read ~4× its k=8 one). Two timed repetitions; the second (warm JIT)
  * is the recorded row, same discipline as DevSemScale.
  */
object DevKc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (round <- 1 to 2; k <- Seq(8, 16, 32)) {
      val emb = Tables.embeddings(spark, dir)
      val t0 = System.nanoTime()
      val n = graft.api.GraftPipelines.kcenterSelect(emb, k, 64).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[kc] r$round k=$k%-3d rows=$n wall=${t}%.2fs per_round=${t / k}%.3fs")
    }
    spark.stop()
  }
}
