package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement probe behind the one >3x entry in the round-7 sf1
  * scaling table: `llm_semdedup` is quadratic in cluster size at FIXED
  * k (pairs form within clusters), and the documented production fix
  * is scaling k with the corpus (Abbas et al. 2023 — cluster count
  * tracks corpus size so cluster SIZE, and with it pairs-per-cluster,
  * stays constant). This probe runs the same kmeans+within-cluster
  * pair pipeline on sf0.1 (k=8, the headline parameters) and on the
  * 10x corpus with k=8 (the headline's fixed-k reading) vs k=80
  * (k scaled 10x with the data), printing wall time and candidate-pair
  * counts for each.
  *
  * Expected shape (and what the recorded run showed — see BASELINE.md
  * round 7): fixed k at 10x data multiplies pairs ~10x and wall time
  * super-linearly; scaled k restores pairs to ~1x-per-row and the
  * ratio to the ordinary 1.5-2x band.
  */
object DevSemScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.api.GraftPipelines

    def pairsWithin(dir: String, k: Int): (Long, Double) = {
      val emb = Tables.embeddings(spark, dir)
      val t0 = System.nanoTime()
      val a = GraftPipelines.kmeans(emb, k, 2, 64)
        .join(emb, "vec_id")
        .select(col("vec_id"), col("cluster"), col("embedding"))
      val n = a.as("l").join(a.as("r"),
          col("l.cluster") === col("r.cluster") &&
          col("l.vec_id") < col("r.vec_id"))
        .withColumn("cosine",
          GraftPipelines.cosine(col("l.embedding"), col("r.embedding")))
        .filter(col("cosine") > 0.35)
        .count()
      (n, (System.nanoTime() - t0) / 1e9)
    }

    // warmup
    spark.range(1000000).selectExpr("sum(id)").collect()
    val sf01 = "/root/testdata/sf0.1"
    val sf1 = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/root/repo/target/sf1")
    // round 1 warms codegen/scans; round 2 is the recorded measurement
    for (round <- 1 to 2; (label, dir, k) <- Seq(
        ("sf0.1 k=8   (headline)", sf01, 8),
        ("sf1   k=8   (fixed-k) ", sf1, 8),
        ("sf1   k=80  (scaled-k)", sf1, 80))) {
      val (n, t) = pairsWithin(dir, k)
      println(f"[semscale] r$round $label pairs=$n%-8d wall=${t}%.2fs")
    }
    spark.stop()
  }
}
