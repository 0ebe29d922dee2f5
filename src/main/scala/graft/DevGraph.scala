package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe for the k-NN graph family (BASELINE.md evidence):
  * bucket occupancy, candidate volume Σ bucket², and mutual-edge/
  * component counts at sf0.1 vs the 10× sf1 corpus, for the committed
  * 8-bit scheme AND a 12-bit widening — the measured form of the
  * "buckets saturate with corpus size; add hyperplanes, not
  * partitions" claim in the llm_knn_graph plan note (the same
  * narrow-vs-wide methodology as DevSimWide).
  */
object DevGraph {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dirs = Seq(
      "sf0.1" -> "/root/testdata/sf0.1",
      "sf1" -> "target/sf1")
    for ((tag, dir) <- dirs; bits <- Seq(8, 12)) {
      val emb = Tables.embeddings(spark, dir)
      val n = emb.count()
      val occ = emb
        .withColumn("bucket",
          graft.api.GraftPipelines.signLshBucket(col("embedding"), bits, 0))
        .groupBy("bucket").agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("nbuckets"), max(col("c")).as("maxocc"),
          sum(col("c") * col("c")).as("cands"))
        .collect()(0)
      val t0 = System.nanoTime()
      val edges = graft.api.GraftPipelines.knnEdges(emb, 3, bits)
        .localCheckpoint()
      val nEdges = edges.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val mutual = edges.select(col("src"), col("dst"))
        .intersect(edges.select(col("dst").as("src"), col("src").as("dst")))
        .filter(col("src") < col("dst")).count()
      println(f"$tag%-6s bits=$bits%-3d n=$n%-7d buckets=${occ.getLong(0)}%-5d " +
        f"maxocc=${occ.getLong(1)}%-6d cand_pairs=${occ.getLong(2)}%-12d " +
        f"knn_edges=$nEdges%-8d mutual=$mutual%-7d knn_secs=$secs%.2f")
    }
    spark.stop()
  }
}
