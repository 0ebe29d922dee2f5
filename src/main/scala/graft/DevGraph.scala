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
    // Incremental-maintenance cost (llm_knn_incremental's 100 TB claim,
    // measured): what fraction of buckets/vectors does the ~6 % delta
    // (vec_id % 17 = 0) force to recompute, and how does the
    // incremental wall compare to the full rebuild — at the committed
    // 8-bit scheme AND the 12-bit widening the occupancy table above
    // says a 10× corpus should run.
    for ((tag, dir) <- dirs; bits <- Seq(8, 12)) {
      val emb = Tables.embeddings(spark, dir)
        .withColumn("bucket",
          graft.api.GraftPipelines.signLshBucket(col("embedding"), bits, 0))
        .localCheckpoint()
      val n = emb.count()
      val delta = emb.filter(col("vec_id") % 17 === 0)
      val touched = delta.select("bucket").distinct().localCheckpoint()
      val tB = touched.count()
      val allB = emb.select("bucket").distinct().count()
      val recompute = emb.join(touched, Seq("bucket"), "left_semi").count()
      val t0 = System.nanoTime()
      graft.api.GraftPipelines.knnEdges(emb.drop("bucket"), 3, bits)
        .localCheckpoint().count()
      val fullSec = (System.nanoTime() - t0) / 1e9
      // base edges are the persisted artifact — built outside the timer
      val baseEdges = graft.api.GraftPipelines
        .knnEdges(emb.filter(col("vec_id") % 17 =!= 0).drop("bucket"),
          3, bits)
        .localCheckpoint()
      val t1 = System.nanoTime()
      graft.api.GraftPipelines
        .knnIncrementalEdges(emb, touched, baseEdges, 3, bits)
        .localCheckpoint().count()
      val incSec = (System.nanoTime() - t1) / 1e9
      println(f"$tag%-6s bits=$bits%-3d touched_buckets=$tB%-5d of=$allB%-5d " +
        f"recompute_vecs=$recompute%-7d of=$n%-7d " +
        f"full_secs=$fullSec%-6.2f inc_secs=$incSec%.2f")
    }
    spark.stop()
  }
}
