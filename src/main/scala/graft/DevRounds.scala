package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: end-to-end dup_clusters stage timing at sf0.1 — near-dup pair
  * generation vs the observe()-fused label-propagation loop.
  */
object DevRounds {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val pairs = graft.api.GraftPipelines.nearDuplicates(Tables.documents(spark, sf), 0.7)
      val t1 = System.nanoTime()
      val (clusters, rounds) = graft.api.GraftPipelines.dupClustersWithRounds(pairs)
      val n = clusters.count()
      val t2 = System.nanoTime()
      println(f"run $i: pairs=${(t1 - t0) / 1e9}%.2fs propagation=${(t2 - t1) / 1e9}%.2fs rounds=$rounds rows=$n")
      pairs.unpersist(blocking = false)
    }
    spark.stop()
  }
}
