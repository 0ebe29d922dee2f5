package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
/** A/B probe: KM single-digest minhash vs the retired per-seed digest
  * family, and the pre-explode repartition tradeoff under KM (see
  * docs/PLANS.md "Pre-explode repartition").
  */
object DevKm {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    import graft.api.GraftPipelines._
    def cands(sig: DataFrame): Long = {
      val b = lshBands(sig, 4, 2).hint("shuffle_hash")
      b.as("l").join(b.as("r"), col("l.b") === col("r.b") && col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("d1"), col("r.doc_id").as("d2")).distinct().count()
    }
    for (round <- 1 to 3; (name, f) <- Seq(
        "km-repart" -> (() => cands(minhashSignature(shingle(docs, 3, repartitionFirst = true), 8))),
        "km-norepart" -> (() => cands(minhashSignature(shingle(docs, 3, repartitionFirst = false), 8))))) {
      val t0 = System.nanoTime(); val n = f()
      println(f"$round $name%-12s ${(System.nanoTime() - t0) / 1e9}%6.2fs pairs=$n")
    }
    spark.stop()
  }
}
