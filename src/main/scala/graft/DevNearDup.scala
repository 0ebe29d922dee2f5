package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: stage timings inside the near-dup pipeline. */
object DevNearDup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, sf)
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val cands = timed("cands (band join + distinct + persist/count)") {
      val c = graft.api.GraftPipelines.minhashCandidates(docs, 3, 8, 4).persist()
      c.count(); c
    }
    val inPlay = cands.select(col("d1").as("doc_id"))
      .union(cands.select(col("d2"))).distinct()
    val sets = docs.join(inPlay, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("wset"))
      .select(col("doc_id"), size(col("wset")).as("sz"), col("wset")).persist()
    timed("sets (in-play word sets, persist/count)") { sets.count() }
    val words = sets.select(col("doc_id"), explode(col("wset")).as("w"))
    timed("verify (explode-join-count + sizes + filter)") {
      val common = cands
        .join(words.withColumnRenamed("doc_id", "d1"), "d1")
        .join(words.withColumnRenamed("doc_id", "d2"), Seq("d2", "w"))
        .groupBy(col("d1"), col("d2"))
        .agg(count(lit(1)).cast("int").as("n_common"))
      val sizes = sets.select(col("doc_id"), col("sz"))
      cands.join(common, Seq("d1", "d2"), "left")
        .withColumn("n_common", coalesce(col("n_common"), lit(0)))
        .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sz1")), "d1")
        .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sz2")), "d2")
        .withColumn("n_union", col("sz1") + col("sz2") - col("n_common"))
        .withColumn("jaccard", col("n_common").cast("double") / col("n_union"))
        .filter(col("jaccard") >= 0.7).count()
    }
    spark.stop()
  }
}
