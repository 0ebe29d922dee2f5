package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.api.GraftPipelines

/** Dev harness: whole-pipeline and per-phase timing of the near-dup
  * verify pipeline (merged from the former DevNearDup/DevNeardup
  * casing twins — one probe, both measurements).
  */
object DevNearDup {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("dev-neardup").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warmup
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = Tables.documents(spark, dir)
    t("whole nearDuplicates") {
      GraftPipelines.nearDuplicates(docs, 0.7).write.mode("overwrite")
        .format("noop").save()
    }
    // phase timings (second pass; band cache warm from run 1 is gone — new lineage)
    val cands = t("minhashCandidates+persist") {
      val c = GraftPipelines.minhashCandidates(docs, 3, 8, 4).persist()
      c.count(); c
    }
    val inPlay = t("inPlay collect") {
      val p = cands.select(col("d1").as("doc_id"))
        .union(cands.select(col("d2"))).distinct().persist()
      p.count(); p
    }
    val sets = t("sets build+persist") {
      val s = docs.join(broadcast(inPlay), "doc_id")
        .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("wset"))
        .select(col("doc_id"), size(col("wset")).as("sz"), col("wset")).persist()
      s.count(); s
    }
    t("verify joins") {
      val words = sets.select(col("doc_id"), explode(col("wset")).as("w"))
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
        .filter(col("jaccard") >= 0.7)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
