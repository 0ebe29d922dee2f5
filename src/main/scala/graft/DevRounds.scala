package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DevRounds {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val pairs = graft.api.GraftPipelines.nearDuplicates(Tables.documents(spark, sf), 0.7)
    println(s"pairs=${pairs.count()}")
    // replicate dupClusters loop with round counting
    val edges = pairs.select(col("d1").as("a"), col("d2").as("b"))
      .union(pairs.select(col("d2").as("a"), col("d1").as("b"))).distinct().persist()
    println(s"edges=${edges.count()}")
    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint()
    println(s"nodes=${labels.count()}")
    var changed = 1L; var rounds = 0
    while (changed > 0) {
      rounds += 1
      val t0 = System.nanoTime()
      val nmin = edges.join(labels.withColumnRenamed("node", "b"), "b")
        .groupBy(col("a")).agg(min(col("label")).as("nmin"))
      val next = labels.join(nmin.withColumnRenamed("a", "node"), Seq("node"), "left")
        .select(col("node"), col("label").as("old"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .localCheckpoint()
      changed = next.filter(col("label") < col("old")).count()
      labels = next.select(col("node"), col("label"))
      println(f"round $rounds: changed=$changed took ${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    val n = labels.select(col("label")).distinct().count()
    println(s"rounds=$rounds components=$n")
    spark.stop()
  }
}
