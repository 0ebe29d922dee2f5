package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probe behind the driver-round-8 multi-file-layout finding:
  * `rel_profile_approx` (5 × approx_count_distinct at rsd 0.01) reads
  * 13-60 s on the 32-file corpus vs 2.4 s on the single-file one, with
  * a healthy control. Spark's HyperLogLogPlusPlus models its sketch as
  * ONE LONG AGG-BUFFER ATTRIBUTE PER WORD (rsd 0.01 → p=14 → ~1536
  * words per sketch; 5 sketches ≈ 7.7k buffer columns), so this probe
  * times the same aggregate while varying the two suspects
  * independently: input parallelism (1 file vs 32 files vs
  * repartition(32)) and sketch width (rsd 0.05 vs 0.01).
  */
object DevHll {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val one = "/root/testdata/sf0.1/orders.parquet"
    val many = "/root/repo/target/layout_x32/orders.parquet"
    spark.range(1000000).selectExpr("sum(id)").collect()

    def t(label: String, df: => DataFrame): Unit = {
      for (p <- 1 to 2) {
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        println(f"[hll] pass$p $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    def agg(df: DataFrame, rsd: Double) = df.agg(
      approx_count_distinct(col("o_orderkey"), rsd),
      approx_count_distinct(col("o_custkey"), rsd),
      approx_count_distinct(col("o_totalprice"), rsd),
      approx_count_distinct(col("o_orderstatus"), rsd),
      approx_count_distinct(col("o_orderpriority"), rsd))

    t("1file  rsd=0.05", agg(spark.read.parquet(one), 0.05))
    t("32file rsd=0.05", agg(spark.read.parquet(many), 0.05))
    t("1file  rsd=0.01", agg(spark.read.parquet(one), 0.01))
    t("32file rsd=0.01", agg(spark.read.parquet(many), 0.01))
    t("1file->repart32 rsd=0.01",
      agg(spark.read.parquet(one).repartition(32), 0.01))
    t("32file 1col rsd=0.01", spark.read.parquet(many)
      .agg(approx_count_distinct(col("o_orderkey"), 0.01)))
    // one single-sketch aggregate per column, unioned: each agg's
    // buffer is ONE sketch (~1.5k words), never the 7.7k-column row
    val cols5 = Seq("o_orderkey", "o_custkey", "o_totalprice",
      "o_orderstatus", "o_orderpriority")
    t("32file union-of-5 rsd=0.01", cols5.map { c =>
      spark.read.parquet(many)
        .agg(lit(c).as("column"),
          approx_count_distinct(col(c), 0.01).as("n_distinct"))
    }.reduce(_ unionByName _))
    // codegen hypothesis: same 5-sketch agg, whole-stage codegen OFF
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    t("32file 5col rsd=0.01 NOCODEGEN", agg(spark.read.parquet(many), 0.01))
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    spark.stop()
  }
}
