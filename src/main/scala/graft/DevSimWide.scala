package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Probe: candidate-pair cardinality of the two lossless simhash
  * blocking schemes (`llm_simhash_pairs` 4×8-bit + 1-bit probes vs
  * `llm_simhash_pairs_wide` 2×16-bit + ≤3-bit probes) at sf0.1 and the
  * 10× sf1 corpus. Wall time at these corpus sizes is dominated by the
  * wide scheme's FIXED probe fan-out (2×697 = 1394 probe rows/doc vs
  * 40/doc narrow); what scales with the corpus is the CANDIDATE count
  * (Σ bucket² within the probed neighborhoods). This prints both, so
  * BASELINE.md can state the crossover honestly: narrow candidates/doc
  * grow linearly with docs-per-source (8-bit buckets saturate), wide's
  * are ~256× sparser — wide wins once narrow's candidates/doc exceed
  * the ~1.4k fixed probe rows/doc.
  */
object DevSimWide {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def stats(dir: String): Unit = {
      val sh = SparkEntry.queries("llm_simhash")(spark, dir)
        .join(Tables.documents(spark, dir).select($"doc_id", $"source"),
          "doc_id")
        .persist()
      val n = sh.count()
      def cand(nBlocks: Int, bits: Int, maxFlip: Int): Long = {
        val mask = (1L << bits) - 1
        def block(i: Int): Column =
          shiftright($"simhash", bits * i).bitwiseAND(lit(mask))
        def combos(k: Int): Seq[Long] = (0 until bits).toSeq
          .combinations(k).map(_.map(1L << _).sum).toSeq
        val masks = (0 to maxFlip).flatMap(combos).toDF("m")
        val blocked = sh.select($"doc_id", $"source", $"simhash",
          explode(array((0 until nBlocks).map(i =>
            struct(lit(i).as("bi"), block(i).as("bv"))): _*)).as("b"))
        val probes = blocked.crossJoin(broadcast(masks))
          .select($"doc_id", $"source",
            struct($"b.bi".as("bi"), $"b.bv".bitwiseXOR($"m").as("bv")).as("b"))
        blocked.as("l").join(probes.as("r"),
            col("l.source") === col("r.source") &&
            col("l.b") === col("r.b") &&
            col("l.doc_id") < col("r.doc_id"))
          .select(col("l.doc_id"), col("r.doc_id")).distinct().count()
      }
      val narrow = cand(4, 8, 1)
      val wide = cand(2, 16, 3)
      println(f"[simwide] $dir%-28s docs=$n%-7d narrow_cand=$narrow%-9d " +
        f"(${narrow.toDouble / n}%.0f/doc) wide_cand=$wide%-9d " +
        f"(${wide.toDouble / n}%.1f/doc)")
      sh.unpersist()
    }
    stats("/root/testdata/sf0.1")
    stats(sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/root/repo/target/sf1"))
    spark.stop()
  }
}
