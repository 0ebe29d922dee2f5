package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: skew stress for saltedJoin and packSequencesSalted — one
  * 80%-hot key / stratum, timing + max-single-task-load deltas vs the
  * unsalted forms. Results recorded in docs/PLANS.md ("skew stress").
  *
  * Broadcast is disabled and AQE skew-join off for the join case: the
  * point is the raw shuffle-join reducer bottleneck salting exists for
  * (at 100 TB the "small" side of the hot join is often over the
  * broadcast ceiling, and AQE skew splitting caps at spill granularity).
  */
object DevSkew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[skew] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // ---- join: 20M-row big side, 80% of rows on key 42 ----
    val big = spark.range(20000000L)
      .select((when(pmod($"id", lit(10)) < 8, 42L).otherwise(pmod($"id", lit(1000))))
        .as("k"), $"id".as("payload"))
    val small = spark.range(1000L)
      .select($"id".as("k"), concat(lit("name_"), $"id").as("name"))
    big.persist(); big.count(); small.persist(); small.count()

    for (i <- 1 to 2) {
      val plain = time(s"plain join (run $i)") {
        big.join(small, Seq("k")).agg(count(lit(1)), sum($"payload")).collect()
      }
      val salted = time(s"saltedJoin x32 (run $i)") {
        graft.api.GraftPipelines.saltedJoin(big, small, "k", "payload", 32)
          .agg(count(lit(1)), sum($"payload")).collect()
      }
      assert(plain.head.getLong(0) == salted.head.getLong(0))
      assert(plain.head.getLong(1) == salted.head.getLong(1))
    }
    // reducer-load evidence: max rows a single shuffle task sorts
    val hotPlain = big.groupBy($"k").count()
      .agg(max($"count")).head.getLong(0)
    val hotSalted = big.withColumn("__salt",
        pmod(xxhash64($"payload"), lit(32)).cast("int"))
      .groupBy($"k", $"__salt").count().agg(max($"count")).head.getLong(0)
    println(s"[skew] max single-reducer rows: plain=$hotPlain salted=$hotSalted")

    // ---- packing: 4M docs, 80% in one stratum ----
    val docs = spark.range(4000000L)
      .select($"id".as("doc_id"),
        when(pmod($"id", lit(10)) < 8, "hot")
          .otherwise(concat(lit("s"), pmod($"id", lit(7)))).as("source"),
        (pmod($"id", lit(400)) + 50).cast("int").as("n_tokens"))
    docs.persist(); docs.count()
    for (i <- 1 to 2) {
      time(s"packSequences (run $i)") {
        graft.api.GraftPipelines.packSequences(docs, 2048)
          .agg(countDistinct($"bin")).collect()
      }
      time(s"packSalted x32 (run $i)") {
        graft.api.GraftPipelines.packSequencesSalted(docs, 2048, 32)
          .agg(countDistinct($"bin")).collect()
      }
    }
    spark.stop()
  }
}
