package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probe: A/B of the PPJoin candidate prune (both arms on the
  * round-15 hash token key `h`; DevHashAb is the hash-vs-string duel) — the old per-row
  * positional filter + distinct vs the round-11 aggregate
  * (PPJoin+-strength) prune now in GraftPipelines — measuring (1)
  * candidate-pair count entering verify and (2) end-to-end wall of the
  * pair join, for both the symmetric (θ = 1/2 Jaccard) and asymmetric
  * (τ = 4/5 containment) joins. The OLD candidate stage is replicated
  * inline here verbatim so one binary times both against the same
  * checkpointed index; results go to BASELINE.md. Run:
  * `graft.DevPpjoinAb [sfDir]` (default target/sf1).
  */
object DevPpjoinAb {

  // the pre-round-11 candidate stages, verbatim
  private def oldPpjoinCand(pref: DataFrame, num: Int, den: Int): DataFrame =
    pref.as("a").join(pref.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
          col("a.sz") * num <= col("b.sz") * den &&
          col("b.sz") * num <= col("a.sz") * den &&
          expr("least(a.sz - a.rn, b.sz - b.rn) + 1 >= " +
            s"($num * (a.sz + b.sz) + ${num + den} - 1) div ${num + den}"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.sz").as("na"), col("b.sz").as("nb")).distinct()

  private def oldContainCand(pref: DataFrame, ranked: DataFrame,
      num: Int, den: Int): DataFrame =
    pref.as("a").join(ranked.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") =!= col("b.doc_id") &&
          col("b.sz") * den >= col("a.sz") * num &&
          expr("least(a.sz - a.rn, b.sz - b.rn) + 1 >= " +
            s"($num * a.sz + $den - 1) div $den"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.sz").as("na"), col("b.sz").as("nb")).distinct()

  private def verifyJac(toks: DataFrame, cand: DataFrame,
      num: Int, den: Int): DataFrame =
    cand
      .join(toks.as("ta"), col("ta.doc_id") === col("a_id"))
      .join(toks.as("tb"),
        col("tb.doc_id") === col("b_id") && col("tb.s") === col("ta.s"))
      .groupBy(col("a_id"), col("b_id"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .filter(col("inter") * (num + den) >= (col("na") + col("nb")) * num)

  private def verifyContain(toks: DataFrame, cand: DataFrame,
      num: Int, den: Int): DataFrame =
    cand
      .join(toks.as("ta"), col("ta.doc_id") === col("a_id"))
      .join(toks.as("tb"),
        col("tb.doc_id") === col("b_id") && col("tb.s") === col("ta.s"))
      .groupBy(col("a_id"), col("b_id"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .filter(col("inter") * den >= col("na") * num)

  private def timed[T](tag: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[ppjoin-ab] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[ppjoin-ab] corpus $sfDir docs=${docs.count()}")

    val sets = graft.api.GraftPipelines.ppjoinTokenSets(docs)
      .localCheckpoint()
    val toks = graft.api.GraftPipelines.ppjoinTokensOf(sets)
      .localCheckpoint()
    val ranked = graft.api.GraftPipelines.ppjoinRanked(toks).localCheckpoint()

    // --- symmetric PPJoin, θ = 1/2 ---
    val (num, den) = (1, 2)
    val pref = ranked
      .filter(col("rn") <= col("sz") -
        expr(s"($num * sz + $den - 1) div $den") + 1)
      .localCheckpoint()
    val oldC = timed("ppjoin old candidates (count)") {
      oldPpjoinCand(pref, num, den).count()
    }
    val newC = timed("ppjoin new candidates (count)") {
      graft.api.GraftPipelines.ppjoinCandidates(pref, num, den).count()
    }
    val oldW = timed("ppjoin old end-to-end (verify)") {
      verifyJac(toks, oldPpjoinCand(pref, num, den), num, den).count()
    }
    val newW = timed("ppjoin new end-to-end (verify)") {
      graft.api.GraftPipelines.ppjoinPairsFromIndex(sets, pref, num, den)
        .count()
    }
    println(s"[ppjoin-ab] ppjoin cand old=$oldC new=$newC " +
      f"(${100.0 * newC / oldC.max(1)}%.1f%%) pairs old=$oldW new=$newW")

    // --- asymmetric containment, τ = 4/5 ---
    val (cn, cd) = (4, 5)
    val cpref = ranked
      .filter(col("rn") <= col("sz") -
        expr(s"($cn * sz + $cd - 1) div $cd") + 1)
      .localCheckpoint()
    val oldCC = timed("contain old candidates (count)") {
      oldContainCand(cpref, ranked, cn, cd).count()
    }
    val newCC = timed("contain new candidates (count)") {
      graft.api.GraftPipelines.containmentCandidates(cpref, ranked, cn, cd)
        .count()
    }
    val oldCW = timed("contain old end-to-end (verify)") {
      verifyContain(toks, oldContainCand(cpref, ranked, cn, cd), cn, cd)
        .count()
    }
    val newCW = timed("contain new end-to-end (verify)") {
      graft.api.GraftPipelines
        .containmentPairsFromIndex(sets, ranked, cn, cd).count()
    }
    println(s"[ppjoin-ab] contain cand old=$oldCC new=$newCC " +
      f"(${100.0 * newCC / oldCC.max(1)}%.1f%%) pairs old=$oldCW new=$newCW")
    spark.stop()
  }
}
