package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Probe: within-JVM alternating duel of the round-15 token-HASH
  * PPJoin key (dfreq/rank/candidate joins on xxhash64(s)) vs the
  * round-14 string key — same corpus, same JVM, interleaved reps, so
  * host bursts hit both arms. Times the full refit pipeline per arm
  * (rank build + candidates + exact verify), forced with a count of
  * the final pairs. Run: `graft.DevHashAb [sfDir] [reps]`.
  */
object DevHashAb {

  // the round-14 string-keyed rank + candidate stages, verbatim
  private def oldRanked(toks: DataFrame): DataFrame = {
    val dfreq = toks.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy(col("doc_id"))
    toks.join(dfreq, "s")
      .withColumn("rn", row_number().over(wDoc.orderBy(col("df"), col("s"))))
      .select(col("doc_id"), col("s"), col("rn"), col("sz"))
  }
  private def oldPpjoinCand(pref: DataFrame, num: Int, den: Int): DataFrame =
    pref.as("a").join(pref.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
          col("a.sz") * num <= col("b.sz") * den &&
          col("b.sz") * num <= col("a.sz") * den)
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.sz").as("na"), col("b.sz").as("nb"))
      .agg(count(lit(1)).as("p_common"),
        max(col("a.rn")).as("i_last"), max(col("b.rn")).as("j_last"))
      .filter(expr("p_common + least(na - i_last, nb - j_last) >= " +
        s"($num * (na + nb) + ${num + den} - 1) div ${num + den}"))
      .select(col("a_id"), col("b_id"), col("na"), col("nb"))
  private def oldContainCand(pref: DataFrame, ranked: DataFrame,
      num: Int, den: Int): DataFrame =
    pref.as("a").join(ranked.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") =!= col("b.doc_id") &&
          col("b.sz") * den >= col("a.sz") * num)
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.sz").as("na"), col("b.sz").as("nb"))
      .agg(count(lit(1)).as("p_common"),
        max(col("a.rn")).as("i_last"), max(col("b.rn")).as("j_last"))
      .filter(expr("p_common + least(na - i_last, nb - j_last) >= " +
        s"($num * na + $den - 1) div $den"))
      .select(col("a_id"), col("b_id"), col("na"), col("nb"))

  private def verify(sets: DataFrame, cand: DataFrame): DataFrame =
    cand
      .join(sets.select(col("doc_id").as("a_id"), col("sarr").as("arr_a")),
        "a_id")
      .join(sets.select(col("doc_id").as("b_id"), col("sarr").as("arr_b")),
        "b_id")
      .select(col("a_id"), col("b_id"), col("na"), col("nb"),
        size(array_intersect(col("arr_a"), col("arr_b"))).cast("long")
          .as("inter"))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "target/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val P = graft.api.GraftPipelines
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sets = P.ppjoinTokenSets(docs).localCheckpoint()
    println(s"[hash-ab] corpus $sfDir sets=${sets.count()}")

    def timed(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[hash-ab] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }

    (1 to reps).foreach { r =>
      // symmetric θ=1/2: old arm
      timed(s"rep$r ppjoin OLD (string)") {
        val toks = sets.select(col("doc_id"), col("sz"),
          explode_outer(col("sarr")).as("s"))
        val ranked = oldRanked(toks).localCheckpoint()
        val pref = ranked.filter(
          col("rn") <= col("sz") - expr("(1 * sz + 1) div 2") + 1)
        val c = verify(sets, oldPpjoinCand(pref, 1, 2))
          .filter(col("inter") * 3 >= (col("na") + col("nb")) * 1)
        c.count()
      }
      // symmetric θ=1/2: new arm (library)
      timed(s"rep$r ppjoin NEW (hash)") {
        val ranked = P.ppjoinRanked(P.ppjoinTokensOf(sets)).localCheckpoint()
        val pref = ranked.filter(
          col("rn") <= col("sz") - expr("(1 * sz + 1) div 2") + 1)
        val c = verify(sets, P.ppjoinCandidates(pref, 1, 2))
          .filter(col("inter") * 3 >= (col("na") + col("nb")) * 1)
        c.count()
      }
      // asymmetric τ=4/5: old arm
      timed(s"rep$r contain OLD (string)") {
        val toks = sets.select(col("doc_id"), col("sz"),
          explode_outer(col("sarr")).as("s"))
        val ranked = oldRanked(toks).localCheckpoint()
        val pref = ranked.filter(
          col("rn") <= col("sz") - expr("(4 * sz + 4) div 5") + 1)
        val c = verify(sets, oldContainCand(pref, ranked, 4, 5))
          .filter(col("inter") * 5 >= col("na") * 4)
        c.count()
      }
      // asymmetric τ=4/5: new arm
      timed(s"rep$r contain NEW (hash)") {
        val ranked = P.ppjoinRanked(P.ppjoinTokensOf(sets)).localCheckpoint()
        val pref = ranked.filter(
          col("rn") <= col("sz") - expr("(4 * sz + 4) div 5") + 1)
        val c = verify(sets, P.containmentCandidates(pref, ranked, 4, 5))
          .filter(col("inter") * 5 >= col("na") * 4)
        c.count()
      }
    }
    spark.stop()
  }
}
