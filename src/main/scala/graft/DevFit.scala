package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Offline classifier fit — the provenance tool behind
  * `llm_quality_classify`'s literal weights.
  *
  * The labeled fixture is the fasttext-gate construction (good corpus
  * vs corrupted corpus, the public CCNet/fasttext quality-classifier
  * recipe): positives are the sf0.01 English documents as-is (label 1);
  * negatives (label 0) are the SAME documents deterministically
  * corrupted — the first three words repeated 15x (repetition + low
  * type-token ratio + shared-substring mass across the negative class)
  * with a PII tail appended (one email + one phone). No randomness
  * anywhere: the corruption is a pure function of each doc's text.
  *
  * Fit: closed-form ridge regression (normal equations, lambda 1e-3) of
  * the label on the five `docFeatures` signals the classifier consumes
  * (score, stop_ratio, rep_ratio, frac_shared, n_pii) plus an
  * intercept. Features come from the same `GraftPipelines.docFeatures`
  * pipeline the export query runs; rows are accumulated in doc_id order
  * (collected — this is a Dev tool fitting ~450 rows, not an engine
  * path); the 6x6 solve is Gaussian elimination with partial pivoting.
  * Re-running reproduces the weights bit-for-bit; the rounded
  * 4-decimal literals are what `TextOps.clfScoreSql` and the Spark
  * column carry, with the decision at the 0.5 label midpoint.
  *
  * Generalization check: a deterministic 2/3-train / 1/3-eval split
  * (fold keyed on the base doc_id so each clean doc and its corrupted
  * twin share a fold — no twin leakage) refits on the train fold and
  * scores the held-out fold. Last recorded: eval acc 1.0000
  * (75/75 + 75/75 at sf0.01). The SHIPPED literals remain the full-fit
  * output, unchanged by the split.
  */
object DevFit {

  /** Solve A w = b by Gaussian elimination with partial pivoting —
    * deterministic for a fixed A, b. */
  def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val n = b0.length
    val a = a0.map(_.clone()); val b = b0.clone()
    for (col <- 0 until n) {
      var p = col
      for (r <- col + 1 until n)
        if (math.abs(a(r)(col)) > math.abs(a(p)(col))) p = r
      val tmp = a(col); a(col) = a(p); a(p) = tmp
      val tb = b(col); b(col) = b(p); b(p) = tb
      require(math.abs(a(col)(col)) > 1e-12, s"singular at col $col")
      for (r <- col + 1 until n) {
        val f = a(r)(col) / a(col)(col)
        for (c <- col until n) a(r)(c) -= f * a(col)(c)
        b(r) -= f * b(col)
      }
    }
    val w = new Array[Double](n)
    for (r <- (n - 1) to 0 by -1) {
      var s = b(r)
      for (c <- r + 1 until n) s -= a(r)(c) * w(c)
      w(r) = s / a(r)(r)
    }
    w
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    val en = Tables.documents(spark, sf).filter($"lang" === "en")
    // negatives: deterministic corruption of the same docs — a doc_id-
    // varying slice of the opening words repeated a doc_id-varying
    // number of times (repetition, low TTR, shared-substring mass), and
    // a PII tail on only every third negative so no single feature is a
    // constant perfect separator the ridge can shortcut onto. The
    // corruption is a pure function of (text, doc_id): seed-free.
    val bad = en.select(
      ($"doc_id" + 1000000L).as("doc_id"),
      concat(
        array_join(flatten(transform(
          sequence(lit(1), lit(8) + pmod($"doc_id", lit(12))),
          _ => slice(split($"text", " "), lit(1),
            lit(2) + pmod($"doc_id", lit(4))))), " "),
        when(pmod($"doc_id", lit(3)) === 0,
          lit(" contact me at spam@example.com or 555-123-4567"))
          .otherwise(lit(""))).as("text"),
      $"lang", $"source", $"n_chars")
    val fixture = en.select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .unionByName(bad)
    val feats = graft.api.GraftPipelines
      .docFeatures(fixture, graft.api.GraftPipelines.DefaultStopwords)
    val rows = feats
      .select($"doc_id", $"score", $"stop_ratio",
        coalesce($"rep_ratio", lit(0.0)).as("rep"),
        coalesce($"frac_shared", lit(0.0)).as("shared"),
        coalesce($"n_pii", lit(0)).cast("double").as("pii"),
        when($"doc_id" < 1000000L, 1.0).otherwise(0.0).as("y"))
      .orderBy($"doc_id")
      .collect()
      .map(r => (r.getLong(0),
        Array(1.0, r.getDouble(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5)), r.getDouble(6)))

    val d = 6
    val lambda = 1e-3
    def ridgeFit(data: Array[(Long, Array[Double], Double)]): Array[Double] = {
      val xtx = Array.ofDim[Double](d, d)
      val xty = new Array[Double](d)
      data.foreach { case (_, x, y) =>
        var i = 0
        while (i < d) {
          xty(i) += x(i) * y
          var j = 0
          while (j < d) { xtx(i)(j) += x(i) * x(j); j += 1 }
          i += 1
        }
      }
      for (i <- 0 until d) xtx(i)(i) += lambda
      solve(xtx, xty)
    }
    def accuracyAt(data: Array[(Long, Array[Double], Double)],
        weights: Array[Double]): (Double, Int, Int, Int, Int) = {
      val (tp, fp, fn, tn) = data.foldLeft((0, 0, 0, 0)) {
        case ((a, b, c, e), (_, x, y)) =>
          val s = x.zip(weights).map { case (xi, wi) => xi * wi }.sum
          val keep = s > 0.5
          if (keep && y == 1.0) (a + 1, b, c, e)
          else if (keep) (a, b + 1, c, e)
          else if (y == 1.0) (a, b, c + 1, e)
          else (a, b, c, e + 1)
      }
      ((tp + tn).toDouble / data.length, tp, fp, fn, tn)
    }

    // Held-out evaluation: deterministic 2/3-train / 1/3-eval split keyed
    // on the BASE doc_id (doc_id mod 1000000) so each clean doc and its
    // corrupted twin land in the SAME fold — twin leakage would flatter
    // the eval number. The shipped literals still come from the full fit
    // below; this split exists only to make the accuracy claim honest.
    val (train, evalSet) = rows.partition { case (id, _, _) =>
      (id % 1000000L) % 3 != 0
    }
    val wHeld = ridgeFit(train)
    val (evalAcc, etp, efp, efn, etn) = accuracyAt(evalSet, wHeld)

    val w = ridgeFit(rows)

    val names = Seq("intercept", "score", "stop_ratio", "rep_ratio",
      "frac_shared", "n_pii")
    println(s"[fit] n=${rows.length} lambda=$lambda label=clean-vs-corrupted")
    names.zip(w).foreach { case (n, v) => println(f"[fit] w($n%-11s) = $v%+.6f") }
    val rounded = w.map(v => math.rint(v * 10000) / 10000)
    println("[fit] rounded 4dp literals: " + rounded.mkString(", "))
    // train metrics at the 0.5 decision threshold, with ROUNDED weights
    // (what ships)
    val (acc, tp, fp, fn, tn) = accuracyAt(rows, rounded)
    println(f"[fit] train acc=$acc%.4f tp=$tp fp=$fp fn=$fn tn=$tn")
    println(f"[fit] held-out eval (fit on ${train.length}, eval on " +
      f"${evalSet.length}): acc=$evalAcc%.4f tp=$etp fp=$efp fn=$efn tn=$etn")
    spark.stop()
  }
}
