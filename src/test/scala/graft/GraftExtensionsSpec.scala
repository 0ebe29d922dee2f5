package graft

import org.apache.spark.sql.SparkSession

/** SQL-registered native functions via SparkSessionExtensions. */
class GraftExtensionsSpec extends SparkSpec {

  test("cosine_similarity / dot_product callable from SQL") {
    // getOrCreate reuses any active session and would skip the extension,
    // so detach the shared one first (same SparkContext is reused).
    spark // force shared session init
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try Tables.embeddings(s2, sf).createOrReplaceTempView("emb")
    finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
    val r = s2.sql(
      """SELECT vec_id, cosine_similarity(embedding, embedding) AS self_cos,
        |       dot_product(embedding, embedding) AS self_dot
        |FROM emb ORDER BY vec_id LIMIT 5""".stripMargin).collect()
    assert(r.length == 5)
    r.foreach { row =>
      assert(math.abs(row.getDouble(1) - 1.0) < 1e-9)
      assert(row.getDouble(2) > 0.0)
    }

    // md5_half60: SQL form agrees with the direct evaluator, and the
    // optional second argument picks the upper digest half.
    import org.apache.spark.unsafe.types.UTF8String
    val h = s2.sql(
      "SELECT md5_half60('abc') AS lo, md5_half60('abc', true) AS hi")
      .collect()(0)
    assert(h.getLong(0) ==
      functions.HashUtils.md5Long60(UTF8String.fromString("abc"), false))
    assert(h.getLong(1) ==
      functions.HashUtils.md5Long60(UTF8String.fromString("abc"), true))
    assert(h.getLong(0) != h.getLong(1))
  }
}
