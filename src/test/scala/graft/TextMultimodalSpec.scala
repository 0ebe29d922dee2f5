package graft

import graft.operators.MultimodalOps.StubImageDecoder

/** Text analysis + multimodal plumbing. */
class TextMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("llm_quality_score: hand-computed metrics for a known doc") {
    val text = "the cat sat on the mat" // 6 words, 5 distinct, 17 letters
    val df = Seq((1L, text, "en", "s0", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = q("llm_quality_score", tempSfDir("documents" -> df)).collect().head
    assert(r.getAs[Int]("n_words") == 6)
    assert(r.getAs[Int]("n_distinct") == 5)
    assert(math.abs(r.getAs[Double]("avg_word_len") - 17.0 / 6) < 1e-12)
    assert(math.abs(r.getAs[Double]("ttr") - 5.0 / 6) < 1e-12)
    // 'the' twice + 'on'∉markers → stop_ratio = 2/6
    assert(math.abs(r.getAs[Double]("stop_ratio") - 2.0 / 6) < 1e-12)
  }

  test("llm_token_count: whitespace vs regex tokenization diverge on digits") {
    val df = Seq((1L, "abc 123 def9x", "en", "s0", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = q("llm_token_count", tempSfDir("documents" -> df)).collect().head
    assert(r.getAs[Long]("sum_ws_tokens") == 3)  // abc | 123 | def9x
    assert(r.getAs[Long]("sum_re_tokens") == 3)  // abc, def, x
  }

  test("llm_token_bpe: GPT-2-style pre-tokenizer count, hand-traced") {
    // don | 't | " stop" | " 123" | " now" | !! → 6 tokens
    val df = Seq((1L, "don't stop 123 now!!", "en", "s0", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = q("llm_token_bpe", tempSfDir("documents" -> df)).collect().head
    assert(r.getAs[Int]("n_bpe") == 6)
  }

  test("StubImageDecoder: deterministic, byte-driven features") {
    val payload = "abcdef".getBytes("UTF-8")
    val m1 = StubImageDecoder.decode(1L, payload)
    val m2 = StubImageDecoder.decode(1L, payload)
    assert(m1 == m2)
    assert(m1.width == 64 * (1 + 'a'.toInt % 16))
    assert(m1.height == 64 * (1 + 'b'.toInt % 16))
    val expected = "abcdef".map(_.toInt).sum.toDouble / 6
    assert(math.abs(m1.brightness - expected) < 1e-12)
  }

  test("mm_frame_sample: frame math matches payload sizes") {
    q("mm_frame_sample").collect().take(50).foreach { r =>
      val nf = r.getAs[Int]("n_frames")
      val sampled = r.getAs[Int]("n_sampled")
      assert(sampled == (nf + 3) / 4)
    }
  }

  test("llm_lang_id: english markers drive the prediction") {
    val df = Seq(
      (1L, "the cat and the dog of the house", "en", "s0", 32L),
      (2L, "xyzzy plugh quux frobozz", "zz", "s0", 24L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = q("llm_lang_id", tempSfDir("documents" -> df)).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows.contains(("en", "en")))
    assert(rows.contains(("zz", "und")))
  }
}
