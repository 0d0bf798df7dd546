package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.ops.TextOps

/** DoReMi-style domain reweighting: the unigram reference scorer's
  * OOV ceiling and explicit zero-token fate, the planted
  * structured-vs-scrambled corpus where bigram learnability (not
  * volume) must decide the mixture, and the EG normalization
  * invariants. */
class DoremiSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docsDf(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    rows.toDF("doc_id", "text", "source")
  }

  test("uniRefScore: fully-OOV doc scores exactly the 1-ppm ceiling; " +
    "zero-token doc keeps n_tokens 0 and a null score") {
    val df = docsDf(Seq(
      (0L, "alpha beta alpha beta", "r"),   // the reference doc (id % 4 == 0)
      (1L, "zz qq ww", "x"),                // every token OOV
      (2L, "   ", "x"),                     // zero tokens
      (3L, "alpha beta", "x")))             // fully in-reference
    val got = TextOps.uniRefScore(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got(1L) == ((3L, Some(TextOps.L2M1M))),
      "an all-OOV doc must score exactly l2m(1e6) milli-bits per token")
    assert(got(2L) == ((0L, None)), "zero-token docs keep an explicit null fate")
    val (n3, Some(s3)) = got(3L)
    assert(n3 == 2L && s3 < TextOps.L2M1M,
      "in-reference tokens must beat the OOV ceiling")
  }

  test("doremiWeights: bigram-structured domain outweighs the scrambled " +
    "same-unigram domain; EG invariants hold") {
    // A docs cycle a fixed phrase (every bigram is in the reference);
    // B docs reuse the SAME token multiset scrambled so their bigrams
    // are mostly unseen. Reference split (doc_id % 4 == 0) is A-only.
    val aText = "alpha beta gamma delta alpha beta gamma delta alpha beta"
    val bText = "beta alpha delta beta gamma alpha delta gamma beta alpha"
    val rows = (0L until 20L).map { i =>
      if (i % 4L <= 1L) (i, aText, "structured") else (i, bText, "scrambled")
    }
    val got = TextOps.doremiWeights(docsDf(rows)).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val (nA, knA, uniA, exA, wA) = got("structured")
    val (nB, knB, uniB, exB, wB) = got("scrambled")
    assert(nA == 10L && nB == 10L)
    assert(uniA == uniB, "same token multiset ⇒ identical unigram scores")
    assert(knA < knB, "the reference bigram model must explain A better")
    assert(exA > exB && wA > wB,
      "higher excess loss ⇒ larger DoReMi weight")
    val tot = wA + wB
    assert(tot <= 1000000L && tot > 1000000L - 2,
      s"ppm weights must normalize up to truncation: $tot")
  }

  test("doremiWeights: identical domains split the mixture exactly in half") {
    val text = "alpha beta gamma delta alpha beta gamma delta"
    val rows = (0L until 8L).map { i =>
      (i, text, if (i % 2L == 0L) "even" else "odd")
    }
    val got = TextOps.doremiWeights(docsDf(rows)).collect()
      .map(r => r.getString(0) -> (r.getLong(4), r.getLong(5))).toMap
    assert(got("even") == ((0L, 500000L)) || got("even")._2 == 500000L)
    assert(got("odd")._2 == 500000L)
    assert(got("even")._1 == got("odd")._1)
  }
}
