package graft

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.DedupOps

/** Top duplicated n-grams (`dedup_top_ngrams`) — the memorization-risk
  * monitor: cross-document spread ranking, occurrence accounting,
  * the ≥ 2-doc floor, short-doc exclusion, and hash↔text agreement
  * across the two passes (the corpus-scale design never shuffles gram
  * text; this pins that the rejoined text is the hash's preimage). */
class TopNgramsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def top(rows: Seq[(Long, String)], n: Int = 4, k: Int = 20) = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    DedupOps.topDupNgrams(rows.toDF("doc_id", "text"), n = n, k = k).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
  }

  private val phrase = "shared secret training phrase" // one 4-gram

  test("a phrase planted across 3 docs tops the table; text is the hash preimage") {
    val rows = Seq(
      1L -> s"alpha $phrase beta",
      2L -> s"$phrase gamma delta epsilon",
      3L -> s"zeta eta theta $phrase",
      4L -> "iota kappa lambda mu nu")
    val out = top(rows)
    assert(out.nonEmpty)
    val (gram, gramH, nDocs, _) = out.head
    assert(gram == phrase)
    assert(nDocs == 3L)
    assert(gramH == md5hex(phrase), "two-pass rejoin must recover the preimage")
    assert(out.forall(_._3 >= 2L), "only cross-document grams are reported")
  }

  test("n_occ counts every occurrence — a doc repeating the phrase twice adds two") {
    val rows = Seq(
      1L -> s"$phrase filler filler filler $phrase",
      2L -> s"$phrase tail words here")
    val hit = top(rows).find(_._1 == phrase).get
    assert(hit._3 == 2L, "two distinct docs")
    assert(hit._4 == 3L, "three total occurrences")
  }

  test("docs shorter than n contribute no grams; k bounds the output") {
    val rows = Seq(1L -> "a b c", 2L -> "a b c") // 3 tokens < n = 4
    assert(top(rows).isEmpty)
    val many = (0 until 6).map(i => i.toLong -> "p q r s t u v w")
    val out = top(many, n = 4, k = 3)
    assert(out.length == 3, "LIMIT k respected")
    assert(out.forall(_._3 == 6L))
  }
}
