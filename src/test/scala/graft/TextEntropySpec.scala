package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.UnigramKernel
import graft.ops.TextOps

/** Integer token entropy (`tokenEntropy`): exact milli-bit identities
  * on planted distributions, token-order invariance, and a local
  * log2Milli replay over the real corpus. */
class TextEntropySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("planted distributions: repetition → 0, uniform k tokens → L(k) exactly") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam"), // 1 distinct
      (2L, "a b c d e f g h"),                          // 8 uniform
      (3L, "x x y y z z w w"),                          // 4 uniform ×2
      (4L, "only")                                      // 1 token
    ).toDF("doc_id", "text")
    val out = TextOps.tokenEntropy(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // all-identical tokens: H = 0 exactly
    assert(out(1L) == ((8L, 1L, 0L)))
    assert(out(4L) == ((1L, 1L, 0L)))
    // uniform over k distinct: H = log2(k) exactly — L(8)=3000, and
    // the ×2 case: N·L(N) − k·2·L(2) = 8·3000 − 4·2·1000 over 8
    assert(out(2L) == ((8L, 8L, UnigramKernel.log2Milli(8))))
    assert(out(3L)._3 == (8L * UnigramKernel.log2Milli(8) -
      4L * 2L * UnigramKernel.log2Milli(2)) / 8L)
  }

  test("token order never changes the entropy") {
    import spark.implicits._
    val a = TextOps.tokenEntropy(Seq((1L, "a a b c c c")).toDF("doc_id", "text"))
    val b = TextOps.tokenEntropy(Seq((1L, "c a c b a c")).toDF("doc_id", "text"))
    assert(a.collect().toSeq == b.collect().toSeq)
  }

  test("kernel ≡ keyed-aggregation formulation on every corpus row") {
    val docs = Tables.t(spark, "/root/testdata/sf0.01", "documents")
    val k = TextOps.tokenEntropy(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val keyed = TextOps.tokenEntropyKeyed(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(k == keyed)
    assert(k.nonEmpty)
  }

  test("corpus replay: engine milli-bits equal a local log2Milli recompute") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val out = TextOps.tokenEntropy(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val texts = docs.select("doc_id", "text").collect()
    texts.foreach { r =>
      val toks = r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.nonEmpty) {
        val n = toks.length.toLong
        val sNl = toks.groupBy(identity).values
          .map(g => g.length.toLong * UnigramKernel.log2Milli(g.length.toLong)).sum
        val want = (n * UnigramKernel.log2Milli(n) - sNl) / n
        assert(out(r.getLong(0)) == want, s"doc ${r.getLong(0)}")
      }
    }
    // sanity: the corpus is natural-ish text, entropies spread well
    // above template level
    val vals = out.values.toSeq
    assert(vals.max > 3000, s"max entropy ${vals.max} suspiciously low")
  }
}
