package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextOps

/** Inverted-index build (`serve_text_index`): postings bookkeeping
  * (df / cf), the head-posting tie-break (tf DESC, doc_id ASC — the
  * impact-ordered layout's first entry), and the idf identity with
  * [[TextOps.bm25TopDocs]]'s integer formula. The driver gate
  * additionally cross-checks the operator against DuckDB at sf0.01. */
class TextIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def index(rows: Seq[(Long, String)]): Map[String, (Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    TextOps.textIndexBuild(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
  }

  private val corpus = Seq(
    1L -> "apple banana apple",
    2L -> "apple cherry",
    3L -> "banana banana banana",
    4L -> "tie tie solo",
    5L -> "tie tie")

  test("df counts distinct docs, cf total occurrences, one row per term") {
    val ix = index(corpus)
    assert(ix.keySet == Set("apple", "banana", "cherry", "tie", "solo"))
    assert(ix("apple")._1 == 2L && ix("apple")._2 == 3L)   // docs 1,2; tf 2+1
    assert(ix("banana")._1 == 2L && ix("banana")._2 == 4L) // docs 1,3; tf 1+3
    assert(ix("cherry")._1 == 1L && ix("cherry")._2 == 1L)
  }

  test("head posting is (tf DESC, doc_id ASC): max tf wins, ties to the lowest doc") {
    val ix = index(corpus)
    assert((ix("apple")._3, ix("apple")._4) == (1L, 2L),
      "apple peaks in doc 1 at tf 2")
    assert((ix("banana")._3, ix("banana")._4) == (3L, 3L),
      "banana peaks in doc 3 at tf 3")
    // docs 4 and 5 both have tf('tie') = 2 — the lower doc_id is the head
    assert((ix("tie")._3, ix("tie")._4) == (4L, 2L))
  }

  test("idf_milli is bm25TopDocs's exact integer formula ((2N-2df+1)*1000) div (2df+1)") {
    val ix = index(corpus)
    val n = corpus.size.toLong
    ix.foreach { case (term, (df, _, _, _, idf)) =>
      assert(idf == ((2 * n - 2 * df + 1) * 1000) / (2 * df + 1),
        s"idf mismatch for $term (df=$df)")
    }
    // spot value: df=2, N=5 -> 7000/5 = 1400
    assert(ix("apple")._5 == 1400L)
  }

  test("empty and whitespace-only docs index nothing; vocabulary is corpus-bounded") {
    val ix = index(Seq(1L -> "", 2L -> "   ", 3L -> "only term here"))
    assert(ix.keySet == Set("only", "term", "here"))
    assert(ix.values.forall { case (df, cf, top, tf, _) =>
      df == 1L && cf == 1L && top == 3L && tf == 1L })
  }
}
