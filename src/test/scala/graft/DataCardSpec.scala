package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.QualityOps

/** Data card (`dq_datacard`): hand-computed cells on a planted corpus —
  * volume, Gopher keep rate, exact-dup rate — plus grouping shape. */
class DataCardSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** (web, en): 4 docs — two exact dups, one Gopher violator (no
    * stopword), all others pass. (books, de): 2 clean docs. */
  private def docs = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val pass = "the cat sat on, the mat today fine."    // 8 toks, stopword, ok ratios
    Seq(
      (1L, "web", "en", pass),
      (2L, "web", "en", "dup dup the dup dup, dup dup."), // dup pair member
      (3L, "web", "en", "dup dup the dup dup, dup dup."), // dup pair member
      (4L, "web", "en", "zzz yyy xxx www vvv uuu."),      // no stopword -> drop
      (5L, "books", "de", "the calm river flows, past old towns."),
      (6L, "books", "de", "the quick brown fox jumps over all dogs.")
    ).toDF("doc_id", "source", "lang", "text")
  }

  test("hand-computed card cells") {
    val rows = QualityOps.dataCard(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(rows.size == 2)
    val web = rows(("web", "en"))
    assert(web.getAs[Long]("n_docs") == 4L)
    // tokens: 8 + 7 + 7 + 6 = 28; mean = 28 div 4 = 7
    assert(web.getAs[Long]("total_tokens") == 28L)
    assert(web.getAs[Long]("mean_tokens") == 7L)
    // keepers: docs 1,2,3 (doc 4 fails the stopword rule) = 3/4
    assert(web.getAs[Long]("keep_ppm") == 3L * 1000000L / 4L)
    // dups: docs 2,3 share a text hash = 2/4
    assert(web.getAs[Long]("dup_ppm") == 500000L)
    val books = rows(("books", "de"))
    assert(books.getAs[Long]("n_docs") == 2L)
    assert(books.getAs[Long]("keep_ppm") == 1000000L)
    assert(books.getAs[Long]("dup_ppm") == 0L)
  }

  test("dup detection is corpus-wide, not per-cell") {
    import spark.implicits._
    // the same text planted in two DIFFERENT cells still counts as dup
    val cross = Seq(
      (1L, "web", "en", "the same exact, boring text here ok."),
      (2L, "books", "de", "the same exact, boring text here ok.")
    ).toDF("doc_id", "source", "lang", "text")
    val rows = QualityOps.dataCard(cross).collect()
    assert(rows.length == 2)
    rows.foreach(r => assert(r.getAs[Long]("dup_ppm") == 1000000L))
  }
}
