package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.serving.IndexStore
import graft.streaming.StreamBm25Serve

/** The text index APPEND lifecycle (round 16 — the family's missing
  * stage, closing "all four artifact families carry the full
  * lifecycle"). Pinned here:
  *   - append is directory-additive: postings become old ∪ delta, the
  *     terms table stays byte-frozen (stale df/idf — the appendAnn
  *     contract), stats stay EXACT via summed delta rows (avgdl never
  *     drifts)
  *   - compact-after-append ≡ writeText(old ∪ delta), row for row
  *     across postings, terms AND stats
  *   - append + delete + compact ≡ writeText(truth-minus-deleted) —
  *     the lifecycle stages compose
  *   - a streaming serve picks up the compacted generation at the
  *     next micro-batch boundary (GenCached re-resolve)
  */
class TextAppendSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val docs = {
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  }
  private val newPred = col("doc_id") % 10 === 7

  private def fresh(name: String): String = {
    val dir = IndexStore.scratchDir(s"spec_tappend_$name", name)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    dir
  }

  private def terms(i: IndexStore.TextIndex) =
    i.terms.select("term", "df", "idf_milli").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  private def posts(i: IndexStore.TextIndex) =
    i.postings.select("term", "doc_id", "dl", "tf").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

  test("append is directory-additive: postings = old UNION delta, terms " +
    "frozen, stats exact via the summed delta row") {
    val dir = fresh("additive")
    IndexStore.writeText(docs.filter(!newPred), dir)
    val before = IndexStore.loadText(spark, dir)
    val termsBefore = terms(before)
    val postsBefore = posts(before)
    IndexStore.appendText(docs.filter(newPred), dir)
    val after = IndexStore.loadText(spark, dir)
    assert(terms(after) == termsBefore,
      "the terms table is NOT touched by an append (frozen df/idf)")
    assert(posts(after) != postsBefore &&
      postsBefore.subsetOf(posts(after)),
      "appended postings add to the old set without rewriting it")
    // the appended postings are exactly the delta split's
    val fullDir = fresh("additive_full")
    IndexStore.writeText(docs, fullDir)
    val full = IndexStore.loadText(spark, fullDir)
    assert(posts(after) == posts(full),
      "old UNION delta postings == a full build's")
    assert(after.nDocs == full.nDocs && after.nTokens == full.nTokens,
      "summed stats stay exact across the append (avgdl never drifts)")
  }

  test("compact-after-append == writeText(old UNION delta), row for row " +
    "across postings, terms AND stats") {
    val dir = fresh("compact")
    IndexStore.writeText(docs.filter(!newPred), dir)
    IndexStore.appendText(docs.filter(newPred), dir)
    IndexStore.compactText(spark, dir)
    val got = IndexStore.loadText(spark, dir)
    val fullDir = fresh("compact_full")
    IndexStore.writeText(docs, fullDir)
    val want = IndexStore.loadText(spark, fullDir)
    assert(got.nDocs == want.nDocs && got.nTokens == want.nTokens)
    assert(terms(got) == terms(want),
      "compaction recomputes df/idf exactly over the merged corpus")
    assert(posts(got) == posts(want))
  }

  test("append + delete + compact == writeText(truth-minus-deleted): the " +
    "lifecycle stages compose") {
    val delPred = col("doc_id") % 25 === 3
    val dir = fresh("compose")
    IndexStore.writeText(docs.filter(!newPred), dir)
    IndexStore.appendText(docs.filter(newPred), dir)
    IndexStore.deleteText(docs.filter(delPred).select("doc_id"), dir)
    IndexStore.compactText(spark, dir)
    val got = IndexStore.loadText(spark, dir)
    val wantDir = fresh("compose_want")
    IndexStore.writeText(docs.filter(!delPred), wantDir)
    val want = IndexStore.loadText(spark, wantDir)
    assert(got.nDocs == want.nDocs && got.nTokens == want.nTokens)
    assert(terms(got) == terms(want))
    assert(posts(got) == posts(want))
  }

  test("a streaming serve picks up the compact-after-append generation at " +
    "the next micro-batch boundary; the pre-compact batch served the " +
    "frozen stats") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val dir = fresh("live")
    IndexStore.writeText(docs.filter(!newPred), dir)
    IndexStore.appendText(docs.filter(newPred), dir)
    def expect(): Set[(Long, Long, Long, Long, Long)] =
      StreamBm25Serve.serveTopK(
        Seq((0L, Seq("the", "data", "model"))).toDF("q_id", "terms"),
        IndexStore.loadText(spark, dir)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    val want0 = expect()
    val mem = MemoryStream[(Long, Seq[String])]
    val qdf = mem.toDF().select(col("_1").as("q_id"), col("_2").as("terms"))
    val perBatch = scala.collection.mutable.ArrayBuffer
      .empty[Set[(Long, Long, Long, Long, Long)]]
    val query = StreamBm25Serve.serveStreamFrom(qdf, dir) { (out, _) =>
      perBatch.synchronized {
        perBatch += out.collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      }
    }
    try {
      mem.addData((0L, Seq("the", "data", "model")))
      query.processAllAvailable()
      assert(perBatch.synchronized(perBatch.head) == want0,
        "batch 1 serves the appended artifact with frozen df/idf")
      IndexStore.compactText(spark, dir) // mid-stream: gen 1, exact idf
      val want1 = expect()
      assert(want1 != want0,
        "recomputed idf must change these scores for the probe terms")
      mem.addData((0L, Seq("the", "data", "model")))
      query.processAllAvailable()
      assert(perBatch.synchronized(perBatch.last) == want1,
        "batch 2 serves the compacted generation (GenCached re-resolve)")
    } finally query.stop()
  }
}
