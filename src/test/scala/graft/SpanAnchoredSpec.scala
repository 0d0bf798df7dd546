package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.DedupOps

/** The alignment gap in strided span dedup, pinned with a planted
  * counterexample, and its content-defined fix.
  *
  * Construction: a 40-token substring shared by two documents at
  * start offsets 1 (doc 1) and 2 (doc 2) — offsets NOT congruent mod
  * SpanStride=10, so no strided 20-token window of one doc can be
  * content-equal to a strided window of the other: the strided
  * detector scores ZERO duplicated spans on an arbitrarily blatant
  * 40-token duplicate. The anchored detector starts spans at
  * token-hash anchors (h ≡ 0 mod 8) — positions that travel WITH the
  * content — and catches it from either offset. */
class SpanAnchoredSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val shared = (0 until 40).map(i => s"tok$i")

  test("construction sanity: anchors exist inside the shared block") {
    // self-validating plant: the anchored detector can only see the
    // duplicate if some shared token at relative position ≤ 20
    // (0-based) is an anchor, leaving a full 20-token span inside the
    // shared block. With tok0..tok39 the anchors sit at 12, 17, 25.
    val anchorPos = shared.zipWithIndex.collect {
      case (w, i) if graft.functions.TextKernel.md5Mod(w) % DedupOps.AnchorMod == 0 => i
    }
    assert(anchorPos == Seq(12, 17, 25))
    assert(anchorPos.count(_ <= 40 - DedupOps.SpanSize) == 2)
  }

  private def plantedDocs = {
    import spark.implicits._
    val doc1 = (shared ++ (1 to 5).map(i => s"fillA$i")).mkString(" ")
    val doc2 = (Seq("padX") ++ shared ++ (1 to 5).map(i => s"fillB$i")).mkString(" ")
    Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text")
  }

  test("strided spanDups MISSES the offset-1 40-token duplicate") {
    spark.sparkContext.setLogLevel("WARN")
    val got = DedupOps.spanDups(plantedDocs).orderBy("doc_id").collect()
    assert(got.forall(_.getLong(2) == 0L),
      s"strided detector unexpectedly caught the planted offset-duplicate: ${got.toSeq}")
    // and it's not for lack of spans — both docs produced strided spans
    assert(got.forall(_.getLong(1) > 0L))
  }

  test("anchored spanDupsAnchored CATCHES it from either offset") {
    val got = DedupOps.spanDupsAnchored(plantedDocs).orderBy("doc_id").collect()
    // exactly the two in-block anchor windows (rel 12 and 17) are
    // shared; the rel-25 window overhangs into per-doc filler
    got.foreach { r =>
      assert(r.getLong(2) == 2L, s"expected 2 shared anchored spans, got $r")
      assert(r.getLong(3) > 0L) // dup_frac_ppm
    }
  }

  test("aligned duplication: both detectors agree (anchored loses nothing)") {
    import spark.implicits._
    // same substring, same offset in both docs — the strided
    // detector's home turf
    val doc1 = (shared ++ (1 to 5).map(i => s"tailA$i")).mkString(" ")
    val doc2 = (shared ++ (1 to 5).map(i => s"tailB$i")).mkString(" ")
    val docs = Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text")
    val strided = DedupOps.spanDups(docs).orderBy("doc_id").collect()
    val anchored = DedupOps.spanDupsAnchored(docs).orderBy("doc_id").collect()
    assert(strided.forall(_.getLong(2) > 0L))
    assert(anchored.forall(_.getLong(2) > 0L))
  }

  test("short docs (< spanSize tokens) emit zero spans, zero dups") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val got = DedupOps.spanDupsAnchored(docs).orderBy("doc_id").collect()
    got.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L && r.getLong(3) == 0L)
    }
  }
}
