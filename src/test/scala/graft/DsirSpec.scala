package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.CurationOps

/** DSIR importance weighting: the semantic invariants the DuckDB
  * hash-compare can't see — that the weights actually SEPARATE
  * target-like from non-target-like text, and that scoring is
  * partitioning-invariant (a per-doc function of corpus-global
  * statistics). */
class DsirSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mkDocs(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    rows.toDF("doc_id", "lang", "text")
  }

  test("docs made of target-only vocabulary outrank docs of non-target vocabulary") {
    // target-lang docs use 'alpha …', others use 'beta …' — the bucket
    // holding 'alpha' is pure-target, the 'beta' bucket pure-raw, so
    // any alpha-doc must outscore any beta-doc
    val docs = mkDocs(
      (0L until 10L).map(i => (i, "en", "alpha alpha alpha")) ++
      (10L until 20L).map(i => (i, "de", "beta beta beta")))
    val out = CurationOps.dsirSelect(docs, targetLang = "en", keep = 20)
      .select("doc_id", "avg_w_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val alphaMin = (0L until 10L).map(out).min
    val betaMax = (10L until 20L).map(out).max
    assert(alphaMin > betaMax,
      s"target-vocab floor $alphaMin must exceed non-target ceiling $betaMax")
  }

  test("mixed-vocab doc scores between the pure docs; keep cuts by rank") {
    val docs = mkDocs(Seq(
      (1L, "en", "alpha alpha alpha alpha"),
      (2L, "de", "alpha alpha beta beta"),
      (3L, "de", "beta beta beta beta")))
    val rows = CurationOps.dsirSelect(docs, targetLang = "en", keep = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    // top-2 of 3: the pure-beta doc is the one cut
    assert(rows == Seq(1L, 2L))
  }

  test("score is partitioning-invariant and a pure function of corpus stats") {
    val docs = mkDocs((0L until 40L).map(i =>
      (i, if (i % 3 == 0) "en" else "de",
        s"word${i % 7} word${i % 5} word${i % 11} filler common")))
    val a = CurationOps.dsirSelect(docs, keep = 40)
      .select("doc_id", "score").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = CurationOps.dsirSelect(docs.repartition(7, col("doc_id")), keep = 40)
      .select("doc_id", "score").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
  }

  test("empty-token docs are excluded; output bounded by keep") {
    val docs = mkDocs(Seq(
      (1L, "en", "alpha"), (2L, "en", "   "), (3L, "de", "beta")))
    val rows = CurationOps.dsirSelect(docs, targetLang = "en", keep = 10).collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L, 3L))
  }
}
