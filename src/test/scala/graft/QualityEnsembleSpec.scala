package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.ops.TextOps

/** FineWeb-style quality ensemble: each arm (Gopher rules, repetition
  * screen, KN perplexity tier) fails exactly its planted violator, the
  * tercile thresholds come from the reference split's own scores, and
  * the keep decision is the conjunction. */
class QualityEnsembleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    // qualityEnsemble reads doc_id/text/source
    rows.map { case (id, t) => (id, t, "s0") }.toDF("doc_id", "text", "source")
  }

  // reference split = doc_id % 4 == 0 (N below the count-driven knee)
  private val refRows = Seq(
    (0L, "the cat sat on the mat today."),
    (4L, "the dog sat on the rug today."),
    (8L, "the cat and the dog sat near the mat."),
    (12L, "the bird flew over the mat and the rug."))

  test("each arm fails exactly its planted violator; keep is the conjunction") {
    spark.sparkContext.setLogLevel("WARN")
    val probes = Seq(
      // in-distribution: all ref bigrams seen -> head/middle, all rules pass
      (1L, "the cat sat on the mat today."),
      // repetition violator: gopher-clean but dup-bigram frac ~60 %
      (2L, "the foo bar foo bar foo bar foo bar foo bar."),
      // gopher violator (no stopword), repetition-clean
      (3L, "foo bar baz qux quux corge."),
      // rule-passing but every bigram unseen in the reference -> tail
      (5L, "the qqq www eee rrr ttt."),
      // sub-bigram doc -> tier na, dropped
      (6L, "solo"))
    val out = TextOps.qualityEnsemble(docsDf(refRows ++ probes)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(4), r.getLong(5)))).toMap

    val (g1, r1, tier1, k1) = out(1L)
    assert(g1 == 1L && r1 == 1L && Set("head", "middle")(tier1) && k1 == 1L,
      s"in-distribution doc must keep: ${out(1L)}")
    val (g2, r2, _, k2) = out(2L)
    assert(g2 == 1L && r2 == 0L && k2 == 0L,
      s"repetition violator must fail ONLY repetition: ${out(2L)}")
    val (g3, r3, _, k3) = out(3L)
    assert(g3 == 0L && r3 == 1L && k3 == 0L,
      s"gopher violator must fail ONLY gopher: ${out(3L)}")
    val (g5, r5, tier5, k5) = out(5L)
    assert(g5 == 1L && r5 == 1L && tier5 == "tail" && k5 == 0L,
      s"all-unseen-bigram doc must land in the tail tier: ${out(5L)}")
    val (_, _, tier6, k6) = out(6L)
    assert(tier6 == "na" && k6 == 0L, s"sub-bigram doc: ${out(6L)}")

    // every keep decision is exactly the conjunction of its own row
    TextOps.qualityEnsemble(docsDf(refRows ++ probes)).collect().foreach { r =>
      val want = if (r.getLong(1) == 1L && r.getLong(2) == 1L &&
        Set("head", "middle")(r.getString(4))) 1L else 0L
      assert(r.getLong(5) == want, s"keep must be the conjunction: $r")
    }
  }

  test("tercile thresholds come from the reference split's own score distribution") {
    spark.sparkContext.setLogLevel("WARN")
    val out = TextOps.qualityEnsemble(docsDf(refRows)).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    // the 4 reference docs tier THEMSELVES: ceil-tercile order stats
    // put >= 2 docs at-or-below t1 ('head') and none above t2 except
    // at most the top ceil(n/3)
    val tiers = refRows.map { case (id, _) => out(id) }
    assert(tiers.count(_ == "head") >= 2, s"ceil terciles: $tiers")
    assert(tiers.count(_ == "tail") <= 1, s"ceil terciles: $tiers")
  }

  test("all branches exercised on the real gate corpus") {
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val out = TextOps.qualityEnsemble(docs).collect()
    val tiers = out.groupBy(_.getString(4)).view.mapValues(_.length).toMap
    assert(tiers.getOrElse("head", 0) > 0 && tiers.getOrElse("middle", 0) > 0 &&
      tiers.getOrElse("tail", 0) > 0, s"degenerate tiers: $tiers")
    val kept = out.count(_.getLong(5) == 1L)
    assert(kept > 0 && kept < out.length,
      s"the gate corpus must exercise both keep fates: $kept/${out.length}")
  }
}
