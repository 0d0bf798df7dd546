package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.DedupOps

/** Attribution lookup (`dedup_attribution_topk`): exact copies
  * attribute at rank 1 with ppm exactly 1e6 (structural band
  * recall), rankings are monotone with deterministic tie-breaks,
  * novel queries return nothing, and fates are
  * partitioning-independent. */
class AttributionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val source =
    "one two three four five six seven eight nine ten eleven twelve"

  private def mk(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    rows.toDF("doc_id", "text")
  }

  test("exact copy: rank 1, jaccard exactly 1e6; novel query absent") {
    val train = mk(Seq(
      1L -> source,
      2L -> "alpha beta gamma delta eps zeta eta theta iota kappa",
      3L -> "unrelated words entirely different from anything else here"))
    val eval = mk(Seq(
      100L -> source, // exact copy of train doc 1
      101L -> "completely novel text with no overlap whatsoever at all"))
    val rows = DedupOps.attributionTopK(train, eval).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    val top100 = rows.filter(r => r._1 == 100L && r._4 == 1L)
    assert(top100.length == 1)
    assert(top100.head._2 == 1L && top100.head._3 == 1000000L,
      "identical text collides on every band and reranks to exactly 1e6")
    assert(!rows.exists(_._1 == 101L), "novel query has no candidates")
  }

  test("per-query ranking is monotone, dense, k-bounded, tie-broken by t_id") {
    // 10 train docs sharing a long prefix with the query -> many
    // candidates; copies force ties broken by id
    val train = mk((1L to 10L).map(i =>
      i -> (if (i <= 2) source else source + s" extra$i tail$i pad$i")))
    val eval = mk(Seq(100L -> source))
    val rows = DedupOps.attributionTopK(train, eval).collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(4)))
      .sortBy(_._3)
    assert(rows.nonEmpty && rows.length <= DedupOps.AttributionK)
    assert(rows.map(_._3).toSeq == (1L to rows.length.toLong).toSeq)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
      case _ => ()
    }
    // the two verbatim copies are the two best, in id order
    assert(rows.take(2).map(_._1).toSeq == Seq(1L, 2L))
    assert(rows.take(2).forall(_._2 == 1000000L))
  }

  test("results are partitioning-independent") {
    val train = mk((1L to 10L).map(i => i -> (source + s" t$i")))
    val eval = mk(Seq(100L -> source))
    val a = DedupOps.attributionTopK(train, eval).collect()
      .map(_.toSeq).toSet
    val b = DedupOps.attributionTopK(train.repartition(7),
        eval.repartition(3)).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("hot-band guard: a planted boilerplate band is dropped (bounding " +
    "candidates), cold exact copies still attribute, default cap unbinding") {
    val boiler =
      "copy paste header boilerplate lorem ipsum dolor sit amet consectetur"
    // 30 exact copies of the boilerplate put df=30 on EVERY one of its
    // band keys; one cold doc stays at df=1
    val train = mk((1L to 30L).map(i => i -> boiler) :+ (31L -> source))
    val eval = mk(Seq(100L -> boiler, 101L -> source))
    // cap below the hot df: the boilerplate query loses every candidate
    // (all its bands hot — the documented recall trade), the cold one
    // is untouched
    val capped = DedupOps.attributionTopK(train, eval, bandDfCap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(!capped.exists(_._1 == 100L),
      "all-hot-band query must yield zero candidates under the cap")
    assert(capped.exists(r => r._1 == 101L && r._2 == 31L && r._3 == 1000000L),
      "cold exact copy attributes at exactly 1e6 regardless of the cap")
    // the default cap does not bind: the boilerplate attributes normally
    val open = DedupOps.attributionTopK(train, eval)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(open.exists(r => r._1 == 100L && r._2 == 1000000L))
  }

  test("hot-band guard bounds the SERVE's measured candidate volume and " +
    "matches the batch operator when the cap binds") {
    import graft.serving.IndexStore
    val boiler =
      "copy paste header boilerplate lorem ipsum dolor sit amet consectetur"
    val train = mk((1L to 30L).map(i => i -> boiler) :+ (31L -> source))
    val eval = mk(Seq(100L -> boiler, 101L -> source))
    val dir = IndexStore.scratchDir("spec_attr_hot", "attr")
    IndexStore.writeAttr(train, dir)
    val idx = IndexStore.loadAttr(spark, dir)
    // measured candidate rows: ungated the hot band fans out to 30
    // candidates x 2 bands; gated it collapses to the cold doc's rows
    val ungated = graft.streaming.StreamAttribution
      .candidates(eval, idx, bandDfCap = Int.MaxValue).count()
    val gated = graft.streaming.StreamAttribution
      .candidates(eval, idx, bandDfCap = 10).count()
    assert(ungated >= 60L, s"planted hot band must fan out, got $ungated")
    assert(gated <= 2L, s"gated candidates must collapse, got $gated")
    // and the capped serve still equals the capped batch operator
    val want = DedupOps.attributionTopK(train, eval, bandDfCap = 10)
      .collect().map(_.toSeq).toSet
    val got = graft.streaming.StreamAttribution
      .serveTopK(eval, idx, bandDfCap = 10).collect().map(_.toSeq).toSet
    assert(got == want)
  }
}
