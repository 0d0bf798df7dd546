package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.CurationOps

/** Data-constrained epoch planner (`mix_epoch_plan`): the τ=½ ppm
  * weights, the epoch cap binding on oversampled domains, leftover
  * redistribution reaching the small domains, budget conservation,
  * and the all-integer waterfall replayed by hand. The driver gate
  * additionally cross-checks against DuckDB at sf0.01. */
class EpochPlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** One doc per source with exactly `n` single-char tokens. */
  private def corpus(sizes: Map[String, Int]) = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    sizes.toSeq.zipWithIndex.map { case ((src, n), i) =>
      (i.toLong, Seq.fill(n)("w").mkString(" "), src)
    }.toDF("doc_id", "text", "source")
  }

  private def plan(sizes: Map[String, Int], mult: Long, maxE: Long = 4L) =
    CurationOps.epochPlan(corpus(sizes), budgetMult = mult, maxEpochs = maxE)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toMap

  test("budget = global cap: the waterfall saturates every domain at max epochs") {
    // B = 4×total and cap-total = 4×total — round 2 must fill the small
    // domain that round 1's τ-weights starved, to exactly its cap
    val p = plan(Map("a" -> 1000, "b" -> 1000, "c" -> 100), mult = 4L)
    p.foreach { case (src, (avail, _, alloc, eppm, capped)) =>
      assert(alloc == 4L * avail, s"$src must saturate")
      assert(eppm == 4000000L && capped, s"$src epochs_ppm/capped")
    }
    // τ=½ ppm weights: 1000² ·1e6 / 2 010 000 = 497512 each big domain
    assert(p("a")._2 == 497512L && p("c")._2 == 4975L)
  }

  test("under-subscribed budget: caps bind nowhere, hand-replay is exact") {
    // T = 6000, T_sq = 18e6, B = 12000:
    //   w_a = w_b = 55555 ppm, w_c = 888888 ppm
    //   a1 = (12000·w) div 1e6 = 666 / 666 / 10666 (all below caps)
    //   leftover = 12000 − 11998 = 2; t_unc = 6000
    //   add = (2·T_d) div 6000 = 0 / 0 / 1
    val p = plan(Map("a" -> 1000, "b" -> 1000, "c" -> 4000), mult = 2L)
    assert(p("a") == ((1000L, 55555L, 666L, 666000L, false)))
    assert(p("b") == ((1000L, 55555L, 666L, 666000L, false)))
    assert(p("c") == ((4000L, 888888L, 10667L, 2666750L, false)))
    assert(p.values.map(_._3).sum <= 2L * 6000L, "never over budget")
  }

  test("oversampled big domain caps; its surplus flows to the uncapped ones") {
    // τ=½ weights send (24000·888888) div 1e6 = 21333 at c — over its
    // 16000 cap; the 5334 leftover redistributes by availability and
    // tops a and b up to exactly their own caps
    val p = plan(Map("a" -> 1000, "b" -> 1000, "c" -> 4000), mult = 4L)
    assert(p("c")._3 == 16000L && p("c")._5, "big domain pinned at 4 epochs")
    assert(p("a")._3 == 4000L && p("a")._5)
    val budget = 4L * 6000L
    assert(p.values.map(_._3).sum <= budget)
  }

  test("materialize: a saturated plan repeats every doc exactly maxEpochs times") {
    import spark.implicits._
    // B = 4×total = the global cap → epochs_ppm = 4e6 everywhere, so
    // materialization is exact: 4 copies per doc, copy ids dense
    val docs = (0 until 30).map(i =>
      (i.toLong, Seq.fill(10)("w").mkString(" "), s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
    val out = CurationOps.epochMaterialize(docs, budgetMult = 4L, maxEpochs = 4L)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(out.length == 30 * 4)
    out.groupBy(_._1).foreach { case (id, copies) =>
      assert(copies.forall(_._2 == 4L), s"doc $id copy count")
      assert(copies.map(_._3).sorted.toSeq == (1L to 4L), s"doc $id dense copies")
    }
  }

  test("materialize: fractional epochs select by doc hash, bounded and deterministic") {
    import spark.implicits._
    // one domain, mult = 2 under cap 4: epochs_ppm = 2e6·(floor noise)
    // — force a genuine fraction with two unequal domains (the
    // under-subscribed scenario: a≈0.666 epochs, c≈2.667)
    val docs = ((0 until 50).map(i =>
      (i.toLong, Seq.fill(20)("w").mkString(" "), "a")) ++
      (50 until 100).map(i =>
        (i.toLong, Seq.fill(80)("w").mkString(" "), "c")))
      .toDF("doc_id", "text", "source")
    val out = CurationOps.epochMaterialize(docs, budgetMult = 2L, maxEpochs = 4L)
    val perDoc = out.groupBy("doc_id", "source", "n_tokens")
      .count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // a: 0.666 epochs → copies in {0(absent),1}; c: 2.667 → {2,3}
    perDoc.filter(_._2 == "a").foreach(r => assert(r._4 == 1L))
    perDoc.filter(_._2 == "c").foreach(r => assert(r._4 == 2L || r._4 == 3L))
    // realized token mass lands inside [floor, ceil] of the epoch band
    val aTok = perDoc.filter(_._2 == "a").map(r => r._3 * r._4).sum
    val cTok = perDoc.filter(_._2 == "c").map(r => r._3 * r._4).sum
    assert(aTok >= 0L && aTok <= 1000L, s"a mass $aTok")
    assert(cTok >= 2L * 4000L && cTok <= 3L * 4000L, s"c mass $cTok")
    // a pure function of ids: identical under repartition
    val again = CurationOps.epochMaterialize(docs.repartition(7), 2L, 4L)
      .collect().map(_.toSeq).toSet
    assert(out.collect().map(_.toSeq).toSet == again)
  }

  test("epoch ceiling is monotone in maxEpochs; epochs_ppm never exceeds it") {
    for (e <- Seq(1L, 2L, 8L)) {
      val p = plan(Map("a" -> 500, "b" -> 2000), mult = 6L, maxE = e)
      p.foreach { case (src, (_, _, _, eppm, _)) =>
        assert(eppm <= e * 1000000L, s"maxE=$e $src")
      }
    }
  }
}
