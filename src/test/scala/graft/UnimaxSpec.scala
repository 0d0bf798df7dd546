package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.CurationOps

/** UniMax language sampler (`mix_unimax`): uniform shares, the epoch
  * cap binding on small languages, surplus re-spreading onto the
  * uncapped, exact-equality fairness among never-capped languages,
  * bounded floor residue, and the all-integer rounds replayed by
  * hand. The driver gate additionally cross-checks against DuckDB at
  * sf0.01. */
class UnimaxSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** One doc per language with exactly `n` single-char tokens. */
  private def corpus(sizes: Map[String, Int]) = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    sizes.toSeq.zipWithIndex.map { case ((lang, n), i) =>
      (i.toLong, Seq.fill(n)("w").mkString(" "), lang)
    }.toDF("doc_id", "text", "lang")
  }

  private def plan(sizes: Map[String, Int], mult: Long, maxE: Long = 3L) =
    CurationOps.mixUnimax(corpus(sizes), budgetMult = mult, maxEpochs = maxE)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toMap

  test("hand replay: small language caps, surplus re-spreads uniformly, " +
    "budget conserved exactly") {
    // T = 1600, B = 3200; caps en 3000 / de 1500 / zh 300
    //   round 1: share 3200 div 3 = 1066 → en 1066, de 1066, zh 300 (cap)
    //   round 2: spent 2432, rem 768, share 768 div 2 = 384 → 1450 / 1450
    //   round 3: spent 3200, rem 0 — stable
    val p = plan(Map("en" -> 1000, "de" -> 500, "zh" -> 100), mult = 2L)
    assert(p("zh") == ((100L, 300L, 300L, 3000000L, true)))
    assert(p("en") == ((1000L, 3000L, 1450L, 1450000L, false)))
    assert(p("de") == ((500L, 1500L, 1450L, 2900000L, false)))
    assert(p.values.map(_._3).sum == 3200L, "exact budget conservation here")
  }

  test("UNIFORM fairness: never-capped languages get EXACTLY equal tokens " +
    "regardless of corpus share (the property the temperature family lacks)") {
    val p = plan(Map("en" -> 5000, "de" -> 400, "fr" -> 300, "zh" -> 20),
      mult = 1L)
    val uncapped = p.filter(!_._2._5).values.map(_._3).toSet
    assert(uncapped.size == 1,
      s"all uncapped allocations identical, got ${p.mkString(", ")}")
    // and every capped language sits exactly at its cap
    p.filter(_._2._5).foreach { case (l, (_, cap, alloc, _, _)) =>
      assert(alloc == cap, s"$l at cap")
    }
  }

  test("over-subscribed budget saturates every cap; residue stays bounded " +
    "and deliberately unallocated") {
    // B = 4T > Σcap = 3T: everyone caps at 3 epochs
    val sat = plan(Map("en" -> 1000, "de" -> 500, "zh" -> 100), mult = 4L)
    sat.foreach { case (l, (avail, cap, alloc, eppm, capped)) =>
      assert(cap == 3L * avail && alloc == cap && capped, s"$l saturates")
      assert(eppm == 3000000L)
    }
    // floor-residue case: B = 6004, round shares truncate — hand replay
    // leaves exactly 1 token unallocated (< n_langs, never over-given),
    // and the plan SURFACES it in the residual_tokens column
    val pr = CurationOps.mixUnimax(
        corpus(Map("a" -> 1000, "b" -> 999, "c" -> 998, "d" -> 5)),
        budgetMult = 2L, maxEpochs = 3L).collect()
    val p = pr.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getBoolean(5))).toMap
    val total = p.values.map(_._3).sum
    assert(total == 6003L, s"6004-token budget, 1-token floor residue: $total")
    assert(pr.map(_.getLong(6)).toSet == Set(1L),
      "the 1-token floor residue is emitted as residual_tokens on every row")
    assert(p("d")._5 && p("d")._3 == 15L)
    assert(Set(p("a")._3, p("b")._3, p("c")._3).size == 1, "uncapped equal")
  }

  test("materialize: whole epochs copy exactly, fractional epochs select " +
    "by doc hash within the plan's epochs_ppm; dense copy indices; " +
    "repartition-invariant") {
    import spark.implicits._
    // en: avail 400, cap 1200 — caps in round 1 at exactly 3.0 epochs;
    // de: avail 2000 — absorbs the surplus to 3600 = 1.8 epochs
    val docs = ((0 until 40).map(i =>
      (i.toLong, Seq.fill(10)("w").mkString(" "), "en")) ++
      (40 until 80).map(i =>
        (i.toLong, Seq.fill(50)("w").mkString(" "), "de")))
      .toDF("doc_id", "text", "lang")
    val plan = CurationOps.mixUnimax(docs, budgetMult = 2L, maxEpochs = 3L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(plan("en") == 3000000L && plan("de") == 1800000L, s"plan $plan")
    val out = CurationOps.mixUnimaxMaterialize(docs, 2L, 3L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(4)))
    out.groupBy(r => (r._1, r._2)).foreach { case ((id, l), copies) =>
      val base = plan(l) / 1000000L
      val n = copies.head._3
      assert(copies.forall(_._3 == n) && (n == base || n == base + 1),
        s"doc $id ($l): $n copies vs eppm ${plan(l)}")
      assert(copies.map(_._4).sorted.toSeq == (1L to n).toSeq,
        s"doc $id dense copy indices")
    }
    assert(out.count(_._2 == "en") == 40 * 3, "integral epochs copy exactly")
    val deCopies = out.count(_._2 == "de")
    assert(deCopies >= 40 && deCopies <= 80, s"de realized copies $deCopies")
    val again = CurationOps.mixUnimaxMaterialize(docs.repartition(7), 2L, 3L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3),
        r.getLong(4))).toSet
    assert(out.toSet == again, "fates are pure functions of content")
  }

  test("allocations never exceed caps or the budget at any parameter choice") {
    for (mult <- Seq(1L, 2L, 8L); maxE <- Seq(1L, 3L)) {
      val sizes = Map("en" -> 700, "de" -> 300, "fr" -> 100, "zh" -> 10)
      val p = plan(sizes, mult, maxE)
      val budget = mult * sizes.values.sum
      assert(p.values.map(_._3).sum <= budget, s"mult=$mult maxE=$maxE budget")
      p.foreach { case (l, (_, cap, alloc, _, _)) =>
        assert(alloc <= cap, s"$l alloc<=cap at mult=$mult maxE=$maxE")
      }
    }
  }
}
