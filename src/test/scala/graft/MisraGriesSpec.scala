package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MisraGriesAgg

/** Misra–Gries heavy-hitters sketch invariants, checked as pure-kernel
  * properties (no Spark session) under RANDOMIZED merge trees — the
  * shape Spark actually produces: rows split across partitions in any
  * proportions, partials reduced locally, merged in any association
  * order. Whatever the tree:
  *   1. every item with true count > n/k is present in the sketch
  *      (the candidate-superset guarantee the exact re-filter in
  *      `agg_heavy_hitters` relies on);
  *   2. kept weights never overestimate, and underestimate by ≤ n/k
  *      (the Mergeable Summaries bound);
  *   3. the buffer never exceeds k-1 counters (the memory bound that
  *      makes the partial shuffle-safe at any scale).
  */
class MisraGriesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  /** Evaluate the aggregator over an explicit merge tree: split `xs`
    * into `cuts` consecutive chunks, reduce each, then merge partials
    * left-associatively after a seeded shuffle of their order. */
  private def runTree(agg: MisraGriesAgg, xs: Seq[Long], cuts: Seq[Int],
      seed: Long): Map[Long, Long] = {
    val chunks = {
      val bounds = (cuts.map(c => math.abs(c) % (xs.length + 1)) :+ 0 :+ xs.length)
        .distinct.sorted
      bounds.sliding(2).map { case Seq(a, b) => xs.slice(a, b) }.toVector
    }
    val partials = chunks.map(ch => ch.foldLeft(agg.zero)(agg.reduce))
    val order = new scala.util.Random(seed).shuffle(partials.indices.toVector)
    order.map(partials).foldLeft(agg.zero)(agg.merge)
  }

  // Zipf-ish streams: item i drawn as 60/(r+1) for uniform r — matches
  // the shape agg_heavy_hitters derives from the event log
  private val streamGen: Gen[Seq[Long]] = for {
    n <- Gen.choose(50, 2000)
    rs <- Gen.listOfN(n, Gen.choose(0, 59))
  } yield rs.map(r => 60L / (r + 1))

  private val kGen = Gen.choose(3, 12)
  private val cutsGen = Gen.listOf(Gen.choose(0, 2000))

  test("superset + error bound + size bound hold under any merge tree") {
    check(Prop.forAll(streamGen, kGen, cutsGen, Gen.long) { (xs, k, cuts, seed) =>
      val agg = new MisraGriesAgg(k)
      val sketch = runTree(agg, xs, cuts, seed)
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = xs.length.toLong
      // size bound
      assert(sketch.size <= k - 1, s"buffer ${sketch.size} > k-1=${k - 1}")
      // superset: every true heavy hitter survives
      truth.foreach { case (item, c) =>
        if (c * k > n)
          assert(sketch.contains(item),
            s"heavy item $item (count $c > n/k=${n / k}) missing from sketch")
      }
      // weights: never overestimate; underestimate by at most n/k
      sketch.foreach { case (item, w) =>
        val c = truth.getOrElse(item, 0L)
        assert(w <= c, s"item $item weight $w overestimates true $c")
        assert(c - w <= n / k, s"item $item error ${c - w} > n/k=${n / k}")
      }
      true
    })
  }

  test("merge is commutative; regrouping preserves the guarantees") {
    // exact equality holds for commuting a single merge (summation is
    // commutative, truncation identical); ASSOCIATION can change the
    // sketch contents — only the bounds are invariant, which is what
    // the randomized-tree property above pins. Here: concrete sanity.
    val xs1 = Seq(1L, 1L, 2L, 3L, 1L, 4L)
    val xs2 = Seq(2L, 2L, 5L, 1L, 6L, 7L)
    val xs3 = Seq(8L, 1L, 2L, 9L, 1L, 10L)
    val agg = new MisraGriesAgg(5)
    val Seq(p1, p2, p3) =
      Seq(xs1, xs2, xs3).map(_.foldLeft(agg.zero)(agg.reduce))
    assert(agg.merge(p1, p2) == agg.merge(p2, p1))
    val all = xs1 ++ xs2 ++ xs3
    val truth = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (sk <- Seq(agg.merge(agg.merge(p1, p2), p3),
                   agg.merge(p1, agg.merge(p2, p3)))) {
      assert(sk.size <= 4)
      truth.foreach { case (item, c) =>
        if (c * 5 > all.length) assert(sk.contains(item)) }
      sk.foreach { case (item, w) =>
        val c = truth.getOrElse(item, 0L)
        assert(w <= c && c - w <= all.length / 5) }
    }
  }

  test("finish orders by weight desc then item asc") {
    val agg = new MisraGriesAgg(10)
    val out = agg.finish(Map(5L -> 3L, 2L -> 7L, 9L -> 3L, 1L -> 1L))
    assert(out.map(_.item) == Seq(2L, 5L, 9L, 1L))
  }
}
