package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.KmvAgg

/** Pure-function oracle for the KMV sketch buffer ops (the driver
  * gate cross-checks the full query against DuckDB at sf0.01). */
class KmvAggSpec extends AnyFunSuite {

  private val M = 1000000007L
  private val agg = new KmvAgg(4, M)

  test("reduce keeps the k smallest distinct, sorted") {
    var b = agg.zero
    Seq(50L, 10L, 50L, 30L, 40L, 20L, 60L, 5L).foreach(h => b = agg.reduce(b, h))
    assert(b.toSeq == Seq(5L, 10L, 20L, 30L))
  }

  test("merge dedups across partials and caps at k") {
    val x = Array(1L, 3L, 5L, 7L)
    val y = Array(2L, 3L, 4L, 7L)
    assert(agg.merge(x, y).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(agg.merge(Array.emptyLongArray, y).toSeq == y.toSeq)
    // short partials with overlap below k
    assert(agg.merge(Array(9L), Array(9L)).toSeq == Seq(9L))
  }

  test("merge order-insensitivity (associativity witness)") {
    val parts = Seq(Array(10L, 40L), Array(20L, 40L), Array(5L, 99L))
    val left = parts.reduceLeft(agg.merge)
    val right = parts.reverse.reduceLeft(agg.merge)
    assert(left.toSeq == right.toSeq)
  }

  test("finish: exact below k, estimator at k, sentinel when empty") {
    assert(agg.finish(Array(3L, 9L)) ==
      graft.functions.KmvOut(2L, 9L, 2.0, Seq(3L, 9L)))
    val full = Array(1L, 2L, 3L, 100L)
    val out = agg.finish(full)
    assert(out.n_kept == 4L && out.kth_h == 100L)
    assert(math.abs(out.est_distinct - 3.0 * M / 100.0) < 1e-9)
    assert(out.ks == Seq(1L, 2L, 3L, 100L))
    assert(agg.finish(Array.emptyLongArray) ==
      graft.functions.KmvOut(0L, -1L, 0.0, Seq.empty))
  }

  test("estimator accuracy on uniform hashes (k=64, n=10000)") {
    val big = new KmvAgg(64, M)
    val rnd = new scala.util.Random(7)
    var b = big.zero
    val n = 10000
    (1 to n).foreach(_ => b = big.reduce(b, rnd.nextLong(M)))
    val est = big.finish(b).est_distinct
    assert(math.abs(est - n) / n < 0.3) // KMV stderr ≈ 1/sqrt(k-1) ≈ 0.126
  }
}
