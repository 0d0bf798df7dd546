package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{QDigestAgg, QdOut}

/** Property oracle for the q-digest quantile sketch. The Aggregator is
  * exercised as plain Scala (zero/reduce/merge/finish need no Spark):
  * random data, random chunkings, random MERGE TREES — the bound must
  * hold for every interleaving Spark could choose, plus the structural
  * invariant the bound's proof rests on (internal nodes ≤ ⌊n/k⌋,
  * preserved by floor-superadditivity under pointwise merge).
  */
class QDigestSpec extends AnyFunSuite {

  private def build(agg: QDigestAgg, data: Seq[Long],
      rng: scala.util.Random): Array[Long] = {
    val nChunks = 1 + rng.nextInt(8)
    val chunks = data.grouped(math.max(1, data.size / nChunks)).toSeq
    var parts = chunks.map(c => c.foldLeft(agg.zero)(agg.reduce))
    while (parts.size > 1) {
      val i = rng.nextInt(parts.size)
      val a = parts(i)
      val rest = parts.patch(i, Nil, 1)
      val j = rng.nextInt(rest.size)
      val merged = agg.merge(a, rest(j))
      parts = rest.patch(j, Nil, 1) :+ merged
    }
    parts.head
  }

  private def checkBounds(data: Seq[Long], out: QdOut, logU: Int,
      k: Int, ctx: String): Unit = {
    val n = data.size.toLong
    assert(out.n == n, ctx)
    for ((est, qn, qd) <- Seq((out.p50, 1L, 2L), (out.p90, 9L, 10L),
        (out.p99, 99L, 100L))) {
      val target = (qn * n + qd - 1) / qd
      val le = data.count(_ <= est).toLong
      val lt = data.count(_ < est).toLong
      assert(le >= target, s"$ctx q=$qn/$qd est=$est le=$le target=$target")
      assert(lt <= target - 1 + logU * (n / k),
        s"$ctx q=$qn/$qd est=$est lt=$lt target=$target slack=${logU * (n / k)}")
    }
  }

  test("n < k: sketch is exact (no compression possible)") {
    val agg = new QDigestAgg(16, 480)
    val data = (1L to 100L).map(_ * 13 % 101)
    val buf = data.foldLeft(agg.zero)(agg.reduce)
    val out = agg.finish(buf)
    val sorted = data.sorted
    assert(out.p50 == sorted((data.size + 1) / 2 - 1))
    assert(out.p99 == sorted(((99 * data.size + 99) / 100 - 1).toInt))
  }

  test("all-equal heavy value: every quantile is that value") {
    val agg = new QDigestAgg(12, 32)
    val data = Seq.fill(5000)(777L)
    val out = agg.finish(build(agg, data, new scala.util.Random(7)))
    assert(out.p50 == 777L && out.p90 == 777L && out.p99 == 777L)
  }

  test("rank bounds + internal-node invariant under randomized merge trees") {
    val logU = 12; val k = 32
    val agg = new QDigestAgg(logU, k)
    val U = 1L << logU
    for (seed <- 1 to 8) {
      val rng = new scala.util.Random(seed)
      val data: Seq[Long] = seed % 3 match {
        case 0 => Seq.fill(4000)(rng.nextLong(U)) // uniform
        case 1 => Seq.fill(4000)((U - 1) / (1 + rng.nextInt(64))) // zipf-ish
        case 2 => // clustered: two tight modes + tail
          Seq.fill(1800)(100L + rng.nextInt(8)) ++
            Seq.fill(1800)(3000L + rng.nextInt(8)) ++
            Seq.fill(400)(rng.nextLong(U))
      }
      val buf = build(agg, data, rng)
      val dg = agg.digest(buf)
      val n = dg.valuesIterator.sum
      // the proof's structural invariant: internal nodes <= floor(n/k)
      val bad = dg.filter { case (id, c) => id < U && c > n / k }
      assert(bad.isEmpty, s"seed=$seed internal nodes over tau: $bad")
      // sketch actually compresses (else the property is vacuous)
      val out = agg.finish(buf)
      assert(out.nodes <= 4L * k, s"seed=$seed size ${out.nodes}")
      checkBounds(data, out, logU, k, s"seed=$seed")
    }
  }

  test("clamping: out-of-universe values land in the extreme leaves") {
    val agg = new QDigestAgg(8, 32)
    val data = Seq(-50L, -1L, 0L, 10L, 255L, 300L, 99999L)
    val out = agg.finish(data.foldLeft(agg.zero)(agg.reduce))
    assert(out.p99 == 255L) // clamped to U-1
    assert(out.n == data.size.toLong)
  }
}
