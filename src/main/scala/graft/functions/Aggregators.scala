package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2.3 "UDF / UDAF / UDTF"): a geodesic
  * polyline accumulator as a Spark `Aggregator[IN, BUF, OUT]`,
  * registered via `functions.udaf` — the engine's pattern for
  * order-insensitive custom aggregation (partial merge on executors,
  * unlike collect_list-based shapes which centralize the group).
  *
  * Aggregates (lon, lat) points of a group into bbox + centroid +
  * count. Point order does not matter, so partial buffers merge
  * associatively — the property that makes a UDAF scale.
  */
object BboxCentroidAgg extends Aggregator[(Double, Double), BboxBuf, BboxOut] {
  override def zero: BboxBuf =
    BboxBuf(Double.MaxValue, Double.MinValue, Double.MaxValue, Double.MinValue, 0.0, 0.0, 0L)

  override def reduce(b: BboxBuf, p: (Double, Double)): BboxBuf = BboxBuf(
    math.min(b.minLon, p._1), math.max(b.maxLon, p._1),
    math.min(b.minLat, p._2), math.max(b.maxLat, p._2),
    b.sumLon + p._1, b.sumLat + p._2, b.n + 1)

  override def merge(a: BboxBuf, b: BboxBuf): BboxBuf = BboxBuf(
    math.min(a.minLon, b.minLon), math.max(a.maxLon, b.maxLon),
    math.min(a.minLat, b.minLat), math.max(a.maxLat, b.maxLat),
    a.sumLon + b.sumLon, a.sumLat + b.sumLat, a.n + b.n)

  override def finish(b: BboxBuf): BboxOut =
    BboxOut(b.minLon, b.maxLon, b.minLat, b.maxLat,
      if (b.n == 0) 0.0 else b.sumLon / b.n,
      if (b.n == 0) 0.0 else b.sumLat / b.n, b.n)

  override def bufferEncoder: Encoder[BboxBuf] = Encoders.product[BboxBuf]
  override def outputEncoder: Encoder[BboxOut] = Encoders.product[BboxOut]
}

/** Per-group top-k by (sim DESC, n_id ASC) as a typed Aggregator — the
  * scale shape for distributed top-k-per-key: partial buffers of size
  * ≤ k merge map-side (ObjectHashAggregate partial → partial_merge),
  * so a query's candidate rows never centralize anywhere; only
  * k·partitions rows per group cross the shuffle. Replaces the
  * row_number-window formulation, which shuffles and sorts EVERY
  * candidate row of a group onto one task. */
final case class SimEntry(n_id: Long, sim: Double)

class TopKSimAgg(k: Int) extends Aggregator[SimEntry, Seq[SimEntry], Seq[SimEntry]] {
  // TOTAL order: sim DESC via java.lang.Double.compare (NaN compares
  // greater than everything, so zero-norm NaN sims rank first in DESC —
  // matching DuckDB's ORDER BY sim DESC and keeping the sort contract
  // total; raw > on doubles is not a valid ordering once NaN appears),
  // n_id ASC tie-break (unique per group).
  private def better(a: SimEntry, b: SimEntry): Boolean = {
    val c = java.lang.Double.compare(a.sim, b.sim)
    c > 0 || (c == 0 && a.n_id < b.n_id)
  }

  override def zero: Seq[SimEntry] = Vector.empty

  override def reduce(b: Seq[SimEntry], e: SimEntry): Seq[SimEntry] =
    if (b.length >= k && better(b.last, e)) b
    else (b :+ e).sortWith(better).take(k)

  override def merge(x: Seq[SimEntry], y: Seq[SimEntry]): Seq[SimEntry] =
    (x ++ y).sortWith(better).take(k)

  override def finish(r: Seq[SimEntry]): Seq[SimEntry] = r

  override def bufferEncoder: Encoder[Seq[SimEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[SimEntry]]()
  override def outputEncoder: Encoder[Seq[SimEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[SimEntry]]()
}

/** Per-group top-k by (score_u DESC, doc_id ASC) with a payload — the
  * [[TopKSimAgg]] contract for EXACT-INTEGER scores (a double-scored
  * agg would lose precision above 2⁵³; BM25 integer scores reach
  * ~10¹⁷). Used by the BM25 serve so a stop-word query's corpus-sized
  * candidate set never sorts in one window partition: partials of
  * size ≤ k merge map-side, only k·partitions rows per query cross
  * the shuffle. */
final case class ScoreEntry(doc_id: Long, dl: Long, n_hit_terms: Long,
    score_u: Long)

class TopKScoreAgg(k: Int)
    extends Aggregator[ScoreEntry, Seq[ScoreEntry], Seq[ScoreEntry]] {
  private def better(a: ScoreEntry, b: ScoreEntry): Boolean =
    a.score_u > b.score_u || (a.score_u == b.score_u && a.doc_id < b.doc_id)

  override def zero: Seq[ScoreEntry] = Vector.empty

  override def reduce(b: Seq[ScoreEntry], e: ScoreEntry): Seq[ScoreEntry] =
    if (b.length >= k && better(b.last, e)) b
    else (b :+ e).sortWith(better).take(k)

  override def merge(x: Seq[ScoreEntry], y: Seq[ScoreEntry]): Seq[ScoreEntry] =
    (x ++ y).sortWith(better).take(k)

  override def finish(r: Seq[ScoreEntry]): Seq[ScoreEntry] = r

  override def bufferEncoder: Encoder[Seq[ScoreEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoreEntry]]()
  override def outputEncoder: Encoder[Seq[ScoreEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoreEntry]]()
}

/** KMV (k-minimum-values) distinct-count sketch as a typed Aggregator.
  *
  * Buffer = the k smallest DISTINCT hash values seen, kept sorted —
  * bounded at k longs per partial, deduped locally in `reduce`, merged
  * associatively in `merge`, so the sketch needs no pre-`distinct()`
  * shuffle and partials combine map-side like any sum. Estimator:
  * with hashes uniform on [0, M), E[distinct] ≈ (k-1)·M / h_(k); for
  * groups with fewer than k distinct hashes the sketch IS the exact
  * distinct set. Everything is integer/order-free arithmetic, so the
  * result is deterministic and reproducible across engines — unlike
  * HLL sketches whose registers are implementation-defined.
  */
class KmvAgg(k: Int, hashMod: Long) extends Aggregator[Long, Array[Long], KmvOut] {
  override def zero: Array[Long] = Array.emptyLongArray

  /** Sorted-array k-min set: binarySearch per row (O(log k), the hot
    * path — most rows are rejected as duplicates or > kth), arraycopy
    * insert only for the ~k·ln(n) rows that actually enter the set. */
  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    val i = java.util.Arrays.binarySearch(b, h)
    if (i >= 0) b // already present
    else {
      val ins = -i - 1
      if (ins >= k) b // larger than the kth smallest — can't enter
      else {
        val n = math.min(b.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    // two-pointer merge of sorted distinct arrays, capped at k
    val out = new Array[Long](math.min(x.length + y.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < x.length || j < y.length)) {
      val v =
        if (j >= y.length || (i < x.length && x(i) <= y(j))) { val v = x(i); i += 1; v }
        else { val v = y(j); j += 1; v }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(b: Array[Long]): KmvOut = {
    val est =
      if (b.length >= k) (k - 1).toDouble * hashMod.toDouble / b.last.toDouble
      else b.length.toDouble
    KmvOut(b.length.toLong, if (b.isEmpty) -1L else b.last, est, b.toSeq)
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[KmvOut] = Encoders.product[KmvOut]
}

/** `ks` is the k-min set itself (sorted ascending) — the part that
  * makes KMV a THETA sketch: set algebra (union / intersection /
  * Jaccard, `agg_kmv_ops`) operates on the kept hashes below the
  * threshold, not on the scalar estimate. */
final case class KmvOut(n_kept: Long, kth_h: Long, est_distinct: Double,
    ks: Seq[Long])

/** Misra–Gries / space-saving heavy-hitters sketch as a typed
  * Aggregator — the classic mergeable frequent-items primitive for
  * corpus token/domain monitoring (the one mergeable-sketch family
  * member KMV's distinct-count and TopKSimAgg's exact top-k don't
  * cover).
  *
  * Buffer = at most k-1 (item, weight) counters. `reduce` is textbook
  * MG: increment a tracked item, adopt an untracked one while there is
  * room, otherwise decrement ALL counters by one (dropping zeros) —
  * each decrement destroys k units of total weight, so an item with
  * true count > n/k can never be fully cancelled. `merge` is the
  * Agarwal et al. ("Mergeable Summaries", PODS'12) combine: add
  * counts, then subtract the k-th largest weight from every counter
  * and drop the non-positive ones — back to ≤ k-1 counters with the
  * same additive-error bound, fully associative AND commutative, so
  * partials combine map-side in any order Spark chooses.
  *
  * Guarantees (MisraGriesSpec property-checks both under randomized
  * merge trees): the sketch contains EVERY item with true count
  * > n/k, and each kept weight underestimates its true count by at
  * most n/k. The sketch alone therefore yields a candidate SUPERSET;
  * [[graft.queries.Extras]] `agg_heavy_hitters` re-filters it by an
  * exact count join (≤ k-1 broadcast keys) for a deterministic,
  * oracle-able result no matter how merges interleaved.
  */
final case class MgEntry(item: Long, w: Long)

class MisraGriesAgg(k: Int)
    extends Aggregator[Long, Map[Long, Long], Seq[MgEntry]] {
  require(k >= 2, "Misra-Gries needs k >= 2")

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(b: Map[Long, Long], x: Long): Map[Long, Long] =
    b.get(x) match {
      case Some(w) => b.updated(x, w + 1L)
      case None if b.size < k - 1 => b.updated(x, 1L)
      case None =>
        b.flatMap { case (i, w) =>
          if (w > 1L) Some(i -> (w - 1L)) else None
        }
    }

  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val sum = b.foldLeft(a) { case (m, (i, w)) =>
      m.updated(i, m.getOrElse(i, 0L) + w)
    }
    if (sum.size <= k - 1) sum
    else {
      val kth = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k - 1)
      sum.flatMap { case (i, w) =>
        if (w > kth) Some(i -> (w - kth)) else None
      }
    }
  }

  override def finish(b: Map[Long, Long]): Seq[MgEntry] =
    b.toSeq.map { case (i, w) => MgEntry(i, w) }
      .sortBy(e => (-e.w, e.item))

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
  override def outputEncoder: Encoder[Seq[MgEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[MgEntry]]()
}

/** q-digest quantile sketch (Shrivastava et al., SenSys'04) as a typed
  * Aggregator — the mergeable-summaries family member for QUANTILES,
  * next to KMV (distinct count) and Misra–Gries (heavy hitters). The
  * sketch is a partial dyadic tree over the integer universe
  * [0, 2^logU): conceptually node-id → count (physically an append-log
  * array, see the layout note below), values enter at their leaf, and
  * compression moves weight UP the tree (child + sibling + parent
  * ≤ ⌊n/k⌋ ⇒ fold into parent), so a buffer never exceeds the size
  * cap and partials merge by pointwise count addition — map-side
  * combinable in any order Spark picks, like any sum.
  *
  * Deterministic worst-case guarantee, independent of merge order:
  * the value reported for quantile q has true rank r with
  * ⌈q·n⌉ ≤ r_le and r_lt ≤ q·n + logU·n/k — weight only ever moves to
  * ANCESTORS of its leaf, a value's count is smeared over at most
  * logU nodes, and every compressed node holds ≤ ⌊n/k⌋. The rank walk
  * (nodes by ascending range-hi, ties smaller-range-first) then
  * over/under-shoots by at most the ancestor weight. QDigestSpec
  * property-checks both bounds under randomized merge trees; the
  * driver query asserts them in-query as 0/1 verdict columns the
  * DuckDB oracle requires to be literal 1 (the agg_sketch self-oracle
  * pattern — estimator drift = hash FAIL).
  *
  * At 100 TB: ≤ sizeCap (= 4k) longs per partial, one narrow shuffle
  * of O(groups · k) rows total — quantiles without a global sort.
  */
class QDigestAgg(logU: Int, k: Int)
    extends Aggregator[Long, Array[Long], QdOut] {
  require(logU >= 1 && logU <= 40 && k >= 8)
  private val leafBase = 1L << logU
  private val sizeCap = 4 * k
  // Buffer layout — an APPEND LOG, not a map: slot 0 = pair count,
  // pairs (node-id, count) at (1+2i, 2+2i), possibly with DUPLICATE
  // ids. reduce is two array writes (no per-row allocation — the
  // immutable-Map rendering of this buffer spent ~5 s/600 k rows in
  // HAMT garbage); when the log fills it is consolidated in place
  // (duplicates merged, q-digest compression applied), which frees
  // ≥ half the slots, so the amortized per-row cost stays O(1).
  private val startLen = 1 + 2 * 1024
  private val maxLen = 1 + 2 * 8192

  override def zero: Array[Long] = new Array[Long](startLen)

  override def reduce(b: Array[Long], v: Long): Array[Long] = {
    // clamp into the universe: the sketch promises rank bounds, and a
    // clamped outlier only ever lands in the extreme leaf
    val x = math.min(math.max(v, 0L), leafBase - 1)
    append(b, leafBase + x, 1L)
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var a = x
    val used = y(0).toInt
    var i = 0
    while (i < used) { a = append(a, y(1 + 2 * i), y(2 + 2 * i)); i += 1 }
    a
  }

  private def append(b: Array[Long], id: Long, c: Long): Array[Long] = {
    var a = b
    var u = a(0).toInt
    if (1 + 2 * (u + 1) > a.length) {
      if (a.length < maxLen)
        a = java.util.Arrays.copyOf(a, math.min(maxLen, (a.length - 1) * 2 + 1))
      else {
        consolidate(a)
        u = a(0).toInt
        // compress bounds the digest well under the log capacity; if a
        // pathological parameterization ever defeated that, grow past
        // maxLen rather than drop data
        if (1 + 2 * (u + 1) > a.length)
          a = java.util.Arrays.copyOf(a, (a.length - 1) * 2 + 1)
      }
    }
    a(1 + 2 * u) = id
    a(2 + 2 * u) = c
    a(0) = u + 1
    a
  }

  /** Merge duplicate log entries and q-digest-compress, writing the
    * result back into the log's prefix. */
  private def consolidate(a: Array[Long]): Unit = {
    val m = scala.collection.mutable.LongMap.empty[Long]
    val used = a(0).toInt
    var i = 0
    while (i < used) {
      val id = a(1 + 2 * i)
      val c = a(2 + 2 * i)
      if (c != 0) m(id) = m.getOrElse(id, 0L) + c
      i += 1
    }
    if (m.size > sizeCap) compressL(m)
    var w = 0
    m.foreachEntry { (id, c) => a(1 + 2 * w) = id; a(2 + 2 * w) = c; w += 1 }
    a(0) = w
  }

  /** The consolidated digest of a buffer — the spec's window into the
    * structural invariant (internal nodes ≤ ⌊n/k⌋). */
  private[graft] def digest(b: Array[Long]): Map[Long, Long] = {
    val copy = java.util.Arrays.copyOf(b, b.length)
    consolidate(copy)
    val used = copy(0).toInt
    (0 until used).map(i => copy(1 + 2 * i) -> copy(2 + 2 * i)).toMap
  }

  private def depthOf(id: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(id)

  /** Immutable-map compression entry point (spec use). */
  private[graft] def compress(m: Map[Long, Long]): Map[Long, Long] = {
    val buf = scala.collection.mutable.LongMap.empty[Long]
    m.foreach { case (id, c) => buf(id) = c }
    compressL(buf)
    buf.toMap
  }

  /** Bottom-up fold: children whose (self + sibling + parent) weight
    * fits in τ = ⌊n/k⌋ collapse into the parent. Per-level WORKLISTS,
    * not per-level key scans — a full-map filter per level made each
    * consolidation O(size · logU) with allocation churn (measured ~4 s
    * of a 600 k-row aggregation); worklists visit each id O(1) times
    * total. Mutates `buf`. */
  private def compressL(buf: scala.collection.mutable.LongMap[Long]): Unit = {
    var n = 0L
    buf.foreachValue(n += _)
    val tau = n / k
    if (tau == 0) return
    val levels = Array.fill(logU + 1)(
      new scala.collection.mutable.ArrayBuffer[Long](16))
    buf.foreachKey { id =>
      val d = depthOf(id); if (d >= 1) levels(d) += id
    }
    var depth = logU
    while (depth >= 1) {
      val lv = levels(depth)
      var i = 0
      while (i < lv.length) {
        val left = lv(i) & ~1L
        val sib = left | 1L
        // both-siblings-listed duplicates skip here: already folded
        if (buf.contains(left) || buf.contains(sib)) {
          val par = left >> 1
          val self = buf.getOrElse(left, 0L) + buf.getOrElse(sib, 0L)
          if (self > 0 && self + buf.getOrElse(par, 0L) <= tau) {
            val parNew = !buf.contains(par)
            buf -= left; buf -= sib
            buf(par) = buf.getOrElse(par, 0L) + self
            // a parent minted by this fold must itself be visited at
            // its level; pre-existing parents are already listed
            if (parNew && depth > 1) levels(depth - 1) += par
          }
        }
        i += 1
      }
      depth -= 1
    }
  }

  /** Rank walk: nodes ordered by ascending hi (ties: narrower range
    * first), cumulate until ⌈q·n⌉ — report that node's hi. */
  private def quantile(sorted: Array[(Long, Long, Long)], n: Long,
      qNum: Long, qDen: Long): Long = {
    val target = (qNum * n + qDen - 1) / qDen
    var cum = 0L; var i = 0; var ans = leafBase - 1
    var done = false
    while (!done && i < sorted.length) {
      cum += sorted(i)._3
      if (cum >= target) { ans = math.min(sorted(i)._2, leafBase - 1); done = true }
      i += 1
    }
    ans
  }

  override def finish(b: Array[Long]): QdOut = {
    val dg = digest(b)
    val n = dg.valuesIterator.sum
    if (n == 0) return QdOut(0L, 0L, 0L, 0L, 0L)
    val sorted = dg.toArray.map { case (id, c) =>
      val d = depthOf(id)
      val width = 1L << (logU - d)
      val lo = (id - (1L << d)) * width
      (lo, lo + width - 1, c)
    }.sortBy { case (lo, hi, _) => (hi, -lo) }
    QdOut(n,
      quantile(sorted, n, 1, 2),
      quantile(sorted, n, 9, 10),
      quantile(sorted, n, 99, 100),
      dg.size.toLong)
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[QdOut] = Encoders.product[QdOut]
}

/** nodes (buffer size) is merge-order-dependent — NEVER emit it in an
  * oracle-checked query; the driver query outputs only verdicts. */
final case class QdOut(n: Long, p50: Long, p90: Long, p99: Long, nodes: Long)

/** Distributed Bloom-filter build as a typed Aggregator — the engine's
  * hand-rolled rendering of Spark's own runtime-filter shape
  * (InjectRuntimeFilter's bloom_filter_agg + might_contain): build a
  * compact bit-set over the SELECTIVE side's join keys, broadcast it
  * (bits/8 bytes, vs. a broadcast hash table's per-key overhead), and
  * drop non-joining fact rows BEFORE the join's shuffle. False
  * positives only cost wasted shuffle rows — the exact join still runs
  * after the prefilter — so the query result is bit-identical to the
  * plain join and fully oracle-able by it.
  *
  * Input is a pre-hashed (h1, h2) pair (columns, so build and probe
  * sides share one definition); bit i of the classic double-hash
  * scheme is (h1 + i·h2) mod bits. reduce mutates the buffer in place
  * (the group owns it); merge ORs word-wise — commutative and
  * idempotent, so partials combine map-side in any order and
  * duplicate keys are free.
  *
  * At 100 TB: the aggregation is one narrow pass over the dim side
  * producing a single bits/64-long array row; every executor probes
  * the broadcast copy with pure codegen'd bit arithmetic (no UDF in
  * the per-row path — see Coverage.join_bloom_prefilter's predicate).
  */
class BloomAgg(bits: Long, j: Int)
    extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
  require(bits % 64 == 0 && bits > 0 && j >= 1)
  private val words = (bits / 64).toInt

  override def zero: Array[Long] = new Array[Long](words)

  override def reduce(b: Array[Long], h: (Long, Long)): Array[Long] = {
    var i = 0
    while (i < j) {
      val pos = java.lang.Math.floorMod(h._1 + i.toLong * h._2, bits)
      b((pos >>> 6).toInt) |= (1L << (pos & 63))
      i += 1
    }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { x(i) |= y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

final case class BboxBuf(
    minLon: Double, maxLon: Double, minLat: Double, maxLat: Double,
    sumLon: Double, sumLat: Double, n: Long)

final case class BboxOut(
    min_x: Double, max_x: Double, min_y: Double, max_y: Double,
    centroid_x: Double, centroid_y: Double, n_points: Long)

/** One attribution match: train doc, exact shingle intersection, and
  * integer-ppm Jaccard (the ranking key — exact, so tie-breaks are
  * decidable cross-engine). */
final case class JaccEntry(t_id: Long, n_inter: Long, jacc_ppm: Long)

/** Streaming-legal top-k DISTINCT-by-id — [[TopKSimAgg]]'s partial
  * top-k contract plus id dedup, for inputs where the same (query,
  * candidate) pair arrives once per colliding LSH band: duplicates of
  * a pair carry IDENTICAL scores (the score is a pure function of the
  * pair), so dropping a seen id is always safe and the capped partial
  * buffers stay correct and associative. Order (jacc_ppm DESC, t_id
  * ASC); ≤ k entries of state per group, map-side combine. */
class TopKJaccDistinctAgg(k: Int)
    extends Aggregator[JaccEntry, Seq[JaccEntry], Seq[JaccEntry]] {
  private def better(a: JaccEntry, b: JaccEntry): Boolean =
    a.jacc_ppm > b.jacc_ppm || (a.jacc_ppm == b.jacc_ppm && a.t_id < b.t_id)

  override def zero: Seq[JaccEntry] = Vector.empty

  override def reduce(b: Seq[JaccEntry], e: JaccEntry): Seq[JaccEntry] =
    if (b.exists(_.t_id == e.t_id)) b
    else (b :+ e).sortWith(better).take(k)

  override def merge(x: Seq[JaccEntry], y: Seq[JaccEntry]): Seq[JaccEntry] =
    (x ++ y.filterNot(e => x.exists(_.t_id == e.t_id)))
      .sortWith(better).take(k)

  override def finish(r: Seq[JaccEntry]): Seq[JaccEntry] = r

  override def bufferEncoder: Encoder[Seq[JaccEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[JaccEntry]]()
  override def outputEncoder: Encoder[Seq[JaccEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[JaccEntry]]()
}
