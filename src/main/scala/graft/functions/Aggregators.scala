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
    KmvOut(b.length.toLong, if (b.isEmpty) -1L else b.last, est)
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[KmvOut] = Encoders.product[KmvOut]
}

final case class KmvOut(n_kept: Long, kth_h: Long, est_distinct: Double)

final case class BboxBuf(
    minLon: Double, maxLon: Double, minLat: Double, maxLat: Double,
    sumLon: Double, sumLat: Double, n: Long)

final case class BboxOut(
    min_x: Double, max_x: Double, min_y: Double, max_y: Double,
    centroid_x: Double, centroid_y: Double, n_points: Long)
