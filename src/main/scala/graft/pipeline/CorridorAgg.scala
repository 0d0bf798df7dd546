package graft.pipeline

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One section's pair row as seen by the corridor Aggregator: the
  * compat tie-break order key + raw midpoint coordinates + the section
  * center (constant within a group, carried on each row by the join). */
final case class CorridorPairIn(
    s1: Int, dx: Int, dy: Int, s2: Int,
    lon1: Double, lat1: Double, lon2: Double, lat2: Double,
    cLon: Double, cLat: Double)

/** Ordered-centerline entry kept in the buffer: order key + the pair's
  * MIDPOINT only — half the state of a full pair struct. */
final case class MidRec(s1: Int, dx: Int, dy: Int, s2: Int, lon: Double, lat: Double)

final case class CorridorBuf(
    hasCenter: Boolean, cLon: Double, cLat: Double,
    maxSep: Double, entries: Seq[MidRec])

final case class CorridorOut(
    oriented_polygon: Seq[LonLat],
    oriented_width_m: Double,
    corridor_polygon: Seq[LonLat],
    corridor_fallback: Boolean)

/** Corridor polygons (O13) as a typed `Aggregator` (SURVEY §7.3):
  * replaces the `sort_array(collect_list(struct(...)))` + UDF shape.
  *
  * Scale properties vs collect_list+UDF:
  *  - the buffer accumulates one (orderKey, midpoint) record per pair
  *    plus a RUNNING max separation — pair separations fold into a
  *    scalar at reduce time, so per-section state is ~half the raw
  *    pair structs and no giant array column ever materializes in a
  *    projected row;
  *  - partial buffers merge associatively on executors (map-side
  *    combine), so a giant section arrives at its reducer as a few
  *    pre-merged buffers rather than every raw pair row.
  * The finish step sorts the midpoints by the compat order key and runs
  * the pure [[CorridorGeometry.fromCenterline]] kernel — vertex-exact
  * with the previous formulation (midpoint and separation arithmetic is
  * bit-identical; see CorridorGeometrySpec / AnalyzerGoldenSpec).
  */
class CorridorAgg(segmentM: Double, detectionRangeM: Double, compat: Boolean)
    extends Aggregator[CorridorPairIn, CorridorBuf, CorridorOut] {

  override def zero: CorridorBuf = CorridorBuf(false, 0.0, 0.0, 0.0, Nil)

  override def reduce(b: CorridorBuf, r: CorridorPairIn): CorridorBuf = {
    val sep = CorridorGeometry.maxPairSeparation(
      LonLat(r.lon1, r.lat1), LonLat(r.lon2, r.lat2), r.cLon, r.cLat)
    CorridorBuf(
      hasCenter = true, cLon = r.cLon, cLat = r.cLat,
      maxSep = math.max(b.maxSep, sep),
      entries = MidRec(r.s1, r.dx, r.dy, r.s2,
        (r.lon1 + r.lon2) / 2.0, (r.lat1 + r.lat2) / 2.0) +: b.entries)
  }

  override def merge(a: CorridorBuf, b: CorridorBuf): CorridorBuf = {
    val (cl, cc) = if (a.hasCenter) (a.cLon, a.cLat) else (b.cLon, b.cLat)
    CorridorBuf(a.hasCenter || b.hasCenter, cl, cc,
      math.max(a.maxSep, b.maxSep), a.entries ++ b.entries)
  }

  override def finish(b: CorridorBuf): CorridorOut = {
    val ordered = b.entries.sortBy(e => (e.s1, e.dx, e.dy, e.s2))
    val centerline =
      if (ordered.nonEmpty) ordered.map(e => LonLat(e.lon, e.lat))
      else Seq(LonLat(b.cLon, b.cLat), LonLat(b.cLon, b.cLat))
    val c = CorridorGeometry.fromCenterline(centerline, b.maxSep,
      b.cLon, b.cLat, segmentM, detectionRangeM, compat)
    CorridorOut(c.orientedPolygon, c.orientedWidthM, c.corridorPolygon, c.usedFallback)
  }

  override def bufferEncoder: Encoder[CorridorBuf] = Encoders.product[CorridorBuf]
  override def outputEncoder: Encoder[CorridorOut] = Encoders.product[CorridorOut]
}
