package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{CorridorGeometry, LonLat}

/** Unit oracle for the corridor kernel (SURVEY §2 O13): expected values
  * were produced by a step-for-step pure-Python replication of the
  * reference algorithm (/root/reference/src/pipeline_calculator_v3.py:
  * 476-712) on the same synthetic sections (straight corridor,
  * right-angle turn, degenerate single pair) — the same replication
  * methodology BASELINE.md uses for the headline numbers.
  */
class CorridorGeometrySpec extends AnyFunSuite {

  private val lat0 = 31.3
  private val lon0 = -103.5
  private val mdy = 111320.0
  private val mdx = 111320.0 * math.cos(math.toRadians(31.3))

  private def assertPoly(actual: Seq[LonLat], expected: Seq[(Double, Double)]): Unit = {
    assert(actual.length == expected.length,
      s"ring length ${actual.length} != ${expected.length}")
    actual.zip(expected).zipWithIndex.foreach { case ((a, (elon, elat)), i) =>
      assert(math.abs(a.lon - elon) < 1e-9, s"vertex $i lon ${a.lon} != $elon")
      assert(math.abs(a.lat - elat) < 1e-9, s"vertex $i lat ${a.lat} != $elat")
    }
  }

  test("straight N-S section: rectangle + offset strip with reference's bevel duplicates") {
    val pairs = (0 until 10).map { i =>
      val lat = lat0 + (i * 5.0) / mdy
      (LonLat(lon0, lat), LonLat(lon0 + 10.0 / mdx, lat))
    }
    val all = pairs.flatMap(p => Seq(p._1, p._2))
    val cLon = (all.map(_.lon).min - 0.001 + all.map(_.lon).max + 0.001) / 2
    val cLat = (all.map(_.lat).min - 0.001 + all.map(_.lat).max + 0.001) / 2
    val c = CorridorGeometry.compute(pairs, cLon, cLat, 5.0, 15.0)

    assert(math.abs(c.orientedWidthM - 19.999978551657364) < 1e-9)
    assert(!c.usedFallback)
    assertPoly(c.orientedPolygon, Seq(
      (-103.49984230162082, 31.29995508444125),
      (-103.49984230162082, 31.300449155587497),
      (-103.50005256620156, 31.300449155587497),
      (-103.50005256620156, 31.29995508444125),
      (-103.49984230162082, 31.29995508444125)))
    // 21 ring points incl. the duplicated bevel points the reference
    // emits on straight runs (Lp == Lc) and the dropped start cap
    assert(c.corridorPolygon.length == 21)
    assertPoly(c.corridorPolygon.take(3), Seq(
      (-103.50005256620156, 31.30004491555875),
      (-103.50005256620156, 31.3000898311175),
      (-103.50005256620156, 31.30013474667625)))
    assertPoly(c.corridorPolygon.takeRight(2), Seq(
      (-103.49984230162082, 31.30004491555875),
      (-103.50005256620156, 31.30004491555875)))
  }

  test("right-angle turn: miter join inside the limit, no fallback") {
    val pairsA = (0 until 6).map { i =>
      val lat = lat0 + (i * 5.0) / mdy
      (LonLat(lon0, lat), LonLat(lon0 + 8.0 / mdx, lat))
    }
    val blat = lat0 + (5 * 5.0) / mdy
    val pairsB = (1 until 6).map { j =>
      val lon = lon0 + (j * 5.0) / mdx
      (LonLat(lon, blat), LonLat(lon, blat + 8.0 / mdy))
    }
    val pairs = pairsA ++ pairsB
    val all = pairs.flatMap(p => Seq(p._1, p._2))
    val cLon = (all.map(_.lon).min - 0.001 + all.map(_.lon).max + 0.001) / 2
    val cLat = (all.map(_.lat).min - 0.001 + all.map(_.lat).max + 0.001) / 2
    val c = CorridorGeometry.compute(pairs, cLon, cLat, 5.0, 15.0)

    assert(math.abs(c.orientedWidthM - 18.00000000009433) < 1e-9)
    assert(!c.usedFallback)
    assert(c.corridorPolygon.length == 19)
    // the corner's left-boundary vertex after the turn (replication value)
    assertPoly(Seq(c.corridorPolygon(4)), Seq((-103.49989486782238, 31.300341358246495)))
    assertPoly(c.corridorPolygon.take(2), Seq(
      (-103.50005256623764, 31.30004491555875),
      (-103.50005256623764, 31.3000898311175)))
  }

  test("single pair: degenerate centerline falls back to the oriented rectangle") {
    val pairs = Seq((LonLat(lon0, lat0), LonLat(lon0 + 12.0 / mdx, lat0)))
    val cLon = lon0 + 6.0 / mdx
    val c = CorridorGeometry.compute(pairs, cLon, lat0, 5.0, 15.0)

    assert(c.usedFallback)
    assert(math.abs(c.orientedWidthM - 21.999999999731678) < 1e-9)
    assert(c.corridorPolygon == c.orientedPolygon)
    assertPoly(c.orientedPolygon, Seq(
      (-103.49998948678224, 31.299901185770754),
      (-103.49988435460462, 31.299901185770754),
      (-103.49988435460462, 31.300098814229248),
      (-103.49998948678224, 31.300098814229248),
      (-103.49998948678224, 31.299901185770754)))
  }

  test("width clamps: floor at segment length, ceiling at 2x detection range") {
    // coincident midpoints: sep 0 -> width = max(10, segLen)
    val tight = Seq((LonLat(lon0, lat0), LonLat(lon0, lat0)),
      (LonLat(lon0, lat0 + 20.0 / mdy), LonLat(lon0, lat0 + 20.0 / mdy)))
    val cT = CorridorGeometry.compute(tight, lon0, lat0, 5.0, 15.0)
    assert(math.abs(cT.orientedWidthM - 10.0) < 1e-9)

    // far-apart midpoints: clamped to 2 * detectionRange
    val wide = Seq(
      (LonLat(lon0, lat0), LonLat(lon0 + 40.0 / mdx, lat0)),
      (LonLat(lon0, lat0 + 20.0 / mdy), LonLat(lon0 + 40.0 / mdx, lat0 + 20.0 / mdy)))
    val cW = CorridorGeometry.compute(wide, lon0, lat0, 5.0, 15.0)
    assert(math.abs(cW.orientedWidthM - 30.0) < 1e-9)
  }
}
