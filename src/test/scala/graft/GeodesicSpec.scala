package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.Geodesic

class GeodesicSpec extends AnyFunSuite {

  test("inverse distance: equator 1 degree of longitude on GRS80") {
    // 1° of longitude at the equator on GRS80 ≈ 111319.49 m (a * π/180)
    val d = Geodesic.distance(0, 0, 1, 0)
    assert(math.abs(d - 111319.49) < 0.01)
  }

  test("inverse distance: meridian arc 0→1° lat") {
    // GRS80 meridian arc length for 1° at the equator ≈ 110574.39 m
    val d = Geodesic.distance(0, 0, 0, 1)
    assert(math.abs(d - 110574.39) < 0.01)
  }

  test("azimuth convention matches pyproj: east = 90, north = 0, west = -90") {
    assert(math.abs(Geodesic.azimuth(0, 10, 0.1, 10) - 90.0) < 0.1)
    assert(math.abs(Geodesic.azimuth(0, 10, 0, 10.1)) < 1e-9)
    assert(math.abs(Geodesic.azimuth(0, 10, -0.1, 10) + 90.0) < 0.1)
    // southbound: ±180
    assert(math.abs(math.abs(Geodesic.azimuth(0, 10, 0, 9.9)) - 180.0) < 1e-9)
  }

  test("coincident points → zero") {
    val inv = Geodesic.inverse(-103.2, 31.3, -103.2, 31.3)
    assert(inv.distanceM == 0.0)
  }

  test("short-range symmetry: d(a,b) == d(b,a) to sub-mm") {
    val d1 = Geodesic.distance(-103.2237, 31.3142, -103.2231, 31.3149)
    val d2 = Geodesic.distance(-103.2231, 31.3149, -103.2237, 31.3142)
    assert(math.abs(d1 - d2) < 1e-6)
  }

  test("bearing diff: wraparound, no antiparallel folding (SURVEY Q3)") {
    assert(Geodesic.bearingDiff(10, 350) == 20.0)
    assert(Geodesic.bearingDiff(-170, 170) == 20.0)
    assert(Geodesic.bearingDiff(0, 180) == 180.0) // antiparallel NOT folded
    assert(Geodesic.bearingDiff(45, 45) == 0.0)
  }

  test("polyline length uses abs of each leg") {
    val coords = Array((0.0, 0.0), (0.001, 0.0), (0.0, 0.0)) // out and back
    val len = Geodesic.polylineLength(coords)
    val oneLeg = Geodesic.distance(0, 0, 0.001, 0)
    assert(math.abs(len - 2 * oneLeg) < 1e-9)
  }
}
