package graft.geo

/**
 * Geodesic inverse problem on the GRS80 ellipsoid (Vincenty's formulae).
 *
 * The reference engine performs all length/bearing math with a GRS80
 * geodesic inverse (see /root/reference/src/pipeline_calculator_v3.py:48
 * `Geod(ellps='GRS80')` and :234 `geod.inv(...)`). pyproj uses Karney's
 * algorithm; Vincenty agrees to < 1 mm at pipeline-corridor scales
 * (verified against the replicated baseline numbers in BASELINE.md).
 *
 * Pure math, thread-safe, allocation-light — safe to call from Catalyst
 * expressions and codegen'd closures on executors.
 */
object Geodesic {
  /** GRS80 semi-major axis (m). */
  val A: Double = 6378137.0
  /** GRS80 flattening. */
  val F: Double = 1.0 / 298.257222101
  /** GRS80 semi-minor axis (m). */
  val B: Double = A * (1.0 - F)

  /** US survey mile in meters (reference: src/pipeline_calculator_v3.py:49). */
  val SurveyMile: Double = 1609.347218694

  /** Result of the inverse problem: distance in meters, forward azimuth at
    * point 1 and at point 2, both in degrees in (-180, 180] like pyproj. */
  final case class Inverse(distanceM: Double, azimuth1Deg: Double, azimuth2Deg: Double)

  /** Vincenty inverse. Returns distance (m) and forward azimuths (deg).
    * Falls back to a small-distance planar result for coincident points. */
  def inverse(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Inverse = {
    if (lon1 == lon2 && lat1 == lat2) return Inverse(0.0, 0.0, 0.0)
    val phi1 = math.toRadians(lat1)
    val phi2 = math.toRadians(lat2)
    val L = math.toRadians(lon2 - lon1)
    val u1 = math.atan((1.0 - F) * math.tan(phi1))
    val u2 = math.atan((1.0 - F) * math.tan(phi2))
    val sinU1 = math.sin(u1); val cosU1 = math.cos(u1)
    val sinU2 = math.sin(u2); val cosU2 = math.cos(u2)

    var lambda = L
    var lambdaPrev = Double.MaxValue
    var iter = 0
    var sinSigma = 0.0; var cosSigma = 0.0; var sigma = 0.0
    var sinAlpha = 0.0; var cos2Alpha = 0.0; var cos2SigmaM = 0.0
    var sinLambda = 0.0; var cosLambda = 0.0
    while (math.abs(lambda - lambdaPrev) > 1e-13 && iter < 200) {
      sinLambda = math.sin(lambda); cosLambda = math.cos(lambda)
      val t1 = cosU2 * sinLambda
      val t2 = cosU1 * sinU2 - sinU1 * cosU2 * cosLambda
      sinSigma = math.sqrt(t1 * t1 + t2 * t2)
      if (sinSigma == 0.0) return Inverse(0.0, 0.0, 0.0) // coincident
      cosSigma = sinU1 * sinU2 + cosU1 * cosU2 * cosLambda
      sigma = math.atan2(sinSigma, cosSigma)
      sinAlpha = cosU1 * cosU2 * sinLambda / sinSigma
      cos2Alpha = 1.0 - sinAlpha * sinAlpha
      cos2SigmaM = if (cos2Alpha == 0.0) 0.0 else cosSigma - 2.0 * sinU1 * sinU2 / cos2Alpha
      val c = F / 16.0 * cos2Alpha * (4.0 + F * (4.0 - 3.0 * cos2Alpha))
      lambdaPrev = lambda
      lambda = L + (1.0 - c) * F * sinAlpha *
        (sigma + c * sinSigma * (cos2SigmaM + c * cosSigma * (-1.0 + 2.0 * cos2SigmaM * cos2SigmaM)))
      iter += 1
    }

    val uSq = cos2Alpha * (A * A - B * B) / (B * B)
    val bigA = 1.0 + uSq / 16384.0 * (4096.0 + uSq * (-768.0 + uSq * (320.0 - 175.0 * uSq)))
    val bigB = uSq / 1024.0 * (256.0 + uSq * (-128.0 + uSq * (74.0 - 47.0 * uSq)))
    val deltaSigma = bigB * sinSigma * (cos2SigmaM + bigB / 4.0 *
      (cosSigma * (-1.0 + 2.0 * cos2SigmaM * cos2SigmaM) -
        bigB / 6.0 * cos2SigmaM * (-3.0 + 4.0 * sinSigma * sinSigma) * (-3.0 + 4.0 * cos2SigmaM * cos2SigmaM)))
    val s = B * bigA * (sigma - deltaSigma)

    val az1 = math.atan2(cosU2 * sinLambda, cosU1 * sinU2 - sinU1 * cosU2 * cosLambda)
    val az2 = math.atan2(cosU1 * sinLambda, -sinU1 * cosU2 + cosU1 * sinU2 * cosLambda)
    Inverse(s, math.toDegrees(az1), math.toDegrees(az2))
  }

  /** Distance only (m). */
  def distance(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double =
    inverse(lon1, lat1, lon2, lat2).distanceM

  /** Forward azimuth at point 1, degrees in (-180, 180] (pyproj convention). */
  def azimuth(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double =
    inverse(lon1, lat1, lon2, lat2).azimuth1Deg

  /** Length of a polyline of (lon, lat) vertices: sum of |inverse distance|
    * over consecutive pairs (reference :230-236 uses abs(distance)). */
  def polylineLength(coords: Array[(Double, Double)]): Double = {
    if (coords == null || coords.length < 2) return 0.0
    var total = 0.0
    var i = 0
    while (i < coords.length - 1) {
      total += math.abs(distance(coords(i)._1, coords(i)._2, coords(i + 1)._1, coords(i + 1)._2))
      i += 1
    }
    total
  }

  /** Bearing difference folded to [0, 180] with 360 wraparound, NO 180°
    * antiparallel folding (reference :347-348, SURVEY Q3). */
  def bearingDiff(b1: Double, b2: Double): Double = {
    val d = math.abs(b1 - b2)
    math.min(d, 360.0 - d)
  }
}
