package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.geo.Geodesic
import graft.pipeline.{Analyzer, CorridorGeometry, LonLat, PipelineRow}

/** Property-based invariants (SURVEY §5 item 3) over the pure kernels —
  * no Spark session, so hundreds of generated cases run in seconds. */
class KernelPropsSpec extends AnyFunSuite {

  /** run a ScalaCheck property and fail the suite test on any counterexample */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private val lonGen = Gen.choose(-179.0, 179.0)
  private val latGen = Gen.choose(-75.0, 75.0)
  private val ptGen = for { lon <- lonGen; lat <- latGen } yield (lon, lat)

  test("geodesic distance: symmetric, non-negative, zero iff coincident") {
    check(Prop.forAll(ptGen, ptGen) { (a, b) =>
      val d1 = Geodesic.distance(a._1, a._2, b._1, b._2)
      val d2 = Geodesic.distance(b._1, b._2, a._1, a._2)
      assert(d1 >= 0.0)
      assert(math.abs(d1 - d2) < 1e-6, s"asymmetry $d1 vs $d2")
      if (a == b) assert(d1 == 0.0)
      true
    })
  }

  test("azimuth stays in (-180, 180]; bearing diff in [0, 180], symmetric") {
    check(Prop.forAll(ptGen, ptGen) { (a, b) =>
      if (a != b) {
        val az = Geodesic.azimuth(a._1, a._2, b._1, b._2)
        assert(az > -180.0 - 1e-9 && az <= 180.0 + 1e-9)
      }
      true
    })
    check(Prop.forAll(Gen.choose(-180.0, 180.0), Gen.choose(-180.0, 180.0)) { (b1, b2) =>
      val d = Geodesic.bearingDiff(b1, b2)
      assert(d >= 0.0 && d <= 180.0)
      assert(math.abs(d - Geodesic.bearingDiff(b2, b1)) < 1e-12)
      assert(Geodesic.bearingDiff(b1, b1) == 0.0)
      true
    })
  }

  test("PII regexes: every injected entity is scrubbed, none survives") {
    import graft.ops.CurationOps
    val word = Gen.listOfN(6, Gen.alphaLowerChar).map(_.mkString)
    val emailGen = for { a <- word; b <- word } yield s"$a@$b.com"
    val ipGen = for {
      a <- Gen.choose(0, 255); b <- Gen.choose(0, 255)
      c <- Gen.choose(0, 255); e <- Gen.choose(0, 255)
    } yield s"$a.$b.$c.$e"
    val phoneGen = for {
      a <- Gen.choose(100, 999); b <- Gen.choose(1000, 9999)
    } yield s"$a-$b"
    val fillerGen = Gen.listOfN(5, word).map(_.mkString(" "))
    check(Prop.forAll(fillerGen, emailGen, ipGen, phoneGen) { (f, e, ip, ph) =>
      val text = s"$f $e then $ip dial $ph end"
      // same fixed order as redactPii: email, IP, then phone
      val r = text.replaceAll(CurationOps.EmailRe, "<EMAIL>")
        .replaceAll(CurationOps.Ipv4Re, "<IP>")
        .replaceAll(CurationOps.PhoneRe, "<PHONE>")
      Seq(CurationOps.EmailRe, CurationOps.Ipv4Re, CurationOps.PhoneRe).foreach { re =>
        assert(!java.util.regex.Pattern.compile(re).matcher(r).find(),
          s"unscrubbed match of $re in: $r")
      }
      assert(r.contains("<EMAIL>") && r.contains("<IP>") && r.contains("<PHONE>"))
      true
    })
  }

  // small local polylines (≤ ~2 km edges) near a base point
  private val polylineGen: Gen[Seq[LonLat]] = for {
    lon0 <- Gen.choose(-100.0, 100.0)
    lat0 <- Gen.choose(-60.0, 60.0)
    n <- Gen.choose(2, 8)
    deltas <- Gen.listOfN(n, Gen.zip(Gen.choose(-0.01, 0.01), Gen.choose(-0.01, 0.01)))
  } yield {
    var lon = lon0; var lat = lat0
    deltas.map { case (dx, dy) => lon += dx; lat += dy; LonLat(lon, lat) }
  }

  test("segment count is floor-consistent with the polyline length (both modes)") {
    check(Prop.forAll(polylineGen) { coords =>
      val len = coords.sliding(2).collect { case Seq(a, b) =>
        math.abs(Geodesic.distance(a.lon, a.lat, b.lon, b.lat))
      }.sum
      for (compat <- Seq(true, false)) {
        val segs = Analyzer.segmentOne(PipelineRow(0, "x", "p", coords), 5.0, compat)
        // float accumulation can differ from the closed-form floor by 1ulp
        assert(segs.length <= len / 5.0 + 1e-9, s"count ${segs.length} vs len $len")
        assert(segs.length >= len / 5.0 - 1.0 - 1e-9)
        // indices are dense 0..n-1
        assert(segs.map(_.s) == segs.indices.toList)
      }
      true
    })
  }

  test("segment midpoints stay inside the polyline bounding box (both modes)") {
    check(Prop.forAll(polylineGen) { coords =>
      val (lonMin, lonMax) = (coords.map(_.lon).min, coords.map(_.lon).max)
      val (latMin, latMax) = (coords.map(_.lat).min, coords.map(_.lat).max)
      for (compat <- Seq(true, false)) {
        Analyzer.segmentOne(PipelineRow(0, "x", "p", coords), 5.0, compat).foreach { s =>
          assert(s.lon >= lonMin - 1e-12 && s.lon <= lonMax + 1e-12)
          assert(s.lat >= latMin - 1e-12 && s.lat <= latMax + 1e-12)
        }
      }
      true
    })
  }

  private val pairsGen: Gen[Seq[(LonLat, LonLat)]] = for {
    lon0 <- Gen.choose(-100.0, 100.0)
    lat0 <- Gen.choose(-60.0, 60.0)
    n <- Gen.choose(1, 30)
    steps <- Gen.listOfN(n, Gen.zip(Gen.choose(0.0, 1e-4), Gen.choose(0.0, 1e-4)))
    sepM <- Gen.choose(1.0, 14.0)
  } yield {
    var lon = lon0; var lat = lat0
    val sepDeg = sepM / 111320.0
    steps.map { case (dx, dy) =>
      lon += dx; lat += dy
      (LonLat(lon, lat), LonLat(lon + sepDeg, lat))
    }
  }

  test("corridor invariants: closed rings, width clamps, centerline covered") {
    check(Prop.forAll(pairsGen) { pairs =>
      val all = pairs.flatMap(p => Seq(p._1, p._2))
      val cLon = (all.map(_.lon).min + all.map(_.lon).max) / 2
      val cLat = (all.map(_.lat).min + all.map(_.lat).max) / 2
      for (compat <- Seq(true, false)) {
        val c = CorridorGeometry.compute(pairs, cLon, cLat, 5.0, 15.0, compat)
        // rings are closed and non-trivial
        assert(c.orientedPolygon.length == 5)
        assert(c.orientedPolygon.head == c.orientedPolygon.last)
        assert(c.corridorPolygon.head == c.corridorPolygon.last)
        // width in [max(segLen, min-sep+margin) clamped, 2*detection]
        assert(c.orientedWidthM >= 5.0 - 1e-9)
        assert(c.orientedWidthM <= 2.0 * 15.0 + 1e-9)
        // every centerline point projects inside the rectangle's t-extent
        val mPerDegX = 111320.0 * math.cos(math.toRadians(cLat))
        def xy(p: LonLat) = ((p.lon - cLon) * mPerDegX, (p.lat - cLat) * 111320.0)
        val cl = pairs.map(p => LonLat((p._1.lon + p._2.lon) / 2, (p._1.lat + p._2.lat) / 2))
        val corners = c.orientedPolygon.take(4).map(xy)
        val (x0, y0) = corners(0); val (x1, y1) = corners(1)
        val ux = x1 - x0; val uy = y1 - y0
        val uLen = math.hypot(ux, uy)
        if (uLen > 1e-9) {
          cl.foreach { p =>
            val (px, py) = xy(p)
            val t = ((px - x0) * ux + (py - y0) * uy) / uLen
            assert(t >= -1e-6 && t <= uLen + 1e-6,
              s"centerline point projects outside the rectangle: t=$t len=$uLen")
          }
        }
      }
      true
    })
  }

  test("FeatureCounts kernel vs an independent md5/regex reference " +
    "(random tokens incl. unicode, tabs, empty)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val nF = 16
    val tokGen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)), Gen.const("Ünïcodé"),
      Gen.const("汉字"), Gen.const(""), Gen.const("UPPER"))
    val sepGen = Gen.oneOf(" ", "  ", "\t", "\n")
    val textGen = for {
      n <- Gen.choose(0, 12)
      ts <- Gen.listOfN(n, tokGen)
      seps <- Gen.listOfN(n, sepGen)
    } yield ts.zip(seps).map { case (t, s) => t + s }.mkString

    def refCounts(text: String): Seq[Long] = {
      val out = Array.fill(nF + 1)(0L)
      out(nF) = 1L
      text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).foreach { tok =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(tok.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15)
        val h = new java.math.BigInteger(hex, 16).longValueExact() % 1000000007L
        out((h % nF).toInt) += 1L
      }
      out.toSeq
    }

    check(Prop.forAll(textGen) { text =>
      val got = graft.functions.FeatureCounts(
        Literal.create(UTF8String.fromString(text),
          org.apache.spark.sql.types.StringType), nF)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
      assert(got == refCounts(text), s"text=${text.take(60)}")
      true
    })
  }

  test("PQ kernels vs a straight-line reference on random floats (incl. NaN)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val (nSubs, nCodes) = (4, 4)
    val dim = 8
    val floatGen = Gen.frequency(
      (9, Gen.choose(-100, 100).map(_ / 10.0f)),
      (1, Gen.const(Float.NaN)))
    val vecGen = Gen.listOfN(dim, floatGen).map(_.toArray)
    val cbGen = Gen.listOfN(nSubs * nCodes,
      Gen.listOfN(dim / nSubs, floatGen).map(_.toSeq)).map(_.toSeq)

    def refEncode(x: Array[Float], fcb: Seq[Seq[Float]]): Seq[Int] = {
      val sub = dim / nSubs
      (0 until nSubs).map { m =>
        var best = Double.PositiveInfinity; var bk = 0
        for (k <- 0 until nCodes) {
          val cw = fcb(m * nCodes + k)
          var acc = 0.0
          for (j <- 0 until sub) {
            val d = x(m * sub + j).toDouble - cw(j).toDouble; acc += d * d
          }
          if (java.lang.Double.compare(acc, best) < 0) { best = acc; bk = k }
        }
        bk
      }
    }
    def refAdc(q: Array[Float], codes: Seq[Int], fcb: Seq[Seq[Float]]): Double = {
      val sub = dim / nSubs
      var tot = 0.0
      for (m <- 0 until nSubs) {
        val cw = fcb(m * nCodes + codes(m))
        var acc = 0.0
        for (j <- 0 until sub) {
          val d = q(m * sub + j).toDouble - cw(j).toDouble; acc += d * d
        }
        tot += acc
      }
      tot
    }
    val fcbType = ArrayType(ArrayType(FloatType, false), false)
    check(Prop.forAll(vecGen, vecGen, cbGen) { (x, q, fcb) =>
      val xL = Literal.create(x, ArrayType(FloatType, false))
      val fcbL = Literal.create(fcb, fcbType)
      val enc = graft.functions.PqEncode(xL, fcbL, nSubs, nCodes)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val codes = enc.toIntArray().toSeq
      assert(codes == refEncode(x, fcb), "encode parity")
      val qL = Literal.create(q, ArrayType(FloatType, false))
      val codesL = Literal.create(codes,
        ArrayType(org.apache.spark.sql.types.IntegerType, false))
      val adc = graft.functions.PqAdc(qL, codesL, fcbL, nSubs, nCodes)
        .eval(null).asInstanceOf[Double]
      val ref = refAdc(q, codes, fcb)
      // exact: same ops in the same order (NaN compares equal to
      // itself via the bit pattern)
      assert(java.lang.Double.compare(adc, ref) == 0, s"adc $adc vs $ref")
      true
    })
  }
}
