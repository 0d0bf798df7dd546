package graft

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.KmlParser

/** Malformed-input semantics (reference :129-132, :197-211: skip bad
  * placemarks/tokens with a warning, never crash; range-validate). */
class KmlParserEdgeSpec extends AnyFunSuite {

  private def parse(kml: String) =
    KmlParser.parseKml(new ByteArrayInputStream(kml.getBytes(StandardCharsets.UTF_8)))

  private def doc(placemarks: String) =
    s"""<?xml version="1.0"?><kml xmlns="http://www.opengis.net/kml/2.2"><Document>
       |$placemarks
       |</Document></kml>""".stripMargin

  test("malformed coordinate tokens are skipped, valid ones kept") {
    val fs = parse(doc(
      """<Placemark><LineString><coordinates>
        |  -103.5,31.3,0 garbage,token -103.4,31.4 1e2bad,33 -103.3,31.5,7
        |</coordinates></LineString></Placemark>""".stripMargin))
    assert(fs.length == 1)
    assert(fs.head.coordinates.map(c => (c.lon, c.lat)) ==
      Seq((-103.5, 31.3), (-103.4, 31.4), (-103.3, 31.5)))
  }

  test("out-of-range lon/lat are dropped (reference range validation)") {
    val fs = parse(doc(
      """<Placemark><LineString><coordinates>
        |  -200.0,31.3 -103.5,95.0 -103.5,31.3 -103.4,31.4
        |</coordinates></LineString></Placemark>""".stripMargin))
    assert(fs.head.coordinates.length == 2)
  }

  test("placemark with no coordinates is skipped, not fatal; numbering unaffected") {
    val fs = parse(doc(
      """<Placemark><name>empty</name></Placemark>
        |<Placemark><LineString><coordinates>-103.5,31.3 -103.4,31.4</coordinates></LineString></Placemark>""".stripMargin))
    assert(fs.length == 1)
    // the skipped placemark does not consume an Item_N number
    assert(fs.head.name == "Item_1")
  }

  test("single-coordinate placemark classifies as Point even without <Point>") {
    val fs = parse(doc(
      "<Placemark><coordinates>-103.5,31.3</coordinates></Placemark>"))
    assert(fs.length == 1)
    assert(fs.head.geometryType == "Point")
  }

  test("whitespace-only name falls back to Item_N; SimpleData preserved in attrs") {
    val fs = parse(doc(
      """<Placemark><name>  </name>
        |<ExtendedData><SchemaData><SimpleData name="DIAMETER">12.5</SimpleData></SchemaData></ExtendedData>
        |<LineString><coordinates>-103.5,31.3 -103.4,31.4</coordinates></LineString></Placemark>""".stripMargin))
    assert(fs.head.name == "Item_1")
    assert(fs.head.attrs("DIAMETER") == "12.5")
  }
}
