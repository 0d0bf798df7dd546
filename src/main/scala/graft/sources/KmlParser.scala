package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable
import graft.pipeline.{LonLat, RawFeature}

/** Streaming KMZ/KML parser with the reference's extraction semantics
  * (/root/reference/src/pipeline_calculator_v3.py:55-214):
  *
  *  - KMZ = ZIP; take the FIRST member whose name ends in .kml (:60-65),
  *    error if none.
  *  - per-Placemark: name = first direct <name> child (:95-102), missing
  *    or blank → Item_{n} with n = running feature count + 1;
  *  - OBJECTID from Data[@name=OBJECTID]/value, else SimpleData
  *    [@name=OBJECTID] (:148-165), else "N/A";
  *  - coordinates = FIRST <coordinates> descendant (:185-199), tokens
  *    whitespace-separated "lon,lat[,alt]", malformed tokens skipped,
  *    range-validated -180≤lon≤180 / -90≤lat≤90 (:203-211);
  *  - classification (:110-128): LineString descendant, or ≥2 coords and
  *    no Point → pipeline; Point or exactly 1 coord → placemark;
  *    0 coords → dropped.
  *
  * Element matching is by XML local name (namespace-agnostic), a strict
  * superset of the reference's root-namespace matching — identical on
  * well-formed single-namespace KML, and robust to mixed/absent
  * namespaces (SURVEY §1.3). Pure JVM (StAX): usable on the driver for
  * single files and inside executors for distributed many-file reads.
  */
object KmlParser {

  def parseFile(path: String): Seq[RawFeature] = {
    val lower = path.toLowerCase
    if (lower.endsWith(".kmz")) {
      val in = new java.io.FileInputStream(path)
      try parseKmz(in)
      finally in.close()
    } else {
      val in = new java.io.FileInputStream(path)
      try parseKml(in)
      finally in.close()
    }
  }

  def parseBytes(fileName: String, bytes: Array[Byte]): Seq[RawFeature] =
    if (fileName.toLowerCase.endsWith(".kmz")) parseKmz(new ByteArrayInputStream(bytes))
    else parseKml(new ByteArrayInputStream(bytes))

  /** First *.kml member of the archive (reference :60-65). */
  def parseKmz(in: InputStream): Seq[RawFeature] = {
    val zip = new ZipInputStream(in)
    try {
      var entry = zip.getNextEntry
      while (entry != null) {
        if (!entry.isDirectory && entry.getName.toLowerCase.endsWith(".kml")) {
          return parseKml(zip)
        }
        entry = zip.getNextEntry
      }
      throw new IllegalArgumentException("No KML file found in KMZ archive")
    } finally zip.close()
  }

  def parseKml(in: InputStream): Seq[RawFeature] = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    factory.setProperty("javax.xml.stream.isSupportingExternalEntities", java.lang.Boolean.FALSE)
    val r = factory.createXMLStreamReader(in)
    try parse(r)
    finally r.close()
  }

  private def parse(r: XMLStreamReader): Seq[RawFeature] = {
    val out = mutable.ArrayBuffer[RawFeature]()
    var featureCount = 0
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT if r.getLocalName == "Placemark" =>
          val f = parsePlacemark(r, featureCount)
          f.foreach { feat => out += feat; featureCount += 1 }
        case _ =>
      }
    }
    out.toSeq
  }

  /** Consumes one <Placemark> subtree; reader is positioned on its
    * START_ELEMENT. Returns None for featureless placemarks (0 coords). */
  private def parsePlacemark(r: XMLStreamReader, featureCount: Int): Option[RawFeature] = {
    var depth = 1
    var name: String = null
    var coordsText: String = null // first <coordinates> wins (.// find semantics)
    var hasLineString = false
    var hasPoint = false
    var objectid: String = null // from Data[@name=OBJECTID]/value
    var simpleObjectid: String = null // from SimpleData[@name=OBJECTID]
    val attrs = mutable.LinkedHashMap[String, String]()

    var inDataObjectId = false // inside <Data name="OBJECTID">

    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          depth += 1
          r.getLocalName match {
            case "name" if depth == 2 && name == null =>
              name = readText(r); depth -= 1 // readText consumes END_ELEMENT
            case "coordinates" =>
              val t = readText(r); depth -= 1
              if (coordsText == null) coordsText = t
            case "LineString" => hasLineString = true
            case "Point" => hasPoint = true
            case "Data" =>
              inDataObjectId = "OBJECTID" == attr(r, "name")
            case "value" if inDataObjectId =>
              val t = readText(r); depth -= 1
              if (objectid == null && t != null && t.trim.nonEmpty) objectid = t.trim
            case "SimpleData" =>
              val key = attr(r, "name")
              val t = readText(r); depth -= 1
              if (key != null) {
                if (!attrs.contains(key) && t != null) attrs(key) = t.trim
                if (key == "OBJECTID" && simpleObjectid == null && t != null && t.trim.nonEmpty)
                  simpleObjectid = t.trim
              }
            case _ =>
          }
        case XMLStreamConstants.END_ELEMENT =>
          if (r.getLocalName == "Data") inDataObjectId = false
          depth -= 1
        case _ =>
      }
    }

    val coords = parseCoordinates(coordsText)
    if (coords.isEmpty) return None

    val finalName =
      if (name != null && name.trim.nonEmpty) name.trim
      else s"Item_${featureCount + 1}"
    val finalObjectId =
      if (objectid != null) objectid
      else if (simpleObjectid != null) simpleObjectid
      else "N/A"

    val geomType =
      if (hasLineString || (coords.length >= 2 && !hasPoint)) "LineString"
      else "Point"

    Some(RawFeature(finalName, finalObjectId, geomType, coords, attrs.toMap))
  }

  /** Reads text content of the current element up to its END_ELEMENT. */
  private def readText(r: XMLStreamReader): String = {
    val sb = new StringBuilder
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          sb.append(r.getText)
        case XMLStreamConstants.START_ELEMENT => depth += 1
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case _ =>
      }
    }
    sb.toString
  }

  private def attr(r: XMLStreamReader, name: String): String = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == name) return r.getAttributeValue(i)
      i += 1
    }
    null
  }

  /** "lon,lat[,alt] lon,lat[,alt] ..." with validation (reference :197-211). */
  def parseCoordinates(text: String): Seq[LonLat] = {
    if (text == null) return Nil
    val out = mutable.ArrayBuffer[LonLat]()
    val tokens = text.trim.replace('\n', ' ').replace('\t', ' ').split("\\s+")
    for (tok <- tokens if tok.nonEmpty) {
      val parts = tok.split(',')
      if (parts.length >= 2) {
        try {
          val lon = parts(0).toDouble
          val lat = parts(1).toDouble
          if (lon >= -180 && lon <= 180 && lat >= -90 && lat <= 90)
            out += LonLat(lon, lat)
        } catch { case _: NumberFormatException => }
      }
    }
    out.toSeq
  }
}
