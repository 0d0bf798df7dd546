package graft.pipeline

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Export sinks for a completed analysis (SURVEY §2 O19-O21;
  * reference /root/reference/src/pipeline_calculator_v3.py:1657-1701
  * CSV/JSON, :1355-1473 KML).
  *
  * CSV/JSON ride `DataFrameWriter`; the reference exports are single
  * files, so small outputs are written `coalesce(1)` + renamed (the
  * SURVEY §4.2 "deterministic single-file sink" pattern). The nested
  * summary JSON (the reference's whole-result dump) is assembled
  * driver-side — it is a handful of KB regardless of input scale; the
  * big per-row tables go through the distributed writers.
  *
  * Divergence from the reference, documented: pandas wrote Python
  * `repr()` strings for nested values (bbox dict, polygon list) in
  * `*_overlaps.csv`; this engine writes proper flat columns and keeps
  * polygons in the JSON/KML sinks where nesting is representable.
  */
object Sinks {

  /** pipelines CSV — reference column set (OBJECTID, Name,
    * Shape_Length, pipelinelength), header on (:1679-1680). */
  def writePipelinesCsv(result: AnalysisResult, path: String): Unit =
    singleFile(
      result.pipelines.select("OBJECTID", "Name", "Shape_Length", "pipelinelength"),
      "csv", path)

  /** bundled sections CSV (`*_overlaps.csv`, :1683-1686) — flat columns. */
  def writeOverlapsCsv(result: AnalysisResult, path: String): Unit =
    singleFile(
      result.sections.select("pipeline_1", "pipeline_2", "bundled_length_meters",
        "bundled_length_miles", "average_separation", "segment_count",
        "center_lon", "center_lat", "min_lon", "max_lon", "min_lat", "max_lat",
        "oriented_width_m"),
      "csv", path)

  /** summary text (:1688-1695). */
  def writeSummaryTxt(result: AnalysisResult, path: String): Unit = {
    val s = result.summary
    val txt =
      f"""Pipeline Analysis Summary
         |${"=" * 50}
         |Total Original Length: ${s.totalMiles}%.3f miles
         |Effective Survey Length: ${s.effectiveMiles}%.3f miles
         |Survey Savings: ${s.savingsMiles}%.3f miles
         |Savings Percentage: ${s.savingsPercent}%.1f%%
         |""".stripMargin
    Files.writeString(Paths.get(path), txt)
  }

  /** Whole-result JSON export (reference json.dump of the result dict,
    * :1672-1675): pipelines, placemarks, totals, overlap_analysis
    * (bundled_sections with polygons, pipeline_overlaps, effective/
    * savings), analysis_parameters.
    *
    * Restructured for scale (round-10 finding 2): the nested summary
    * document — totals, savings, parameters, a handful of KB at ANY
    * input size — is still assembled driver-side exactly like the
    * reference's dict, but the four per-row tables are written by the
    * DISTRIBUTED json writer into `<path>.tables/<name>/` (JSON-lines
    * part files, `spark.read.json`-able) and the summary embeds
    * POINTERS to them. The previous shape inlined every table through
    * `.toJSON.collect()` — faithful to the reference's single document
    * and fine at 45 pipelines, but a guaranteed driver OOM once the
    * pipelines table is corpus-sized. Divergence from the reference,
    * documented (same stance as the overlaps-CSV flat columns). */
  def writeJson(result: AnalysisResult, params: AnalyzerParams, path: String): Unit = {
    val s = result.summary
    val tablesDir = s"$path.tables"
    def table(df: DataFrame, name: String): String = {
      df.write.mode("overwrite").json(s"$tablesDir/$name")
      s"""{"path": "${tablesDir.replace("\\", "/")}/$name", "format": "json-lines"}"""
    }
    val pipelines = table(result.pipelines
      .select("OBJECTID", "Name", "Shape_Length", "pipelinelength"), "pipelines")
    val placemarks = table(result.placemarks, "placemarks")
    val sections = table(result.sections
      .select(col("pipeline_1"), col("pipeline_2"), col("bundled_length_meters"),
        col("bundled_length_miles"), col("average_separation"), col("segment_count"),
        col("center_lon"), col("center_lat"),
        struct(col("min_lon"), col("max_lon"), col("min_lat"), col("max_lat")).as("bbox"),
        col("oriented_polygon"), col("oriented_width_m"), col("corridor_polygon")),
      "bundled_sections")
    val overlaps = table(result.overlaps
      .select("name", "bundled_segments", "bundled_length_meters", "bundled_length_miles"),
      "pipeline_overlaps")
    val json =
      s"""{
         |  "pipelines": $pipelines,
         |  "placemarks": $placemarks,
         |  "total_meters": ${s.totalMeters},
         |  "total_miles": ${s.totalMiles},
         |  "overlap_analysis": {
         |    "bundled_sections": $sections,
         |    "pipeline_overlaps": $overlaps,
         |    "total_bundled_length": ${s.totalBundledMeters},
         |    "effective_total_meters": ${s.effectiveMeters},
         |    "effective_total_miles": ${s.effectiveMiles},
         |    "savings_meters": ${s.savingsMeters},
         |    "savings_miles": ${s.savingsMiles},
         |    "savings_percentage": ${s.savingsPercent},
         |    "computation_method": "clustered_segments_v1"
         |  },
         |  "analysis_parameters": {
         |    "detection_range": ${params.clamped.detectionRangeM},
         |    "min_parallel_length": ${params.clamped.minParallelM},
         |    "segment_length": ${params.clamped.segmentM},
         |    "angular_tolerance": ${params.clamped.angularTolDeg}
         |  }
         |}""".stripMargin
    Files.writeString(Paths.get(path), json)
  }

  /** One section's corridor KML — polygon + center point, styled like
    * the reference (:1420-1460): green 50%-alpha fill, 2 px outline. */
  def sectionKml(
      pipeline1: String, pipeline2: String,
      bundledMiles: Double, avgSepM: Double, widthM: Double,
      centerLon: Double, centerLat: Double,
      polygon: Seq[LonLat]): String = {
    val ring = if (polygon.nonEmpty && polygon.head != polygon.last)
      polygon :+ polygon.head else polygon
    val label = f"${esc(pipeline1)} + ${esc(pipeline2)} ($bundledMiles%.3f mi, $avgSepM%.1f m)"
    val coords = ring.map(p => f"${p.lon}%.7f,${p.lat}%.7f,0").mkString("\n              ")
    f"""    <Placemark>
       |      <name>$label</name>
       |      <description>Bundled pipeline survey corridor: $bundledMiles%.3f miles at $avgSepM%.1f m average separation, approx width: $widthM%.1f m</description>
       |      <styleUrl>#surveyCorridorStyle</styleUrl>
       |      <Polygon>
       |        <outerBoundaryIs>
       |          <LinearRing>
       |            <coordinates>
       |              $coords
       |            </coordinates>
       |          </LinearRing>
       |        </outerBoundaryIs>
       |      </Polygon>
       |    </Placemark>
       |    <Placemark>
       |      <name>Center: $label</name>
       |      <Point>
       |        <coordinates>$centerLon%.7f,$centerLat%.7f,0</coordinates>
       |      </Point>
       |    </Placemark>""".stripMargin
  }

  /** All-sections corridor KML document (the reference writes one file
    * per viewed section; a single document with every corridor is the
    * batch-engine equivalent). topK caps the output like the GUI's
    * top-20 display (:1507). */
  def writeKml(result: AnalysisResult, path: String, topK: Int = Int.MaxValue): Unit = {
    val rows = result.sections
      .select("pipeline_1", "pipeline_2", "bundled_length_miles",
        "average_separation", "oriented_width_m", "center_lon", "center_lat",
        "corridor_polygon")
      .limit(topK)
      .collect()
    val placemarks = rows.map { r =>
      val poly = r.getSeq[Row](7).map(p => LonLat(p.getDouble(0), p.getDouble(1)))
      sectionKml(r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), poly)
    }.mkString("\n")
    val kml =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<kml xmlns="http://www.opengis.net/kml/2.2">
         |  <Document>
         |    <Style id="surveyCorridorStyle">
         |      <PolyStyle>
         |        <color>7F00FF00</color>
         |        <outline>1</outline>
         |      </PolyStyle>
         |      <LineStyle>
         |        <color>FF00FF00</color>
         |        <width>2</width>
         |      </LineStyle>
         |    </Style>
         |$placemarks
         |  </Document>
         |</kml>
         |""".stripMargin
    Files.writeString(Paths.get(path), kml)
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** coalesce(1) + rename: deterministic single-file output for small
    * results (the reference's export shape). */
  private def singleFile(df: DataFrame, format: String, targetPath: String): Unit = {
    val tmp = Files.createTempDirectory("graft_sink_").toString
    val dir = s"$tmp/out"
    df.coalesce(1).write.option("header", "true").format(format).save(dir)
    val part = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .find(p => p.endsWith(s".$format"))
      .getOrElse(throw new IllegalStateException(s"no part file in $dir"))
    Files.move(Paths.get(part), Paths.get(targetPath), StandardCopyOption.REPLACE_EXISTING)
    // best-effort temp cleanup
    Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { Files.deleteIfExists(p); () })
  }
}
