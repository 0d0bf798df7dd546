package graft.pipeline

/** Engine data model for the pipeline-survey domain (SURVEY §1).
  *
  * Mirrors the reference's implicit Python types
  * (/root/reference/src/pipeline_calculator_v3.py:116-128,277-282) as
  * typed case classes used at Dataset[T] API boundaries; the heavy
  * middle of each query runs as DataFrame ops.
  */
final case class LonLat(lon: Double, lat: Double)

/** A parsed KML placemark, engine superset schema (FIXTURES.md §1.4):
  * the reference keeps only name/objectid/coords; attrs preserves every
  * SimpleData it drops. */
final case class RawFeature(
    name: String,
    objectid: String,
    geometryType: String, // "LineString" | "Point"
    coordinates: Seq[LonLat],
    attrs: Map[String, String])

/** A pipeline row (LineString feature), id = 0-based arrival order
  * (reference :117 `'id': pipeline_count - 1`). */
final case class PipelineRow(
    id: Int,
    objectid: String,
    name: String,
    coordinates: Seq[LonLat])

/** Point-placemark row (reference :124-128). */
final case class PlacemarkRow(placemarkId: String, name: String, count: Int)

/** A 5 m resegmentation row (reference :277-282): one row per segment,
  * keyed (pipelineId, segmentIndex); bearing is the parent edge's
  * forward azimuth in (-180, 180]. */
final case class SegmentRow(
    p: Int,
    s: Int,
    lon: Double,
    lat: Double,
    bearing: Double)

/** Analysis parameters with the reference's clamps
  * (reference :37-41 defaults, :1075-1078 clamps). `compat` reproduces
  * the reference's observable quirks (SURVEY Q1/Q2/Q5): the anisotropic
  * degree-space prefilter, drifting midpoints, signed session gaps. */
final case class AnalyzerParams(
    detectionRangeM: Double = 15.0,
    minParallelM: Double = 200.0,
    segmentM: Double = 5.0,
    angularTolDeg: Double = 15.0,
    compat: Boolean = true) {
  def clamped: AnalyzerParams = copy(
    detectionRangeM = math.max(1.0, detectionRangeM),
    minParallelM = math.max(10.0, minParallelM),
    segmentM = math.max(1.0, segmentM),
    angularTolDeg = math.min(90.0, math.max(1.0, angularTolDeg)))
}

/** Headline numbers of a complete analysis (reference :885-897). */
final case class AnalysisSummary(
    nPipelines: Long,
    nPlacemarks: Long,
    totalMeters: Double,
    totalMiles: Double,
    nSegments: Long,
    nPairGroups: Long,
    nBundledSections: Long,
    totalBundledMeters: Double,
    effectiveMeters: Double,
    effectiveMiles: Double,
    savingsMeters: Double,
    savingsMiles: Double,
    savingsPercent: Double)
