package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.pipeline.Analyzer
import graft.sources.KmlSource

/** Driver-visible correctness queries for the pipeline-survey core
  * (SURVEY §2.1 O5-O17; reference src/pipeline_calculator_v3.py:216-899),
  * in two flavors:
  *
  *  - **Regression pins** (O5 lengths, O6 segmentation, O7-O10 pair
  *    join): recompute from the reference's fixture KMZ at verify time
  *    and hash-compare against the committed parquet intermediates in
  *    fixtures/pipe (dumped once by [[graft.tools.PipeFixture]], values
  *    pinned against BASELINE.md by the golden specs). The geodesic
  *    math is not SQL-expressible, so the oracle is the pin.
  *
  *  - **True cross-engine oracles** (O11 sessionization, O12 section
  *    aggregation, O14 overlap rollup, O15/O16 top-k + totals, O17
  *    effective length): the query reads the committed pairs/segments/
  *    lengths parquet as INPUT, and DuckDB recomputes the full logic
  *    independently (window SQL for gaps-and-islands, set SQL for the
  *    1/k clustering), so the driver hash check exercises the operator
  *    semantics end to end.
  *
  * Numeric discipline: all cross-engine aggregates run over integer
  * micrometers (`CAST(ROUND(x*1e6) AS BIGINT)`) because double SUM/AVG
  * is accumulation-order-dependent across engines; per-row double
  * arithmetic (bbox buffering, centers, unit conversions) is IEEE-exact
  * and compared raw. Averages are derived from the exact integer sums.
  */
object PipelineQueries {

  /** Reference fixture KMZ. Overridable via GRAFT_REFERENCE_KMZ for
    * machines where the reference checkout lives elsewhere. */
  val FixtureKmz: String = sys.env.getOrElse("GRAFT_REFERENCE_KMZ",
    "/root/reference/test_data/Brazos_NGL and Delaware_Gas combined.kmz")

  /** Committed parquet intermediates (dumped by [[graft.tools.PipeFixture]]).
    * Resolved against the working directory (sbt runs from the repo
    * root) so the suite — and the DuckDB oracle SQL that embeds these
    * paths — is portable; overridable via GRAFT_FIXTURE_DIR. */
  val FixtureDir: String = sys.env.getOrElse("GRAFT_FIXTURE_DIR",
    new java.io.File("fixtures/pipe").getAbsolutePath)

  private def glob(name: String) = s"$FixtureDir/$name.parquet/*.parquet"

  type QFn = (SparkSession, String) => DataFrame

  private def analyzer = new Analyzer() // compat defaults = BASELINE.md run

  private def pipelines(s: SparkSession) =
    KmlSource.split(KmlSource.read(s, FixtureKmz))._1

  private def pairsIn(s: SparkSession) = s.read.parquet(s"$FixtureDir/pairs.parquet")
  private def segsIn(s: SparkSession) = s.read.parquet(s"$FixtureDir/segments.parquet")
  private def lengthsIn(s: SparkSession) = s.read.parquet(s"$FixtureDir/lengths.parquet")

  /** micrometer-exact long from a double column */
  private def um(c: org.apache.spark.sql.Column) = round(c * 1e6).cast("long")

  // sessionization (O11) over the committed pairs, compat tie-break
  // order — the same logic as Analyzer.sessionize, applied to the
  // parquet input so DuckDB can replicate it
  private def sessionized(s: SparkSession): DataFrame =
    analyzer.sessionize(pairsIn(s))

  // kept sections (O12): minParallelM=200 at 5 m/segment → ≥40 rows
  private def keptSections(s: SparkSession): DataFrame =
    sessionized(s)
      .groupBy("p1", "p2", "section")
      .agg(
        count(lit(1)).as("segment_count"),
        sum(um(col("distance"))).as("sum_sep_um"),
        min(least(col("lon1"), col("lon2"))).as("raw_min_lon"),
        max(greatest(col("lon1"), col("lon2"))).as("raw_max_lon"),
        min(least(col("lat1"), col("lat2"))).as("raw_min_lat"),
        max(greatest(col("lat1"), col("lat2"))).as("raw_max_lat"))
      .withColumn("bundled_length_meters", col("segment_count") * 5.0)
      .filter(col("bundled_length_meters") >= 200.0)

  val queries: Map[String, QFn] = Map(
    // ---- O5: per-pipeline geodesic lengths (pin vs committed parquet)
    "pipe_lengths" -> ((s, _) =>
      analyzer.pipelineLengths(pipelines(s))
        .select(col("id"), col("OBJECTID"), col("Name"),
          col("Shape_Length"), col("pipelinelength"))),

    // ---- O6: 5 m resegmentation (pin: per-pipeline counts + index range)
    "pipe_segments_count" -> ((s, _) =>
      analyzer.segments(pipelines(s)).toDF()
        .groupBy("p")
        .agg(count(lit(1)).as("n_segments"),
          min(col("s")).cast("long").as("min_s"),
          max(col("s")).cast("long").as("max_s"))),

    // ---- O7-O10: grid distance self-join (pin: per-pair-group stats)
    "pipe_pair_groups" -> ((s, _) =>
      analyzer.parallelPairs(analyzer.segments(pipelines(s)))
        .groupBy("p1", "p2")
        .agg(count(lit(1)).as("n_pairs"),
          sum(um(col("distance"))).as("sum_dist_um"),
          min(col("s1")).cast("long").as("min_s1"),
          max(col("s2")).cast("long").as("max_s2"))),

    // ---- O11: gaps-and-islands sessionization (TRUE oracle: DuckDB
    // recomputes the window logic over the same pairs parquet)
    "pipe_sections_all" -> ((s, _) =>
      sessionized(s)
        .groupBy("p1", "p2", "section")
        .agg(count(lit(1)).as("n_pairs"),
          min(col("s1")).cast("long").as("min_s1"),
          max(col("s1")).cast("long").as("max_s1"),
          min(col("s2")).cast("long").as("min_s2"),
          max(col("s2")).cast("long").as("max_s2"))),

    // ---- O12: kept-section aggregation with buffered bbox + exact
    // integer-micrometer separation stats (TRUE oracle)
    "pipe_sections" -> ((s, _) =>
      keptSections(s)
        .withColumn("average_separation_m",
          (col("sum_sep_um").cast("double") / 1e6) / col("segment_count").cast("double"))
        .select(col("p1"), col("p2"), col("section"), col("segment_count"),
          col("sum_sep_um"), col("average_separation_m"),
          col("bundled_length_meters"),
          (col("raw_min_lon") - 0.001).as("min_lon"),
          (col("raw_max_lon") + 0.001).as("max_lon"),
          (col("raw_min_lat") - 0.001).as("min_lat"),
          (col("raw_max_lat") + 0.001).as("max_lat"))),

    // ---- O14: per-pipeline overlap rollup over KEPT sections (TRUE oracle)
    "pipe_overlaps" -> ((s, _) => {
      val kept = sessionized(s).join(
        keptSections(s).select("p1", "p2", "section"),
        Seq("p1", "p2", "section"), "left_semi")
      kept.select(col("p1").as("p"), col("s1").as("seg"))
        .union(kept.select(col("p2").as("p"), col("s2").as("seg")))
        .distinct()
        .groupBy("p")
        .agg(count(lit(1)).as("bundled_segments"))
        .withColumn("bundled_length_meters", col("bundled_segments") * 5.0)
    }),

    // ---- O15: top-5 kept sections by bundled length (TRUE oracle)
    "pipe_top_sections" -> ((s, _) =>
      keptSections(s)
        .select(col("p1"), col("p2"), col("section"),
          col("segment_count"), col("bundled_length_meters"))
        .orderBy(col("segment_count").desc, col("p1").asc, col("p2").asc,
          col("section").asc)
        .limit(5)),

    // ---- O16: run totals (TRUE oracle; integer-exact sums)
    "pipe_totals" -> ((s, _) => {
      val sect = keptSections(s).agg(
        count(lit(1)).as("n_sections"),
        sum(col("segment_count")).as("bundled_segments"))
      val segsN = segsIn(s).agg(count(lit(1)).as("n_segments"))
      val pg = pairsIn(s).select("p1", "p2").distinct()
        .agg(count(lit(1)).as("n_pair_groups"))
      val len = lengthsIn(s).agg(
        sum(um(col("Shape_Length"))).as("total_len_um"))
      sect.crossJoin(segsN).crossJoin(pg).crossJoin(len)
        .withColumn("total_bundled_m", col("bundled_segments") * 5.0)
    }),

    // ---- O17: effective length by 1/k clustering (TRUE oracle;
    // per-segment contribution in integer micrometers: round(5e6/(k+1)))
    "pipe_effective_length" -> ((s, _) => {
      val pairs = pairsIn(s)
      val oriented = pairs.select(col("p1").as("p"), col("s1").as("seg"), col("p2").as("o"))
        .union(pairs.select(col("p2").as("p"), col("s2").as("seg"), col("p1").as("o")))
      val kDf = oriented.groupBy("p", "seg").agg(countDistinct("o").as("others"))
      val eff = segsIn(s).select(col("p"), col("s").as("seg"))
        .join(kDf, Seq("p", "seg"), "left")
        .select(round(lit(5e6) / (coalesce(col("others"), lit(0L)) + lit(1L)))
          .cast("long").as("contrib_um"))
        .agg(sum(col("contrib_um")).as("eff_um"))
      val segSums = segsIn(s).groupBy("p").agg(count(lit(1)).as("n_segs"))
      val len = lengthsIn(s)
      val tails = len
        .join(segSums, len("id") === segSums("p"), "left")
        .select(um(greatest(
          col("Shape_Length") - coalesce(col("n_segs"), lit(0L)) * 5.0,
          lit(0.0))).as("tail_um"))
        .agg(sum(col("tail_um")).as("tails_um"))
      eff.crossJoin(tails)
        .withColumn("total_um", col("eff_um") + col("tails_um"))
        .withColumn("effective_m", col("total_um").cast("double") / 1e6)
    })
  )

  // ------------------------------------------------------------ oracles

  /** O11's window logic in DuckDB SQL: compat tie-break order
    * (s1, compat_dx, compat_dy, s2), signed >2 gaps break. */
  private val sqlSessionized =
    s"""SELECT *, CAST(SUM(brk) OVER (PARTITION BY p1, p2
       |    ORDER BY s1, compat_dx, compat_dy, s2
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS section
       |FROM (
       |  SELECT *, CASE WHEN ls1 IS NULL OR s1 - ls1 > 2 OR s2 - ls2 > 2
       |                 THEN 1 ELSE 0 END AS brk
       |  FROM (
       |    SELECT *, LAG(s1) OVER ord AS ls1, LAG(s2) OVER ord AS ls2
       |    FROM '${glob("pairs")}'
       |    WINDOW ord AS (PARTITION BY p1, p2
       |                   ORDER BY s1, compat_dx, compat_dy, s2)))""".stripMargin

  private val sqlKeptSections =
    s"""SELECT p1, p2, section,
       |  COUNT(1) AS segment_count,
       |  CAST(SUM(CAST(ROUND(distance*1e6) AS BIGINT)) AS BIGINT) AS sum_sep_um,
       |  MIN(LEAST(lon1, lon2)) AS raw_min_lon,
       |  MAX(GREATEST(lon1, lon2)) AS raw_max_lon,
       |  MIN(LEAST(lat1, lat2)) AS raw_min_lat,
       |  MAX(GREATEST(lat1, lat2)) AS raw_max_lat,
       |  COUNT(1)::DOUBLE * 5.0 AS bundled_length_meters
       |FROM ($sqlSessionized)
       |GROUP BY p1, p2, section
       |HAVING COUNT(1) * 5.0 >= 200.0""".stripMargin

  val oracle: Map[String, String] = Map(
    "pipe_lengths" ->
      s"""SELECT id, OBJECTID, Name, Shape_Length, pipelinelength
         |FROM '${glob("lengths")}'""".stripMargin,

    "pipe_segments_count" ->
      s"""SELECT p, COUNT(1) AS n_segments,
         |  CAST(MIN(s) AS BIGINT) AS min_s, CAST(MAX(s) AS BIGINT) AS max_s
         |FROM '${glob("segments")}' GROUP BY p""".stripMargin,

    "pipe_pair_groups" ->
      s"""SELECT p1, p2, COUNT(1) AS n_pairs,
         |  CAST(SUM(CAST(ROUND(distance*1e6) AS BIGINT)) AS BIGINT) AS sum_dist_um,
         |  CAST(MIN(s1) AS BIGINT) AS min_s1, CAST(MAX(s2) AS BIGINT) AS max_s2
         |FROM '${glob("pairs")}' GROUP BY p1, p2""".stripMargin,

    "pipe_sections_all" ->
      s"""SELECT p1, p2, section, COUNT(1) AS n_pairs,
         |  CAST(MIN(s1) AS BIGINT) AS min_s1, CAST(MAX(s1) AS BIGINT) AS max_s1,
         |  CAST(MIN(s2) AS BIGINT) AS min_s2, CAST(MAX(s2) AS BIGINT) AS max_s2
         |FROM ($sqlSessionized)
         |GROUP BY p1, p2, section""".stripMargin,

    "pipe_sections" ->
      s"""SELECT p1, p2, section, segment_count, sum_sep_um,
         |  (sum_sep_um::DOUBLE / 1e6) / segment_count::DOUBLE AS average_separation_m,
         |  bundled_length_meters,
         |  raw_min_lon - 0.001 AS min_lon, raw_max_lon + 0.001 AS max_lon,
         |  raw_min_lat - 0.001 AS min_lat, raw_max_lat + 0.001 AS max_lat
         |FROM ($sqlKeptSections)""".stripMargin,

    "pipe_overlaps" ->
      s"""WITH sess AS ($sqlSessionized),
         |kept AS (SELECT p1, p2, section FROM ($sqlKeptSections)),
         |members AS (
         |  SELECT DISTINCT p, seg FROM (
         |    SELECT s.p1 AS p, s.s1 AS seg FROM sess s
         |    JOIN kept k ON s.p1 = k.p1 AND s.p2 = k.p2 AND s.section = k.section
         |    UNION ALL
         |    SELECT s.p2 AS p, s.s2 AS seg FROM sess s
         |    JOIN kept k ON s.p1 = k.p1 AND s.p2 = k.p2 AND s.section = k.section))
         |SELECT p, COUNT(1) AS bundled_segments,
         |  COUNT(1)::DOUBLE * 5.0 AS bundled_length_meters
         |FROM members GROUP BY p""".stripMargin,

    "pipe_top_sections" ->
      s"""SELECT p1, p2, section, segment_count, bundled_length_meters
         |FROM ($sqlKeptSections)
         |ORDER BY segment_count DESC, p1 ASC, p2 ASC, section ASC
         |LIMIT 5""".stripMargin,

    "pipe_totals" ->
      s"""SELECT
         |  (SELECT COUNT(1) FROM ($sqlKeptSections)) AS n_sections,
         |  (SELECT CAST(SUM(segment_count) AS BIGINT) FROM ($sqlKeptSections)) AS bundled_segments,
         |  (SELECT COUNT(1) FROM '${glob("segments")}') AS n_segments,
         |  (SELECT COUNT(1) FROM (SELECT DISTINCT p1, p2 FROM '${glob("pairs")}')) AS n_pair_groups,
         |  (SELECT CAST(SUM(CAST(ROUND(Shape_Length*1e6) AS BIGINT)) AS BIGINT)
         |     FROM '${glob("lengths")}') AS total_len_um,
         |  (SELECT CAST(SUM(segment_count) AS BIGINT) FROM ($sqlKeptSections))::DOUBLE * 5.0 AS total_bundled_m""".stripMargin,

    "pipe_effective_length" ->
      s"""WITH oriented AS (
         |  SELECT p1 AS p, s1 AS seg, p2 AS o FROM '${glob("pairs")}'
         |  UNION ALL
         |  SELECT p2 AS p, s2 AS seg, p1 AS o FROM '${glob("pairs")}'),
         |k AS (SELECT p, seg, COUNT(DISTINCT o) AS others FROM oriented GROUP BY p, seg),
         |eff AS (
         |  SELECT CAST(SUM(CAST(ROUND(5e6 / (COALESCE(k.others, 0) + 1)) AS BIGINT)) AS BIGINT) AS eff_um
         |  FROM '${glob("segments")}' sg
         |  LEFT JOIN k ON sg.p = k.p AND sg.s = k.seg),
         |segsums AS (SELECT p, COUNT(1) AS n_segs FROM '${glob("segments")}' GROUP BY p),
         |tails AS (
         |  SELECT CAST(SUM(CAST(ROUND(GREATEST(l.Shape_Length - COALESCE(ss.n_segs, 0) * 5.0, 0.0)*1e6) AS BIGINT)) AS BIGINT) AS tails_um
         |  FROM '${glob("lengths")}' l LEFT JOIN segsums ss ON l.id = ss.p)
         |SELECT eff_um, tails_um, eff_um + tails_um AS total_um,
         |  (eff_um + tails_um)::DOUBLE / 1e6 AS effective_m
         |FROM eff, tails""".stripMargin
  )
}
