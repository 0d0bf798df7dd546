package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{PipelineRow, PlacemarkRow, RawFeature}

/** KML/KMZ → Dataset ingestion (SURVEY O1-O4).
  *
  * Two paths:
  *  - [[read]]: single file, parsed on the driver (reference-scale inputs
  *    are ≤ a few hundred MB of XML; the parse is a streaming scan).
  *  - [[readMany]]: a directory/glob of KMZ/KML files parsed on
  *    EXECUTORS via `spark.read.format("binaryFile")` + flatMap — the
  *    100 TB path: each file is one task, no driver bottleneck.
  *
  * Classification + fallback semantics live in [[KmlParser]].
  */
object KmlSource {

  /** All features of one file as a Dataset (driver-side parse). */
  def read(spark: SparkSession, path: String): Dataset[RawFeature] = {
    import spark.implicits._
    spark.createDataset(KmlParser.parseFile(path).toList)
  }

  /** Distributed parse of many KML/KMZ files. `id`s are assigned
    * per-file (arrival order within the file, like the reference's
    * single-file counter). */
  def readMany(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.km[lz]")
      .load(pathGlob)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        KmlParser.parseBytes(path, bytes).map(f => (path, f))
      }
      .toDF("source_file", "feature")
      .select(col("source_file"), col("feature.*"))
  }

  /** Route features into the two tables of the reference's data model
    * (reference :110-128): pipelines keep arrival order as `id`. */
  def split(features: Dataset[RawFeature]): (Dataset[PipelineRow], Dataset[PlacemarkRow]) = {
    val spark = features.sparkSession
    import spark.implicits._
    // Arrival-order ids: the reference assigns ids by scan order of the
    // single input file. Features come from one driver-side parse, so a
    // local index is faithful; readMany callers key by (source_file, id).
    val collected = features.collect()
    var pipeCount = 0
    var pmCount = 0
    val pipes = List.newBuilder[PipelineRow]
    val pms = List.newBuilder[PlacemarkRow]
    collected.foreach { f =>
      if (f.geometryType == "LineString") {
        pipes += PipelineRow(pipeCount, f.objectid, f.name, f.coordinates)
        pipeCount += 1
      } else {
        pmCount += 1
        val pid = if (f.objectid != "N/A") f.objectid else s"PM_$pmCount"
        pms += PlacemarkRow(pid, f.name, 1)
      }
    }
    (spark.createDataset(pipes.result()), spark.createDataset(pms.result()))
  }
}
