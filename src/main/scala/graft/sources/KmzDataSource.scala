package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.pipeline.RawFeature

/** DataSource V2 for KML/KMZ (SURVEY O1): `spark.read.format("kmz")
  * .load(pathOrDir)` — files are discovered on the driver, parsed on
  * EXECUTORS (one input partition per file, the natural parallelism for
  * a many-file survey corpus), with column pruning pushed into the
  * reader (a `select(name)` never materializes coordinate arrays).
  *
  * The fixed engine schema is the reference's feature superset
  * (SURVEY §1.2): name/objectid/geometry_type/coordinates plus the
  * `attrs` map preserving every SimpleData the reference drops.
  */
class KmzDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kmz"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KmzDataSource.Schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KmzTable(KmzDataSource.resolvePaths(properties.asScala.toMap))
  override def supportsExternalMetadata(): Boolean = true
}

object KmzDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("source_file", StringType, nullable = false),
    // file-local scan position (the reference's arrival order) — the
    // key KmlSource.splitMany turns into globally-unique ids
    StructField("seq", LongType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("objectid", StringType, nullable = false),
    StructField("geometry_type", StringType, nullable = false),
    StructField("coordinates", ArrayType(StructType(Seq(
      StructField("lon", DoubleType, nullable = false),
      StructField("lat", DoubleType, nullable = false))), containsNull = false),
      nullable = false),
    StructField("attrs", MapType(StringType, StringType), nullable = false)))

  /** Accepts `path` (file or directory) or the multi-path `paths` JSON
    * Spark emits for `.load(p1, p2, ...)`. */
  def resolvePaths(props: Map[String, String]): Seq[String] = {
    val raw: Seq[String] = props.get("paths") match {
      case Some(json) =>
        // minimal JSON string-array parse: ["a","b"]
        json.trim.stripPrefix("[").stripSuffix("]")
          .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
          .filter(_.nonEmpty).toSeq
      case None => props.get("path").toSeq
    }
    require(raw.nonEmpty, "kmz source requires a path")
    val conf = SparkSession.active.sessionState.newHadoopConf()
    raw.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val st = fs.getFileStatus(path)
      if (st.isDirectory)
        fs.listStatus(path).toSeq.map(_.getPath)
          .filter { f =>
            val n = f.getName.toLowerCase // x.KMZ == x.kmz
            n.endsWith(".kml") || n.endsWith(".kmz")
          }
          .map(_.toString).sorted
      else Seq(p)
    }
  }
}

class KmzTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"kmz(${paths.mkString(",")})"
  override def schema(): StructType = KmzDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KmzScanBuilder(paths)
}

class KmzScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = KmzDataSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new KmzScan(paths, required)
}

class KmzScan(paths: Seq[String], required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => KmzInputPartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new KmzReaderFactory(required.fieldNames)
}

case class KmzInputPartition(path: String) extends InputPartition

class KmzReaderFactory(requiredCols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KmzPartitionReader(partition.asInstanceOf[KmzInputPartition].path, requiredCols)
}

/** Executor-side reader: streams one KML/KMZ file through KmlParser and
  * emits only the pruned columns. */
class KmzPartitionReader(path: String, requiredCols: Array[String])
    extends PartitionReader[InternalRow] {

  private lazy val features: Iterator[RawFeature] = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(hPath)
    val bytes = try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
    KmlParser.parseBytes(path, bytes).iterator
  }
  private var current: RawFeature = _
  private var seq = -1L

  override def next(): Boolean =
    if (features.hasNext) { current = features.next(); seq += 1; true }
    else false

  override def get(): InternalRow = {
    val values = requiredCols.map {
      case "source_file" => UTF8String.fromString(path)
      case "seq" => seq
      case "name" => UTF8String.fromString(current.name)
      case "objectid" => UTF8String.fromString(current.objectid)
      case "geometry_type" => UTF8String.fromString(current.geometryType)
      case "coordinates" =>
        new GenericArrayData(current.coordinates.map(c =>
          InternalRow(c.lon, c.lat)).toArray[Any]): ArrayData
      case "attrs" =>
        ArrayBasedMapData(
          current.attrs.keys.map(k => UTF8String.fromString(k)).toArray[Any],
          current.attrs.values.map(v => UTF8String.fromString(v)).toArray[Any])
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def close(): Unit = ()
}
