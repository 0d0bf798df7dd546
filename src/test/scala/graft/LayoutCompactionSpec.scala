package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.LayoutOps

/** File-count mechanics of [[LayoutOps.compactFiles]] — the part the
  * DuckDB oracle can't see (it checks the data is lossless; this
  * checks the files actually merged and the per-file cap holds). */
class LayoutCompactionSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private val scratch =
    s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_compact_spec"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("compaction merges 64 fragments into ceil(rows/target) capped files") {
    spark.sparkContext.setLogLevel("WARN")
    val orders = Tables.t(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"))
    val rows = orders.count()

    orders.repartition(64).write.mode("overwrite").parquet(s"$scratch/in")
    val target = math.max(rows / 3, 1L) // force ~3-4 output files
    val (before, after) =
      LayoutOps.compactFiles(spark, s"$scratch/in", s"$scratch/out", target)

    assert(before == 64, s"fragmented input should be 64 files, was $before")
    val expectedParts = math.ceil(rows.toDouble / target).toInt
    // repartition(n) gives n partitions; maxRecordsPerFile may split a
    // partition that exceeds the cap, so allow [expected, 2*expected]
    assert(after >= expectedParts && after <= 2 * expectedParts,
      s"expected ~$expectedParts compacted files, got $after")
    assert(after < before, s"compaction did not shrink: $before -> $after")

    val back = spark.read.parquet(s"$scratch/out")
    assert(back.count() == rows, "row count changed through compaction")
    // no file exceeds the cap: per-file row counts via input_file_name
    val maxPerFile = back.groupBy(input_file_name()).count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxPerFile <= target, s"file over cap: $maxPerFile > $target")
  }
}
