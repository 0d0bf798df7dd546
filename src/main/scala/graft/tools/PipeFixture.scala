package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import graft.pipeline.Analyzer
import graft.sources.KmlSource

/** One-time dumper for the pipeline-survey driver queries
  * ([[graft.queries.PipelineQueries]]): runs the compat-mode engine on
  * the reference's shipped fixture KMZ and writes the O5/O6/O7-O10
  * intermediates (lengths / segments / pairs) as single-file parquet
  * under fixtures/pipe. The committed parquet serves two roles:
  *  - regression pin: recompute-from-KMZ queries must hash-match it;
  *  - oracle input: the sessionization/aggregation queries read it as
  *    INPUT so DuckDB can recompute O11-O17 independently in SQL.
  */
object PipeFixture {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = graft.queries.PipelineQueries.FixtureDir
    val analyzer = new Analyzer() // compat-mode defaults, like BASELINE.md
    val (pipelines, _) = KmlSource.split(
      KmlSource.read(spark, graft.queries.PipelineQueries.FixtureKmz))

    val lengths = analyzer.pipelineLengths(pipelines)
    lengths.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$out/lengths.parquet")

    val segs = analyzer.segments(pipelines)
    segs.toDF().coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$out/segments.parquet")

    val pairs = analyzer.parallelPairs(analyzer.segments(pipelines))
    pairs.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$out/pairs.parquet")

    println(s"[fixture] lengths=${spark.read.parquet(s"$out/lengths.parquet").count()} " +
      s"segments=${spark.read.parquet(s"$out/segments.parquet").count()} " +
      s"pairs=${spark.read.parquet(s"$out/pairs.parquet").count()}")
    spark.stop()
  }
}
