package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory is assembled from per-domain modules:
  *   - [[graft.queries.Relational]] — generic relational surface (SURVEY §2.3)
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Extras.queries ++
      graft.queries.Coverage.queries ++
      graft.ops.TextOps.queries ++
      graft.ops.DedupOps.queries ++
      graft.ops.SimilarityOps.queries ++
      graft.ops.StreamOps.queries ++
      graft.ops.MultimodalOps.queries ++
      graft.ops.TemporalOps.queries ++
      graft.ops.TableOps.queries ++
      graft.ops.QualityOps.queries ++
      graft.ops.GraphOps.queries ++
      graft.ops.CurationOps.queries ++
      graft.ops.LayoutOps.queries ++
      graft.ops.SkylineOps.queries ++
      graft.queries.PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.Extras.oracle ++
      graft.queries.Coverage.oracle ++
      graft.ops.TextOps.oracle ++
      graft.ops.DedupOps.oracle ++
      graft.ops.SimilarityOps.oracle ++
      graft.ops.StreamOps.oracle ++
      graft.ops.MultimodalOps.oracle ++
      graft.ops.TemporalOps.oracle ++
      graft.ops.TableOps.oracle ++
      graft.ops.QualityOps.oracle ++
      graft.ops.GraphOps.oracle ++
      graft.ops.CurationOps.oracle ++
      graft.ops.LayoutOps.oracle ++
      graft.ops.SkylineOps.oracle ++
      graft.queries.PipelineQueries.oracle
}
