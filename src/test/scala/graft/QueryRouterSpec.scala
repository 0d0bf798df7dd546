package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SimilarityOps

/** Scatter-gather query router (`serve_query_router`): probe ranks are
  * dense and ordered by centroid cosine, cell sizes are the true
  * assignment counts, cum_candidates is the exact running rerank cost,
  * and probing ALL cells accounts for the whole corpus — the router's
  * cost meter can't under- or over-bill a gather. */
class QueryRouterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** vec 0 ≈ x-axis centroid, vec 1 ≈ y-axis centroid (first-K
    * convention), then 4 corpus vectors near x and 2 near y. */
  private def embs = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    Seq(
      0L -> Array(1.0f, 0.0f),
      1L -> Array(0.0f, 1.0f),
      10L -> Array(0.9f, 0.1f), 11L -> Array(0.8f, 0.2f),
      12L -> Array(0.95f, 0.05f), 13L -> Array(0.7f, 0.3f),
      20L -> Array(0.1f, 0.9f), 21L -> Array(0.2f, 0.8f)
    ).toDF("vec_id", "embedding")
  }

  private def route(nProbe: Int) =
    SimilarityOps.queryRouter(embs, col("vec_id") >= 10L && col("vec_id") < 12L,
      nCentroids = 2, nProbe = nProbe).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("rank-1 probe is the max-cosine cell; cell sizes are assignment counts") {
    val out = route(1)
    // queries 10 and 11 both sit in the x-cell (cid 0), which owns
    // centroid 0 itself + vecs 10..13 = 5 members
    assert(out.toSet == Set((10L, 1L, 0L, 5L, 5L), (11L, 1L, 0L, 5L, 5L)))
  }

  test("probing every cell accounts for the entire corpus, ranks dense, cum exact") {
    val out = route(2)
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet == Set(10L, 11L))
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == Seq(1L, 2L), s"dense ranks for $q")
      assert(sorted.map(_._3).toSeq == Seq(0L, 1L), s"x-cell first for $q")
      // running sum reproduces cell sizes; final total = whole corpus (8)
      assert(sorted.map(_._4).toSeq == Seq(5L, 3L))
      assert(sorted.map(_._5).toSeq == Seq(5L, 8L))
    }
  }
}
