package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SimilarityOps

/** Pathological-vector hardening across the similarity surface: NULL
  * embeddings, zero vectors (norm 0 → ANSI DIVIDE_BY_ZERO without the
  * guard) and NaN vectors (Spark's total order ranks NaN GREATER than
  * every number, so an unscreened NaN similarity outranks every real
  * neighbor). Contract: such rows can neither query, match, nor train
  * a centroid — every operator behaves EXACTLY as if they were absent.
  */
class SimilarityPathologySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  /** 40 healthy deterministic vectors + the three pathology classes */
  private def healthy(): DataFrame = {
    import spark.implicits._
    (0 until 40).map { i =>
      (i.toLong, Some(v((0 until 8).map(j =>
        ((i * 31 + j * 17) % 13) - 6.0 + (if (i % 13 == 0 && j == 0) 0.5 else 0.0)): _*)), i % 4L)
    }.toDF("vec_id", "embedding", "label")
  }

  private def pathological(): DataFrame = {
    import spark.implicits._
    Seq[(Long, Option[Array[Float]], Long)](
      (100L, None, 9L),
      (101L, Some(v(0, 0, 0, 0, 0, 0, 0, 0)), 9L),
      (102L, Some(Array(Float.NaN, 2f, 2f, 2f, 2f, 2f, 2f, 2f)), 9L)
    ).toDF("vec_id", "embedding", "label")
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("bruteForceTopK: pathological rows neither crash, query, nor match") {
    spark.sparkContext.setLogLevel("WARN")
    val mixed = healthy().unionByName(pathological())
    // query predicate INCLUDES a pathological id on purpose
    val pred = col("vec_id") % 10 === 0 // 0,10,20,30 healthy + 100 null
    val got = rows(SimilarityOps.bruteForceTopK(mixed, pred, k = 5))
    val want = rows(SimilarityOps.bruteForceTopK(healthy(), pred, k = 5))
    assert(got == want)
    assert(!got.exists(r => r.contains("[100,") || r.contains(",100,") ||
      r.contains(",101,") || r.contains(",102,")), got.take(5))
  }

  test("ivfTopK (sampled + trained centroids): identical to the healthy-only corpus") {
    val mixed = healthy().unionByName(pathological())
    val pred = col("vec_id") % 10 === 0
    val got = rows(SimilarityOps.ivfTopK(mixed, pred, k = 5, nCentroids = 4, nProbe = 2))
    val want = rows(SimilarityOps.ivfTopK(healthy(), pred, k = 5, nCentroids = 4, nProbe = 2))
    assert(got == want)
    // trained path: pathological rows must not poison Lloyd iterations
    val cg = SimilarityOps.kmeansCentroids(mixed, k = 4, iters = 2)
    val cw = SimilarityOps.kmeansCentroids(healthy(), k = 4, iters = 2)
    assert(rows(cg.select("cid")) == rows(cw.select("cid")))
    val gotT = rows(SimilarityOps.ivfTopK(mixed, pred, k = 5, nProbe = 2,
      centroids = Some(cg)))
    val wantT = rows(SimilarityOps.ivfTopK(healthy(), pred, k = 5, nProbe = 2,
      centroids = Some(cw)))
    assert(gotT == wantT)
  }

  test("a degenerate caller-supplied centroid is screened, not a crash") {
    import spark.implicits._
    val cents = Seq(
      (0L, v(1, 1, 1, 1, 1, 1, 1, 1), math.sqrt(8.0)),
      (1L, v(0, 0, 0, 0, 0, 0, 0, 0), 0.0) // zero-norm: must drop out
    ).toDF("cid", "c_emb", "c_nrm")
    val out = SimilarityOps.ivfTopK(healthy(), col("vec_id") === 0, k = 3,
      nProbe = 2, centroids = Some(cents))
    // everything lands in the single healthy cell; ranking still works
    assert(out.count() == 3)
  }
}
