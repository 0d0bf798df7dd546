package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SimilarityOps

/** kNN-graph construction: edge-set recall vs the exact graph (the
  * quantity the DuckDB hash-compare can't express) and the multi-probe
  * boundary-recall claim. */
class KnnGraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val emb = {
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.t(spark, "/root/testdata/sf0.01", "embeddings")
  }

  /** Exact kNN graph by brute force — every pair scored. */
  private lazy val exactEdges: Set[(Long, Long)] = {
    val vecs = emb.select(col("vec_id"), col("embedding"),
      SimilarityOps.norm(col("embedding")).as("nrm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy(col("sim").desc, col("dst").asc)
    vecs.select(col("vec_id").as("src"), col("embedding").as("e1"), col("nrm").as("nrm1"))
      .join(vecs.select(col("vec_id").as("dst"), col("embedding").as("e2"),
        col("nrm").as("nrm2")), col("src") =!= col("dst"))
      .withColumn("sim", SimilarityOps.dot(col("e1"), col("e2")) /
        (col("nrm1") * col("nrm2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= SimilarityOps.KnnK)
      .select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def edgeSet(nProbes: Int): Set[(Long, Long)] =
    SimilarityOps.knnGraph(emb, nProbes = nProbes)
      .select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("multi-probe (P=2) edge recall vs exact graph; P=2 >= P=1") {
    val p1 = edgeSet(1); val p2 = edgeSet(2)
    val r1 = p1.intersect(exactEdges).size.toDouble / exactEdges.size
    val r2 = p2.intersect(exactEdges).size.toDouble / exactEdges.size
    info(f"kNN-graph edge recall: P=1 $r1%.3f, P=2 $r2%.3f " +
      f"(k=${SimilarityOps.KnnK}, auto-sized cells)")
    assert(r2 >= r1, "multi-probe can only add candidate cells")
    assert(r2 >= 0.35, f"P=2 recall $r2%.3f")
  }

  test("graph shape: no self edges, contiguous ranks from 1, <= k per node") {
    val rows = SimilarityOps.knnGraph(emb)
      .select("src", "dst", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall { case (s, d, _) => s != d })
    rows.groupBy(_._1).foreach { case (_, es) =>
      val ranks = es.map(_._3).sorted.toSeq
      assert(ranks.length <= SimilarityOps.KnnK)
      assert(ranks == (1L to ranks.length.toLong))
    }
  }
}
