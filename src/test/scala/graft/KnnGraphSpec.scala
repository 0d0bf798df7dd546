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

  test("per-cell candidate cap: default is inactive at gate scale; a tiny " +
    "cap keeps EXACTLY the first `cap` members per cell in the knncap hash " +
    "order, and every edge's dst is a kept member of a shared cell") {
    val default = edgeSet(SimilarityOps.KnnProbes)
    val uncapped = SimilarityOps.knnGraph(emb, cellCap = Int.MaxValue)
      .select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(default == uncapped,
      "KnnCellCap must sit above every gate corpus's max cell membership")
    // recompute the capped member sets locally: same md5-hash order
    val cap = 3
    val assign = SimilarityOps.knnGraph(emb, cellCap = cap)
    def hash60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 15), 16) % graft.ops.TextOps.HashMod
    }
    // cell assignment replicated through the public probe path: P=2
    // cells per vector, first-K centroids — read it off the uncapped
    // build's own candidate structure instead: a dst is legal iff it
    // shares a cell with src AND ranks <= cap in that cell
    val kCent = SimilarityOps.autoCentroids(emb.count())
    val asg = {
      val cents = emb.filter(col("vec_id") < kCent)
        .select(col("vec_id").as("cid"), col("embedding").as("c_emb"),
          SimilarityOps.norm(col("embedding")).as("c_nrm"))
      val vecs = emb.select(col("vec_id"), col("embedding"),
        SimilarityOps.norm(col("embedding")).as("nrm"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(col("c_sim").desc, col("cid").asc)
      vecs.join(cents, lit(true))
        .withColumn("c_sim", SimilarityOps.dot(col("embedding"), col("c_emb"))
          / (col("nrm") * col("c_nrm")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= SimilarityOps.KnnProbes)
        .select("vec_id", "cid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    }
    val byCell = asg.groupBy(_._2).map { case (cid, ms) =>
      cid -> ms.map(_._1).sortBy(v => (hash60(s"knncap:$v"), v)).take(cap).toSet
    }
    val cellsOf = asg.groupBy(_._1).map { case (v, cs) => v -> cs.map(_._2).toSet }
    val capped = assign.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.nonEmpty)
    capped.foreach { case (s, d) =>
      assert(cellsOf(s).exists(c => byCell(c).contains(d)),
        s"edge ($s,$d): dst must be a kept (top-$cap by knncap hash) member " +
          "of one of src's cells")
    }
    assert(capped.toSet.size < uncapped.size,
      "a tiny cap must actually shrink the candidate menu at this corpus")
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
