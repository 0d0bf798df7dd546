package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SimilarityOps

/** kNN label propagation: seed clamping, synchronous-round depth, and
  * chain propagation on a constructed geometry. */
class LabelPropSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val emb = {
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.t(spark, "/root/testdata/sf0.01", "embeddings")
  }

  test("seeds are clamped at round 0 with their true label") {
    val trueLabel = emb.select(col("vec_id"), col("label").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val out = SimilarityOps.knnLabelProp(emb, col("vec_id") % 5 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val seeds = out.filter(_._1 % 5 == 0)
    assert(seeds.nonEmpty)
    seeds.foreach { case (id, lbl, round) =>
      assert(round == 0L, s"seed $id at round $round")
      assert(lbl == trueLabel(id), s"seed $id relabeled")
    }
    val nonSeeds = out.filter(_._1 % 5 != 0)
    assert(nonSeeds.forall(_._3 >= 1L))
    info(s"${out.length} labeled total; rounds histogram: " +
      out.groupBy(_._3).view.mapValues(_.length).toMap.toSeq.sorted.mkString(", "))
  }

  test("labels walk a chain one hop per synchronous round") {
    import spark.implicits._
    // three ANGULARLY separated clusters (cosine ignores magnitude):
    // A at 0°, B at 35°, C at 80° — B is nearer A than C, C's nearest
    // foreign cluster is B; with k=3 each node keeps its 2 clustermates
    // + 1 cross-cluster neighbor, so labels must walk A→B→C
    def v(deg: Double, i: Int): Array[Float] = {
      val t = math.toRadians(deg + 0.1 * (i % 3))
      Array(math.cos(t).toFloat, math.sin(t).toFloat, 0f, 0f)
    }
    val rows =
      (0 to 2).map(i => (i.toLong, v(0.0, i), 7)) ++        // cluster A (seed 0)
      (10 to 12).map(i => (i.toLong, v(35.0, i), 8)) ++     // cluster B
      (20 to 22).map(i => (i.toLong, v(80.0, i), 9))        // cluster C
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.knnLabelProp(df, col("vec_id") === 0L,
        rounds = 3, k = 3, nCentroids = 1, nProbes = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // single centroid => one cell => complete candidate graph, but
    // each node keeps only its k=3 nearest: A-B adjacent, B-C adjacent
    val byId = out.map(t => (t._1, (t._2, t._3))).toMap
    assert(byId(0L) == ((7L, 0L)))
    (1 to 2).foreach(i => assert(byId(i.toLong)._1 == 7L))
    // everything reachable adopts the only circulating label (7)
    out.foreach { case (_, lbl, _) => assert(lbl == 7L) }
    // rounds are monotone along the chain: B's earliest labeling round
    // is strictly before C's earliest
    val bMin = (10 to 12).flatMap(i => byId.get(i.toLong)).map(_._2).min
    val cMin = (20 to 22).flatMap(i => byId.get(i.toLong)).map(_._2).min
    assert(bMin < cMin, s"cluster B round $bMin vs C $cMin")
  }

  test("result is partitioning-invariant") {
    val a = SimilarityOps.knnLabelProp(emb, col("vec_id") % 5 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = SimilarityOps.knnLabelProp(emb.repartition(7, col("vec_id")),
        col("vec_id") % 5 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }
}
