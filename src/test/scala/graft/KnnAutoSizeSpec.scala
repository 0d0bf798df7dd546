package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SimilarityOps

/** Corpus-driven coarse-cell sizing (`autoCentroids`): the round-10
  * close of the measured constant-K scale hazard (emb_knn_graph's 48×
  * sf1 slope at pinned K=64; KnnScaleProbe). Pins three things:
  * the sizing formula itself; that the AUTO default resolves to the
  * historical K=64 on the committed gate corpora (sf0.01/sf0.1), so
  * every green CORRECTNESS hash is unchanged by construction; and
  * that on a 10× corpus the auto default actually bounds cell
  * occupancy and holds neighbor recall vs the pinned K it replaces. */
class KnnAutoSizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("autoCentroids: max(64, min(ceil(n/32), 8·2^⌊bitlen/2⌋)), monotone, historical-compatible") {
    assert(SimilarityOps.autoCentroids(0) == 64)
    assert(SimilarityOps.autoCentroids(500) == 64)   // sf0.01 → unchanged K
    assert(SimilarityOps.autoCentroids(2000) == 64)  // sf0.1 → unchanged K
    assert(SimilarityOps.autoCentroids(2048) == 64)  // fixed-cell arm boundary
    assert(SimilarityOps.autoCentroids(5000) == 157) // fixed-cell arm
    assert(SimilarityOps.autoCentroids(20000) == 625) // sf1: measured-best regime
    assert(SimilarityOps.autoCentroids(1048576) == 8192) // √n asymptote
    // monotone in n; never below the floor
    val ks = Seq(1L, 100L, 3000L, 50000L, 1000000L, 100000000L)
      .map(SimilarityOps.autoCentroids)
    assert(ks == ks.sorted && ks.forall(_ >= 64))
    // above the crossover the √n asymptote governs: K inside the
    // [4√n, 16√n] power-of-two band — the measured β/α ≈ 24
    // candidate-vs-assignment row-cost ratio puts the balance point
    // K* ≈ 10·√n, and the asymptote keeps total work Θ(n^1.5)
    for (n <- Seq(1000000L, 10000000L, 1000000000L)) {
      val k = SimilarityOps.autoCentroids(n).toLong
      val r = math.sqrt(n.toDouble)
      assert(k >= 4 * r - 1 && k <= 16 * r + 2, s"n=$n k=$k sqrt=$r")
    }
    // below it the fixed-cell arm keeps E[|cell|] ≈ 32 (recall-friendly
    // small-corpus cells): K·32 covers n within one cell
    for (n <- Seq(3000L, 5000L, 8000L)) {
      val k = SimilarityOps.autoCentroids(n).toLong
      assert(k * 32 >= n && (k - 1) * 32 < n, s"n=$n k=$k")
    }
  }

  test("auto default ≡ pinned K=64 on the sf0.01 gate corpus (hash-stability)") {
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.t(spark, "/root/testdata/sf0.01", "embeddings")
    val autoG = SimilarityOps.knnGraph(emb).orderBy("src", "rank").collect()
    val pinned = SimilarityOps.knnGraph(emb, nCentroids = 64).orderBy("src", "rank").collect()
    assert(autoG.length == pinned.length && autoG.length > 0)
    assert(autoG.sameElements(pinned))
    val autoS = SimilarityOps.semDedup(emb).orderBy("vec_id").collect()
    val pinnedS = SimilarityOps.semDedup(emb, nCentroids = 64).orderBy("vec_id").collect()
    assert(autoS.sameElements(pinnedS))
  }

  /** 10× replica of the sf0.01 embeddings with disjoint id ranges —
    * the Sf1Probe replication shape, small enough for a unit test. */
  private def replica10x = {
    val base = Tables.t(spark, "/root/testdata/sf0.01", "embeddings")
    (0 until 10).map(i => base.withColumn("vec_id", col("vec_id") + lit(i * 100000L)))
      .reduce(_ unionByName _)
  }

  test("10× corpus: auto K kicks in and bounds cell occupancy") {
    val rep = replica10x // 5000 vectors → autoCentroids = 157
    assert(SimilarityOps.autoCentroids(5000) == 157)
    // semDedup's output carries the cell assignment — measure occupancy
    val cells = SimilarityOps.semDedup(rep).groupBy("cid").count()
      .agg(max("count").as("mx"), countDistinct("cid").as("k")).collect()(0)
    val (mx, k) = (cells.getLong(0), cells.getLong(1))
    assert(k > 64, s"auto-K did not engage: only $k cells")
    // mean occupancy ≈ n/K ≈ 32; replica corpora put all 10 copies of
    // a vector in one cell, so allow generous but BOUNDED skew — the
    // point is no cell holds an O(n) share like pinned K=64 would
    assert(mx <= 16L * (5000L / 157L + 1),
      s"cell occupancy unbounded: max=$mx")
  }

  test("10× corpus: auto-K knnGraph holds recall vs pinned K=64") {
    val rep = replica10x.cache()
    rep.count()
    // exact 5-NN for a 2% anchor sample via brute force
    val anchors = rep.filter(col("vec_id") % 5000 === 0) // 10 per replica → 100
    val nrm = (c: org.apache.spark.sql.Column) =>
      sqrt(aggregate(c, lit(0.0), (a, x) => a + x.cast("double") * x.cast("double")))
    val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    val exact = anchors.select(col("vec_id").as("src"), col("embedding").as("e1"))
      .join(rep.select(col("vec_id").as("dst"), col("embedding").as("e2")),
        col("src") =!= col("dst"))
      .withColumn("sim", dot(col("e1"), col("e2")) / (nrm(col("e1")) * nrm(col("e2"))))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("src")
          .orderBy(col("sim").desc, col("dst").asc)))
      .filter(col("rank") <= 5).select("src", "dst")
    val exactSet = exact.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(kCent: Int): Double = {
      val g = SimilarityOps.knnGraph(rep, nCentroids = kCent)
        .join(anchors.select(col("vec_id").as("src")), "src")
        .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (g & exactSet).size.toDouble / exactSet.size
    }
    val rAuto = recallOf(0)   // sentinel → autoCentroids(5000) = 157
    val rPinned = recallOf(64)
    info(f"recall@5 on 100 anchors: auto-K=$rAuto%.3f pinned-64=$rPinned%.3f")
    // auto must not trade the measured speedup for a recall collapse:
    // allow a small quantization delta vs the denser pinned cells
    assert(rAuto >= rPinned - 0.10, f"auto recall $rAuto%.3f vs pinned $rPinned%.3f")
    assert(rAuto >= 0.5, f"absolute recall floor violated: $rAuto%.3f")
    rep.unpersist()
  }
}
