package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.SimilarityOps

/** One-off param sweep for the LAYERED graph serve ([[SimilarityOps
  * .graphLayeredSearch]]): recall@10 vs brute force across
  * (seedK, beam, hops) with the measured EXACT per-query scanned
  * fraction (distinct scored nodes / corpus) — the number the r14
  * verdict's "≥0.8 recall at ≲5 % scanned" target grades. The flat
  * serve's ladder prints first for reference. Dev tool, not part of
  * the engine. */
object LayerSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = (if (sfDir == "clustered") {
      // structured corpus: 16 well-separated clusters — what a real
      // embedding corpus looks like (the driver's synthetic table is
      // iid noise, where no sublinear index can beat scan-fraction)
      import spark.implicits._
      val rnd = new scala.util.Random(42)
      val dim = 64; val nC = 16; val nPer = 300
      val centers = Array.fill(nC)(Array.fill(dim)(rnd.nextGaussian()))
      (0 until nC * nPer).map { i =>
        val c = i % nC
        val v = centers(c).map(x => (x + 0.45 * rnd.nextGaussian()).toFloat)
        (i.toLong, v, c.toLong)
      }.toDF("vec_id", "embedding", "label")
    } else if (sfDir == "hier") {
      // recursively structured corpus (the regime proximity graphs
      // are built for): 3 levels of nested clusters, shrinking scale
      import spark.implicits._
      val rnd = new scala.util.Random(42)
      val dim = 64; val b = 6; val nPer = 14
      val l1 = Array.fill(b)(Array.fill(dim)(rnd.nextGaussian()))
      val l2 = l1.flatMap(c => Array.fill(b)(c.map(_ + 0.6 * rnd.nextGaussian())))
      val l3 = l2.flatMap(c => Array.fill(b)(c.map(_ + 0.4 * rnd.nextGaussian())))
      val pts = l3.zipWithIndex.flatMap { case (c, leaf) =>
        (0 until nPer).map { j =>
          (c.map(x => (x + 0.12 * rnd.nextGaussian()).toFloat), leaf.toLong)
        }
      }
      // permute ids: the first-K entry convention assumes id-random
      // corpora (true of the driver tables)
      val perm = rnd.shuffle(pts.indices.toList)
      perm.zipWithIndex.map { case (p, id) =>
        (id.toLong, pts(p)._1, pts(p)._2)
      }.toDF("vec_id", "embedding", "label")
    } else graft.Tables.t(spark, sfDir, "embeddings")).cache()
    val pred = SimilarityOps.servingQueryPred(emb)
    val exact = SimilarityOps.bruteForceTopK(emb, pred)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = emb.count()
    val nQ = emb.filter(pred).count()
    println(s"corpus $n, queries $nQ, 5% = ${n / 20} nodes/query")
    // flat baseline: entry scan = autoCentroids(n) scored + the beam
    val kCent = SimilarityOps.autoCentroids(n)
    for (beam <- Seq(4, 16)) {
      val served = SimilarityOps.graphTopK(emb, pred, beam = beam)
        .select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = served.intersect(exact).size.toDouble / exact.size
      val visited = kCent + 2 * (1 + SimilarityOps.KnnK) +
        2 * beam * SimilarityOps.KnnK
      println(f"FLAT beam=$beam%2d visited~$visited%4d " +
        f"(${visited * 100.0 / n}%4.1f%%) recall=$recall%.3f")
    }
    // edge-quality audit: committed knnGraph edges vs exact top-K
    val exactEdges = SimilarityOps.bruteForceTopK(emb, lit(true),
        SimilarityOps.KnnK)
      .select(col("q_id").as("src"), col("n_id").as("dst")).cache()
    val builtEdges = SimilarityOps.knnGraph(emb).select("src", "dst").cache()
    val inter = builtEdges.join(exactEdges, Seq("src", "dst")).count()
    println(f"EDGEQ built=${builtEdges.count()} exact=${exactEdges.count()} " +
      f"overlap=$inter (${inter * 100.0 / exactEdges.count()}%4.1f%% edge recall)")
    for (useExact <- Seq(false, true); lh <- Seq(2); hops <- Seq(2, 3);
         beam <- Seq(4, 8); seeds <- Seq(2, 4)) {
      val builder: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        if (useExact) m => SimilarityOps.bruteForceTopK(m, lit(true),
            SimilarityOps.LayerK)
          .select(col("q_id").as("src"), col("n_id").as("dst"))
        else m => SimilarityOps.knnGraph(m, SimilarityOps.LayerK)
      val (topk, visited) = SimilarityOps.graphLayeredSearch(
        emb, pred, 10, beam, seeds, hops, SimilarityOps.GraphLayers, builder,
        layerHops = lh)
      val served = topk.select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = served.intersect(exact).size.toDouble / exact.size
      val scanned = visited.count().toDouble / nQ
      println(f"LAYER exact=$useExact lh=$lh hops=$hops beam=$beam%2d seeds=$seeds " +
        f"scanned=$scanned%6.1f/q (${scanned * 100.0 / n}%4.1f%%) " +
        f"recall=$recall%.3f")
    }
    spark.stop()
  }
}
