package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the constant-K vs auto-K scaling behavior of the
  * cluster-scoped ANN family on the sf1 (10×) replica corpus.
  *
  * Round-9 finding: emb_knn_graph's 48× sf1 slope was a CONSTANT-K
  * artifact — K pinned at the sf0.1 value densifies every cell 10× on
  * 10× data, and the in-cell candidate join does ~100× work. Round 10
  * closes the loop: `nCentroids` now DEFAULTS to corpus-driven sizing
  * (`SimilarityOps.autoCentroids`, K = max(64, ⌈N/32⌉) — the FAISS
  * nlist ≈ N/cell convention), so the bounded-cell regime needs no
  * hand-picked parameter. This tool times sf1 knnGraph at K=64 (the
  * old pinned default) vs the auto default (resolves to 625 at sf1's
  * 20 000 vectors), min-of-2 warm, and prints the edge-count overlap
  * of the two graphs so the recall story is measured, not asserted.
  */
object KnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)")
      .write.format("noop").mode("overwrite").save()
    val emb = graft.Tables.t(spark, "/tmp/graft_sf1", "embeddings")
    val n = emb.count()
    val autoK = graft.ops.SimilarityOps.autoCentroids(n)
    println(s"[knnscale] sf1 corpus n=$n -> autoCentroids=$autoK")
    for ((label, kCent) <- Seq("pinned 64" -> 64, s"auto $autoK" -> 0)) {
      def run(): Double = {
        val t0 = System.nanoTime()
        graft.ops.SimilarityOps.knnGraph(emb, nCentroids = kCent)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm
      val t = math.min(run(), run())
      println(f"[knnscale] sf1 K=$label%10s: $t%7.2f s (min of 2 warm)")
    }
    // quality check: a 5-NN edge is "true" if it survives exhaustive
    // ranking; rather than brute-force 20k² here, compare the two
    // graphs' edge agreement — auto-K trades candidate breadth for
    // cell purity, so large agreement + the spec-level recall audit
    // (KnnAutoSizeSpec) bound the quality delta
    val g64 = graft.ops.SimilarityOps.knnGraph(emb, nCentroids = 64)
      .select("src", "dst")
    val gAuto = graft.ops.SimilarityOps.knnGraph(emb)
      .select("src", "dst")
    val both = g64.intersect(gAuto).count()
    val n64 = g64.count(); val nAuto = gAuto.count()
    println(f"[knnscale] edges: K=64 $n64, auto $nAuto, agree $both " +
      f"(${both * 100.0 / math.max(n64, 1)}%.1f%% of pinned)")
    spark.stop()
  }
}
