package graft.tools

import org.apache.spark.sql.SparkSession

/** Demonstrates that emb_knn_graph's sf1 slope (48× on 10× data in the
  * BENCH_SF1 probe) is a CONSTANT-K artifact, not a broken plan: the
  * probe replicates embeddings 10× with the coarse-cell count K pinned
  * at the sf0.1 value, so every cell densifies 10× and the in-cell
  * candidate join does ~100× work. The standard IVF practice — K grows
  * with the corpus so E[|cell|] stays constant — restores near-linear
  * wall time with NO code change (K is a parameter). This tool times
  * sf1 knnGraph at K=64 (the pinned probe value) vs K=640 (scaled),
  * min-of-2 warm.
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
    for (kCent <- Seq(64, 640)) {
      def run(): Double = {
        val t0 = System.nanoTime()
        graft.ops.SimilarityOps.knnGraph(emb, nCentroids = kCent)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm
      val t = math.min(run(), run())
      println(f"[knnscale] sf1 K=$kCent%4d: $t%7.2f s (min of 2 warm)")
    }
  }
}
