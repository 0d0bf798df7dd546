package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.SimilarityOps

/** One-off param sweep: graph-ANN recall@10 vs brute force across
  * (seedK, beam, hops) at sf0.01 — sizes the serving rung's grid
  * toward the 0.7–0.8 SLO band the IVF rung serves at. Per-query
  * visited bound ≈ seedK·(1+K) + (hops−1)·beam·K embedding lookups
  * (K = out-degree 5), printed next to recall so the accuracy/cost
  * frontier is explicit. Dev tool, not part of the engine. */
object GraphSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.t(spark, "/root/testdata/sf0.01", "embeddings")
      .cache()
    val pred = SimilarityOps.servingQueryPred(emb)
    val exact = SimilarityOps.bruteForceTopK(emb, pred)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = emb.count()
    for (hops <- Seq(2, 3, 4); beam <- Seq(4, 8, 16);
         seeds <- Seq(2, 4, 8)) {
      val served = SimilarityOps.graphTopK(emb, pred, beam = beam,
          seedK = seeds, hops = hops)
        .select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = served.intersect(exact).size.toDouble / exact.size
      val visited = seeds * (1 + SimilarityOps.KnnK) +
        (hops - 1) * beam * SimilarityOps.KnnK
      println(f"SWEEP graph hops=$hops beam=$beam%2d seeds=$seeds " +
        f"visited~$visited%3d (${visited * 100.0 / n}%4.1f%% of corpus) " +
        f"recall=$recall%.3f")
    }
    spark.stop()
  }
}
