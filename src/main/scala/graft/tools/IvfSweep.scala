package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.SimilarityOps

/** One-off param sweep: IVF recall@10 vs brute force and near-dup LSH
  * recall vs exhaustive, at sf0.01. Dev tool, not part of the engine. */
object IvfSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.t(spark, "/root/testdata/sf0.01", "embeddings").cache()
    val pred = col("vec_id") % 100 === 0
    val exact = SimilarityOps.bruteForceTopK(emb, pred)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((k, p) <- Seq((8, 5), (16, 10), (32, 10), (32, 12), (32, 14), (64, 16), (64, 20), (64, 24))) {
      val ivf = SimilarityOps.ivfTopK(emb, pred, nCentroids = k, nProbe = p)
        .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = ivf.intersect(exact).size.toDouble / exact.size
      println(f"SWEEP ivf K=$k%2d nProbe=$p%2d scanned~${p.toDouble / k}%.2f recall=$recall%.3f")
    }
    val ndExact = SimilarityOps.nearDupPairsExact(emb, 0.45)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (bands <- Seq(8, 12); bits <- Seq(5, 6, 7)) {
      val nd = SimilarityOps.nearDupPairs(emb, 0.45, nBands = bands, bitsPerBand = bits)
        .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"SWEEP nd bands=$bands%2d bits=$bits%2d found=${nd.size}%3d of ${ndExact.size} recall=${nd.intersect(ndExact).size.toDouble / ndExact.size}%.2f")
    }
    spark.stop()
  }
}
