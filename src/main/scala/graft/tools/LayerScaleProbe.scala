package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.SimilarityOps
import graft.serving.IndexStore
import graft.streaming.StreamGraphServe

/** Measures what [[SimilarityOps.autoLayers]] exists to bound: the
  * layered rung's ENTRY cost as the corpus grows (the r15 verdict's
  * one weak component — a fixed depth lets the top-layer entry scan
  * and the append path's entry cross-join grow as N/16^L, linear per
  * query batch).
  *
  * For sf0.1 (N=2,000 → auto depth 2) and the 10× sf1 replica
  * (N=20,000 → auto depth 3), builds the artifact at BOTH the pinned
  * depth 2 and the auto depth and reports:
  *  - the persisted entry-table row count (the per-query entry scan,
  *    and one side of the append's entry×delta cross-join)
  *  - the measured per-query VISITED rows of the full search (entry +
  *    descent + beam — the honest serve cost)
  * Expected: the pinned-depth entry table crosses
  * [[SimilarityOps.LayerEntryBudget]] at the replica while the auto
  * depth stays bounded, at equal-order visited rows. Run AFTER
  * `Sf1Probe gen` has materialized /tmp/graft_sf1. */
object LayerScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for ((label, dir) <- Seq("sf0.1" -> "/root/testdata/sf0.1",
        "sf1(10x)" -> "/tmp/graft_sf1")) {
      val emb = graft.Tables.t(spark, dir, "embeddings").cache()
      val n = emb.count()
      val auto = SimilarityOps.autoLayers(n)
      println(s"[layerscale] $label n=$n autoLayers=$auto " +
        s"(budget=${SimilarityOps.LayerEntryBudget})")
      for (depth <- (Set(2, auto)).toSeq.sorted) {
        val adir = IndexStore.scratchDir(dir, s"lscale_d$depth")
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(adir))
        IndexStore.writeKnnLayered(emb, adir, layers = depth)
        val idx = IndexStore.loadKnnLayered(spark, adir)
        val entryRows = idx.entries.count()
        val qp = SimilarityOps.servingQueryPred(emb)
        val q = emb.filter(qp).select(col("vec_id"), col("embedding"))
        val nQ = q.count()
        val (_, visited) = StreamGraphServe.gatherLayeredVisited(
          q, idx, SimilarityOps.GraphBeam, SimilarityOps.GraphSeeds,
          SimilarityOps.GraphHops, SimilarityOps.AutoLayers,
          SimilarityOps.LayerHops)
        val visPerQ = visited.count().toDouble / math.max(nQ, 1L)
        val mark = if (entryRows > SimilarityOps.LayerEntryBudget +
          SimilarityOps.LayerEntryK) " OVER-BUDGET" else ""
        println(f"[layerscale] $label depth=$depth: entry rows " +
          f"$entryRows%4d$mark, visited/query $visPerQ%7.1f " +
          f"($nQ queries)")
      }
      emb.unpersist()
    }
    spark.stop()
  }
}
