package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.SimilarityOps.{definedNrm, dot, norm}

/** Streaming ANN serving: a continuous stream of query vectors served
  * against a STATIC, pre-built IVF index — the online half of the
  * offline/online split `serve_index_build` prepares for (the batch
  * `sim_ivf_topk` answers a query workload known up front; a serving
  * tier answers queries as they arrive).
  *
  * The whole pipeline is streaming-legal, which constrains every
  * stage (Structured Streaming forbids window functions and sorts on
  * unbounded frames — the batch IVF's row_number probe and rank are
  * both off the table):
  *
  *  1. PROBE — each query row expands to its nProbe best coarse cells
  *     via [[graft.functions.CellProbe]], a narrow per-row kernel
  *     against the driver-constant centroid matrix (train-then-apply:
  *     an index's centroids are fixed at build time, exactly like the
  *     batch family's first-K convention). No crossJoin, no window,
  *     no shuffle.
  *  2. CANDIDATES — stream-static INNER equi-join on cid against the
  *     corpus cell assignment (itself the same kernel at nProbe=1, a
  *     pure narrow projection of the corpus — zero exchanges on the
  *     static side, vs the assign-groupBy shuffle of the batch path).
  *     Stateless: each micro-batch joins only its own queries.
  *  3. TOP-K — streaming groupBy(q_id) with the TopKSimAgg partial
  *     top-k aggregator (map-side combine; ≤ k rows of state per
  *     query key), update output mode. A query's answer is complete
  *     within its own micro-batch (candidates come only from the
  *     static side), so update mode emits each query exactly once;
  *     production would add a query-arrival watermark to evict state.
  *
  * At 100 TB the static side is the serving index laid out ONCE
  * (bucketed by cid — the layout `serve_index_build` scores), and the
  * per-batch cost is |batch|·nProbe/K of the corpus — the same
  * cell-scoped contract as the batch IVF, paid per micro-batch.
  *
  * Batch twin: the SAME function on a batch query frame (the
  * Structured Streaming contract) — `stream_ann_topk` runs it on the
  * bounded serving batch and must reproduce `sim_ivf_topk` row for
  * row (same centroids, probes, tie-breaks; spec-pinned), so the
  * committed DuckDB oracle is the identical IVF CTE chain. */
object StreamAnnServe {

  /** Driver-collected coarse quantizer — the first-K centroid
    * convention of the batch IVF family, norms screened (a degenerate
    * centroid must not own a cell). K·dim floats on the driver: the
    * index-build artifact, NOT corpus-sized. */
  def collectCentroids(corpus: DataFrame, nCentroids: Int): Seq[(Long, Seq[Float])] =
    corpus.filter(col("vec_id") < nCentroids)
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
      .filter(definedNrm(col("nrm")))
      .orderBy("vec_id")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
      .toSeq

  /** Corpus cell assignment against the collected centroids: one
    * narrow projection (cell_probe at nProbe=1), no broadcast join,
    * no argmax shuffle — the static serving index frame. */
  def assignCorpus(corpus: DataFrame, cents: Seq[(Long, Seq[Float])]): DataFrame =
    corpus
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        norm(col("embedding")).as("n_nrm"),
        graft.functions.VectorFunctions.cell_probe(col("embedding"), cents, 1).as("cids"))
      .filter(definedNrm(col("n_nrm")) && size(col("cids")) > 0)
      .withColumn("cid", element_at(col("cids"), 1))
      .drop("cids")

  /** Serve exact-cosine top-k over the probed cells for every query
    * in `queries` (vec_id, embedding) — batch or streaming; the plan
    * is identical either way (the Structured Streaming contract). */
  def serveTopK(queries: DataFrame, corpus: DataFrame, k: Int = 10,
      nCentroids: Int = graft.ops.SimilarityOps.IvfCentroids,
      nProbe: Int = graft.ops.SimilarityOps.IvfProbe): DataFrame = {
    val cents = collectCentroids(corpus, nCentroids)
    val asg = assignCorpus(corpus, cents)
    val q = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        norm(col("embedding")).as("q_nrm"))
      .filter(definedNrm(col("q_nrm")))
      .withColumn("cid",
        explode(graft.functions.VectorFunctions.cell_probe(col("q_emb"), cents, nProbe)))
    val topk = udaf(new graft.functions.TopKSimAgg(k))
    q.join(asg, Seq("cid"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim",
        dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
      .groupBy("q_id")
      .agg(topk(col("n_id"), col("sim")).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.n_id").as("n_id"),
        (col("pos") + 1).cast("long").as("rank"),
        round(col("col.sim"), 6).as("sim"))
  }
}
