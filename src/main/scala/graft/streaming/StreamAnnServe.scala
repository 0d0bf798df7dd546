package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.SimilarityOps.{definedNrm, dot, norm}
import graft.serving.IndexStore.AnnIndex

/** Streaming ANN serving: a continuous stream of query vectors served
  * against a PREBUILT, PERSISTED IVF index — the online half of the
  * offline/online split ([[graft.serving.IndexStore.writeAnn]] is the
  * offline half; the batch `sim_ivf_topk` answers a query workload
  * known up front, a serving tier answers queries as they arrive).
  *
  * The serve reads the index ARTIFACT, never the raw corpus:
  *
  *  1. PROBE — each query row expands to its nProbe best coarse cells
  *     via [[graft.functions.CellProbe]], a narrow per-row kernel
  *     against the driver-constant centroid matrix (loaded from the
  *     artifact — an index's centroids are fixed at build time).
  *  2. PRUNE — the micro-batch's probed cells (a bounded set: at most
  *     K, usually |batch|·nProbe distinct cids) become a LITERAL
  *     isin filter on the assignment table's `cid` PARTITION column,
  *     so the static side's parquet scan reads ONLY the probed
  *     partitions (PartitionFilters — spec-pinned). This is the
  *     100 TB property: per micro-batch IO is |probed cells|/K of
  *     the index, where the previous in-plan derivation re-scanned
  *     and re-assigned the whole corpus every micro-batch (Structured
  *     Streaming re-executes the static side per batch).
  *  3. CANDIDATES + TOP-K — equi-join on cid, exact cosine, then
  *     groupBy(q_id) with the TopKSimAgg partial top-k aggregator
  *     (map-side combine; ≤ k rows of state per query key).
  *
  * Because the prune step derives a literal filter from the batch's
  * contents, the streaming form runs through foreachBatch
  * ([[serveStream]]): each micro-batch is served by the SAME batch
  * function — the per-batch plan is identical to the batch twin's, so
  * stream ≡ batch is structural (spec-pinned across 3 micro-batches).
  *
  * Batch twin: `stream_ann_topk` builds the artifact, loads it, and
  * runs [[serveTopK]] on the bounded serving batch — it must
  * reproduce `sim_ivf_topk` row for row (same centroids, probes,
  * tie-breaks; parquet roundtrips float/double bit-exactly), so the
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
    * no argmax shuffle — the frame [[graft.serving.IndexStore.writeAnn]]
    * persists partitioned by cid. */
  def assignCorpus(corpus: DataFrame, cents: Seq[(Long, Seq[Float])]): DataFrame =
    corpus
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        norm(col("embedding")).as("n_nrm"),
        graft.functions.VectorFunctions.cell_probe(col("embedding"), cents, 1).as("cids"))
      .filter(definedNrm(col("n_nrm")) && size(col("cids")) > 0)
      .withColumn("cid", element_at(col("cids"), 1))
      .drop("cids")

  /** Serve exact-cosine top-k over the probed cells for every query
    * in the BOUNDED frame `queries` (vec_id, embedding), against the
    * loaded index. The probed-cid collect is ≤ K longs — the literal
    * filter that prunes the artifact scan to the probed partitions. */
  def serveTopK(queries: DataFrame, index: AnnIndex, k: Int = 10,
      nProbe: Int = graft.ops.SimilarityOps.IvfProbe): DataFrame = {
    val cents = index.centroids
    val q = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        norm(col("embedding")).as("q_nrm"))
      .filter(definedNrm(col("q_nrm")))
      .withColumn("cid",
        explode(graft.functions.VectorFunctions.cell_probe(col("q_emb"), cents, nProbe)))
    // bounded: distinct probed cells ≤ K (the centroid count), no
    // matter the batch size — the serve's one tiny driver action
    val asg = graft.serving.ProbePrune.scan(index.assign, "cid", q)
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

  /** The streaming serve: every micro-batch of query vectors runs
    * through [[serveTopK]] against the SAME loaded index (foreachBatch
    * — the standard online-serving shape once the static side is a
    * prebuilt artifact, because the probed-cell prune is a literal
    * filter derived from the batch's contents). A query's answer
    * completes within its own micro-batch; `sink` receives the served
    * top-k frame per batch. */
  def serveStream(queries: DataFrame, index: AnnIndex, k: Int = 10,
      nProbe: Int = graft.ops.SimilarityOps.IvfProbe)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    queries.writeStream
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) => sink(serveTopK(batch.toDF(), index, k, nProbe), id))
      .start()

  /** [[serveStream]] bound to the artifact DIRECTORY instead of one
    * loaded generation: the generation is re-resolved at every
    * micro-batch boundary (one manifest list — [[graft.serving
    * .IndexStore.GenCached]]), so an append/compaction committed
    * mid-stream is served from batch N+1 on while batch N's answers
    * stand on the generation they started with. */
  def serveStreamFrom(queries: DataFrame, dir: String, k: Int = 10,
      nProbe: Int = graft.ops.SimilarityOps.IvfProbe)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val spark = queries.sparkSession
    val cache = new graft.serving.IndexStore.GenCached[AnnIndex](
      spark, dir, g => graft.serving.IndexStore.loadAnnAt(spark, dir, g))
    queries.writeStream
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) => sink(serveTopK(batch.toDF(), cache.get(), k, nProbe), id))
      .start()
  }
}
