package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.SimilarityOps
import graft.ops.SimilarityOps.{definedNrm, dot, norm}
import graft.serving.IndexStore
import graft.serving.IndexStore.KnnIndex

/** STREAMING graph-ANN serving — the online half of `sim_graph_topk`'s
  * offline/online split, served from the PERSISTED graph artifact
  * ([[IndexStore.writeKnn]]: src-bucketed edges + node-bucketed
  * vectors + entry points):
  *
  *  1. SEED — the driver-constant entry vectors score each query
  *     through the `cell_probe` narrow kernel (top-[[SimilarityOps
  *     .GraphSeeds]] in the batch family's exact (sim DESC, id ASC)
  *     order — no window, streaming-legal)
  *  2. HOPS — each expansion derives the frontier's bucket set with
  *     one tiny action (frontiers are ≤ |Q|·beam·degree rows by
  *     construction) and equi-joins ONLY those partitions of the
  *     edge/node artifacts: the literal `sb`/`nb` filters become
  *     parquet PartitionFilters (spec-pinned), so a batch's IO is its
  *     own frontier's buckets, never the graph
  *  3. BEAM + TOP-K — per-query rankings run through the TopKSimAgg
  *     partial top-k aggregator (map-side combine, ≤ beam/k rows of
  *     state per query), the StreamAnnServe discipline
  *
  * Because the prune step derives literal filters from the batch's
  * contents, the streaming form runs through foreachBatch
  * ([[serveStream]]): each micro-batch is served by the SAME batch
  * function, so stream ≡ batch is structural (spec-pinned across 3
  * micro-batches).
  *
  * Batch twin: `stream_graph_topk` builds + loads the artifact and
  * serves the bounded query batch — it must reproduce `sim_graph_topk`
  * row for row (same entry points, hop unrolling, beam, tie-breaks;
  * parquet roundtrips float/double bit-exactly), so it shares that
  * committed DuckDB oracle. */
object StreamGraphServe {

  /** One hop: join a bounded (q_id, node) frontier to ONLY its
    * buckets of the edge artifact. The bucket collect is one tiny
    * action (≤ [[IndexStore.KnnBuckets]] ints) whose literal `sb`
    * filter becomes a parquet PartitionFilter (spec-pinned). */
  private[graft] def expandFrontier(frontier: DataFrame,
      index: KnnIndex): DataFrame = {
    val pruned = graft.serving.ProbePrune.scan(index.edges, "sb",
      frontier.select(IndexStore.nodeBucket(col("node")).as("sb")))
    frontier.join(pruned, frontier("node") === col("src"))
      .select(col("q_id"), col("dst").as("node"))
  }

  /** Score a bounded (q_id, node) frontier: vector lookups read ONLY
    * the frontier's buckets of the node artifact (literal `nb`
    * PartitionFilter, spec-pinned); query vectors join from the
    * bounded batch. */
  private[graft] def scoreFrontier(frontier: DataFrame, q: DataFrame,
      index: KnnIndex): DataFrame = {
    val pruned = graft.serving.ProbePrune.scan(index.nodes, "nb",
      frontier.select(IndexStore.nodeBucket(col("node")).as("nb")))
    frontier.join(pruned, "node")
      .join(q, "q_id")
      .withColumn("sim",
        dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
      .select(col("q_id"), col("node"), col("sim"))
  }

  /** The normalized bounded query frame plus everything the beam
    * search VISITED, ALREADY SCORED — the shared front half of
    * [[serveTopK]] and [[serveFilteredTopK]] (the filtered serve
    * traverses the SAME unfiltered frontier, by construction).
    *
    * r16 optimization (guide §1.2 — don't compute things twice): the
    * walk already scores hops 1..hops−1 to pick each beam, and the
    * old shape then RE-scored every visited node in one final gather
    * pass (an extra bucket-prune collect plus a node join over the
    * LARGEST frontier of the query). The gather now reuses the walk's
    * scored frames and scores only what the walk never scored (the
    * seeds and the final hop). [[scoreFrontier]] is deterministic per
    * (q_id, node) — same node store, same expression — so the
    * deduplicated union is row-identical to the old rescore
    * (StreamGraphServeSpec pins serve ≡ the in-plan operator). */
  private[graft] def gatherVisited(queries: DataFrame, index: KnnIndex,
      beam: Int, seedK: Int, hops: Int): (DataFrame, DataFrame) = {
    val q = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        norm(col("embedding")).as("q_nrm"))
      .filter(definedNrm(col("q_nrm")))
      .localCheckpoint(eager = false)
    val seeds = q.select(col("q_id"),
        explode(graft.functions.VectorFunctions.cell_probe(
          col("q_emb"), index.entries, seedK)).as("node"))
      .localCheckpoint(eager = false)
    // hop loop — [[SimilarityOps.graphTopK]]'s unrolling, bucket-pruned:
    // each expansion reads only its frontier's sb/nb partitions, and
    // between hops the frontier narrows to the per-query top-`beam` of
    // the new nodes through the map-side TopKSimAgg partial aggregator
    val topB = udaf(new graft.functions.TopKSimAgg(beam))
    var frontier = seeds
    var unscored = seeds
    var scored: Option[DataFrame] = None
    for (h <- 1 to hops) {
      val hop = expandFrontier(frontier, index).distinct()
        .localCheckpoint(eager = false)
      if (h < hops) {
        val hs = scoreFrontier(hop, q, index).localCheckpoint(eager = false)
        scored = Some(scored.fold(hs)(_ unionByName hs))
        frontier = hs
          .groupBy("q_id").agg(topB(col("node"), col("sim")).as("top"))
          .select(col("q_id"), explode(col("top.n_id")).as("node"))
      } else unscored = unscored.unionByName(hop)
    }
    val tail = scoreFrontier(
      unscored.filter(col("node") =!= col("q_id")).distinct()
        .localCheckpoint(eager = false), q, index)
    (q, scored.fold(tail)(_ unionByName tail)
      .filter(col("node") =!= col("q_id")).distinct()
      .localCheckpoint(eager = false))
  }

  /** Serve the [[SimilarityOps.GraphHops]]-hop beam search for every
    * query in the BOUNDED frame `queries` (vec_id, embedding) against
    * the loaded graph index. */
  def serveTopK(queries: DataFrame, index: KnnIndex, k: Int = 10,
      beam: Int = SimilarityOps.GraphBeam,
      seedK: Int = SimilarityOps.GraphSeeds,
      hops: Int = SimilarityOps.GraphHops): DataFrame = {
    val (_, gathered) = gatherVisited(queries, index, beam, seedK, hops)
    val topK = udaf(new graft.functions.TopKSimAgg(k))
    gathered
      .groupBy("q_id").agg(topK(col("node"), col("sim")).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.n_id").as("n_id"),
        (col("pos") + 1).cast("long").as("rank"),
        round(col("col.sim"), 6).as("sim"))
  }

  /** METADATA-FILTERED graph serve — the filtered-DiskANN shape: the
    * beam search traverses ALL nodes (an unfiltered frontier, so
    * graph connectivity survives arbitrarily selective predicates),
    * and only the EMIT stage filters — the per-query ranking runs
    * over the predicate-matching subset of everything visited. This
    * is strictly better than naive post-filtering (rank, THEN drop
    * non-matching — silently returns < k whenever the unfiltered
    * top-k contains ineligible rows) and is the standard answer for
    * graph indexes, where the IVF variant's pre-filter
    * ([[graft.ops.SimilarityOps.filteredTopK]] — the metadata rides
    * the index row) has no equivalent that preserves connectivity.
    * `labels` is the (vec_id, label) metadata relation, joined ONLY
    * against the bounded visited set (per-query O(hops·beam·degree)
    * rows); a production layout denormalizes the label onto the node
    * store exactly like the IVF assignment struct. Result semantics
    * are spec-pinned: every row matches the predicate, and per query
    * the rows are the true top-k of the matching visited set. */
  def serveFilteredTopK(queries: DataFrame, index: KnnIndex,
      labels: DataFrame, k: Int = 10,
      beam: Int = SimilarityOps.GraphBeam,
      seedK: Int = SimilarityOps.GraphSeeds,
      hops: Int = SimilarityOps.GraphHops,
      labelMod: Long = SimilarityOps.FilterLabelMod): DataFrame = {
    val (_, gathered) = gatherVisited(queries, index, beam, seedK, hops)
    // distinct: a labels relation carrying duplicate vec_id rows would
    // duplicate pre-agg candidates (skewing the top-k) and re-attach
    // one result row per duplicate at the emit join (r15 ADVICE)
    val lbl = labels.select(col("vec_id").as("node"),
      col("label").cast("long").as("n_label")).distinct()
    val topK = udaf(new graft.functions.TopKSimAgg(k))
    gathered
      .join(lbl, "node")
      .filter(col("n_label") % labelMod === 0)
      .groupBy("q_id").agg(topK(col("node"), col("sim")).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.n_id").as("node"),
        (col("pos") + 1).cast("long").as("rank"),
        round(col("col.sim"), 6).as("sim"))
      .join(lbl, "node")
      .select(col("q_id"), col("node").as("n_id"), col("n_label"),
        col("rank"), col("sim"))
  }

  /** One hop over the LAYERED edge artifact: the literal `layer`
    * filter plus the frontier's `sb` bucket prune both land as
    * parquet PartitionFilters (the table is partitioned by
    * (layer, sb) — spec-pinned). */
  private[graft] def expandLayer(frontier: DataFrame, edges: DataFrame,
      layer: Int): DataFrame = {
    val pruned = graft.serving.ProbePrune.scan(
      edges.filter(col("layer") === layer), "sb",
      frontier.select(IndexStore.nodeBucket(col("node")).as("sb")))
    frontier.join(pruned, frontier("node") === pruned("src"))
      .select(col("q_id"), col("dst").as("node"))
  }

  /** [[scoreFrontier]] against an explicit node store (the layered
    * artifact's lnodes). */
  private[graft] def scoreNodes(frontier: DataFrame, q: DataFrame,
      nodes: DataFrame): DataFrame = {
    val pruned = graft.serving.ProbePrune.scan(nodes, "nb",
      frontier.select(IndexStore.nodeBucket(col("node")).as("nb")))
    frontier.join(pruned, "node")
      .join(q, "q_id")
      .withColumn("sim",
        dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
      .select(col("q_id"), col("node"), col("sim"))
  }

  /** Serve the LAYERED (HNSW-shape) search from the persisted layered
    * artifact ([[IndexStore.writeKnnLayered]]): score the bounded
    * entry table (top-layer members + fallback), greedy-descend the
    * upper layers ([[SimilarityOps.LayerHops]] narrowing expansions
    * each, the last widened to the beam), then the committed
    * [[SimilarityOps.GraphHops]]-hop beam at layer 0 — [[SimilarityOps
    * .graphLayeredSearch]]'s loop, bucket-pruned per hop and ranked
    * through the map-side TopKSimAgg partial aggregator (window-free,
    * the [[serveTopK]] discipline). Must reproduce the in-plan
    * operator row for row (spec-pinned). */
  def serveLayeredTopK(queries: DataFrame, index: IndexStore.LayeredIndex,
      k: Int = 10, beam: Int = SimilarityOps.GraphBeam,
      seedK: Int = SimilarityOps.GraphSeeds,
      hops: Int = SimilarityOps.GraphHops,
      layers: Int = SimilarityOps.AutoLayers,
      layerHops: Int = SimilarityOps.LayerHops): DataFrame = {
    val (_, gathered) = gatherLayeredVisited(queries, index, beam, seedK,
      hops, layers, layerHops)
    val topK = udaf(new graft.functions.TopKSimAgg(k))
    gathered
      .groupBy("q_id").agg(topK(col("node"), col("sim")).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.n_id").as("n_id"),
        (col("pos") + 1).cast("long").as("rank"),
        round(col("col.sim"), 6).as("sim"))
  }

  /** METADATA-FILTERED layered serve — [[serveFilteredTopK]]'s
    * filtered-DiskANN shape on the layered rung: the descent and beam
    * traverse UNFILTERED (the same gather as [[serveLayeredTopK]]),
    * only the emit stage filters, so the answer is the true top-k of
    * the matching visited set. */
  def serveLayeredFilteredTopK(queries: DataFrame,
      index: IndexStore.LayeredIndex, labels: DataFrame, k: Int = 10,
      beam: Int = SimilarityOps.GraphBeam,
      seedK: Int = SimilarityOps.GraphSeeds,
      hops: Int = SimilarityOps.GraphHops,
      layers: Int = SimilarityOps.AutoLayers,
      layerHops: Int = SimilarityOps.LayerHops,
      labelMod: Long = SimilarityOps.FilterLabelMod): DataFrame = {
    val (_, gathered) = gatherLayeredVisited(queries, index, beam, seedK,
      hops, layers, layerHops)
    // distinct: a labels relation carrying duplicate vec_id rows would
    // duplicate pre-agg candidates (skewing the top-k) and re-attach
    // one result row per duplicate at the emit join (r15 ADVICE)
    val lbl = labels.select(col("vec_id").as("node"),
      col("label").cast("long").as("n_label")).distinct()
    val topK = udaf(new graft.functions.TopKSimAgg(k))
    gathered
      .join(lbl, "node")
      .filter(col("n_label") % labelMod === 0)
      .groupBy("q_id").agg(topK(col("node"), col("sim")).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.n_id").as("node"),
        (col("pos") + 1).cast("long").as("rank"),
        round(col("col.sim"), 6).as("sim"))
      .join(lbl, "node")
      .select(col("q_id"), col("node").as("n_id"), col("n_label"),
        col("rank"), col("sim"))
  }

  /** The shared front half of the layered serves: normalized queries
    * plus everything the descent + beam VISITED, ALREADY SCORED (the
    * [[gatherVisited]] r16 shape — the descent scores every candidate
    * set to pick each carry, so the final gather reuses those frames
    * and scores only the last layer-0 hop; the entry rows carry their
    * own sims, computed from the SAME vectors the node store holds,
    * so the deduplicated union is row-identical to the old full
    * rescore). The [[SimilarityOps.AutoLayers]] sentinel resolves to
    * the ARTIFACT's recorded depth — a serve must descend exactly the
    * layers the build stacked. */
  private[graft] def gatherLayeredVisited(queries: DataFrame,
      index: IndexStore.LayeredIndex, beam: Int, seedK: Int, hops: Int,
      layers0: Int, layerHops: Int): (DataFrame, DataFrame) = {
    val layers = if (layers0 < 0) index.layers else layers0
    val q = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        norm(col("embedding")).as("q_nrm"))
      .filter(definedNrm(col("q_nrm")))
      .localCheckpoint(eager = false)
    val entry = index.entries.join(q, lit(true))
      .withColumn("sim",
        dot(col("q_emb"), col("e_emb")) / (col("q_nrm") * col("e_nrm")))
      .select(col("q_id"), col("node"), col("sim"))
      .localCheckpoint(eager = false)
    def topOf(scored: DataFrame, keep: Int): DataFrame = {
      val agg = udaf(new graft.functions.TopKSimAgg(keep))
      scored.groupBy("q_id").agg(agg(col("node"), col("sim")).as("top"))
        .select(col("q_id"), explode(col("top.n_id")).as("node"))
    }
    var carry = topOf(entry, seedK).localCheckpoint(eager = false)
    var scored = entry
    for (l <- layers to 1 by -1; s <- 1 to layerHops) {
      val cand = carry
        .unionByName(expandLayer(carry, index.edges, l))
        .distinct()
        .localCheckpoint(eager = false)
      val cs = scoreNodes(cand, q, index.nodes)
        .localCheckpoint(eager = false)
      scored = scored.unionByName(cs)
      val keep = if (l == 1 && s == layerHops) math.max(seedK, beam)
        else seedK
      carry = topOf(cs, keep).localCheckpoint(eager = false)
    }
    var frontier = carry
    var lastHop = carry
    for (h <- 1 to hops) {
      val hop = expandLayer(frontier, index.edges, 0).distinct()
        .localCheckpoint(eager = false)
      if (h < hops) {
        val hs = scoreNodes(hop, q, index.nodes)
          .localCheckpoint(eager = false)
        scored = scored.unionByName(hs)
        frontier = topOf(hs, beam).localCheckpoint(eager = false)
      } else lastHop = hop
    }
    val tail = scoreNodes(
      lastHop.filter(col("node") =!= col("q_id")).distinct()
        .localCheckpoint(eager = false), q, index.nodes)
    (q, scored.unionByName(tail)
      .filter(col("node") =!= col("q_id")).distinct()
      .localCheckpoint(eager = false))
  }

  /** Per-layer NSW insert edges for a batch of NEW vectors against the
    * LAYERED artifact — HNSW insertion with the engine's hash-derived
    * level rule: vector v joins every layer ℓ with
    * [[SimilarityOps.layerMemberPred]](ℓ, v) (the SAME membership the
    * build samples, so append and rebuild agree on levels — no random
    * level state to persist), and its layer-ℓ out-edges are the
    * top-[[SimilarityOps.LayerK]] layer-ℓ members among everything
    * the descent SCORED at that layer (insert search = serve search,
    * per layer; at layer 0 the full beam gather). Returns
    * (layer → (src, dst) edges), each frame already filtered to
    * queries whose level reaches the layer. */
  private[graft] def layeredInsertEdges(newVecs: DataFrame,
      index: IndexStore.LayeredIndex,
      layers0: Int = SimilarityOps.AutoLayers,
      beam: Int = SimilarityOps.GraphBeam,
      seedK: Int = SimilarityOps.GraphSeeds,
      hops: Int = SimilarityOps.GraphHops,
      layerHops: Int = SimilarityOps.LayerHops): Map[Int, DataFrame] = {
    val layers = if (layers0 < 0) index.layers else layers0
    val q = newVecs
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        norm(col("embedding")).as("q_nrm"))
      .filter(definedNrm(col("q_nrm")))
      .localCheckpoint(eager = false)
    val entry = index.entries.join(q, lit(true))
      .withColumn("sim",
        dot(col("q_emb"), col("e_emb")) / (col("q_nrm") * col("e_nrm")))
      .select(col("q_id"), col("node"), col("sim"))
      .localCheckpoint(eager = false)
    def topOf(scored: DataFrame, keep: Int): DataFrame = {
      val agg = udaf(new graft.functions.TopKSimAgg(keep))
      scored.groupBy("q_id").agg(agg(col("node"), col("sim")).as("top"))
        .select(col("q_id"), explode(col("top.n_id")).as("node"))
    }
    // layer-ℓ out-edges from an ALREADY-SCORED candidate frame (r16 —
    // the descent scores every candidate set anyway, so the old
    // edgesOf's fresh scoreNodes pass over the layer's candidates was
    // pure recomputation: one extra bucket-prune collect + node join
    // per layer; scoreNodes is deterministic per (q_id, node), so the
    // deduplicated scored union ranks identically): top-LayerK
    // layer-ℓ members, for queries whose level reaches ℓ.
    def edgesOf(scored: DataFrame, l: Int): DataFrame =
      topOf(scored
          .filter(SimilarityOps.layerMemberPred(l, col("node")))
          .filter(col("node") =!= col("q_id"))
          .distinct(), SimilarityOps.LayerK)
        .filter(SimilarityOps.layerMemberPred(l, col("q_id")))
        .select(col("q_id").as("src"), col("node").as("dst"))
    var carry = topOf(entry, seedK).localCheckpoint(eager = false)
    var allScored = entry
    val out = scala.collection.mutable.Map.empty[Int, DataFrame]
    for (l <- layers to 1 by -1) {
      var layerScored: Option[DataFrame] = None
      for (s <- 1 to layerHops) {
        val cand = carry
          .unionByName(expandLayer(carry, index.edges, l))
          .distinct()
          .localCheckpoint(eager = false)
        val cs = scoreNodes(cand, q, index.nodes)
          .localCheckpoint(eager = false)
        layerScored = Some(layerScored.fold(cs)(_ unionByName cs))
        allScored = allScored.unionByName(cs)
        val keep = if (l == 1 && s == layerHops) math.max(seedK, beam)
          else seedK
        carry = topOf(cs, keep).localCheckpoint(eager = false)
      }
      // the layer's first cand set contains the incoming carry, so the
      // per-step scored union covers everything the old layerCand held
      out(l) = edgesOf(layerScored.get, l).localCheckpoint(eager = false)
    }
    var frontier = carry
    var lastHop = carry
    for (h <- 1 to hops) {
      val hop = expandLayer(frontier, index.edges, 0).distinct()
        .localCheckpoint(eager = false)
      if (h < hops) {
        val hs = scoreNodes(hop, q, index.nodes)
          .localCheckpoint(eager = false)
        allScored = allScored.unionByName(hs)
        frontier = topOf(hs, beam).localCheckpoint(eager = false)
      } else lastHop = hop
    }
    val tail = scoreNodes(
      lastHop.filter(col("node") =!= col("q_id")).distinct()
        .localCheckpoint(eager = false), q, index.nodes)
    out(0) = edgesOf(allScored.unionByName(tail), 0)
      .localCheckpoint(eager = false)
    out.toMap
  }

  /** The streaming serve: every micro-batch of query vectors runs
    * through [[serveTopK]] against the SAME loaded index (foreachBatch
    * — the frontier-bucket prunes are literal filters derived from
    * the batch's contents, the [[StreamAnnServe.serveStream]] shape).
    * A query's answer completes within its own micro-batch. */
  def serveStream(queries: DataFrame, index: KnnIndex, k: Int = 10,
      beam: Int = SimilarityOps.GraphBeam,
      seedK: Int = SimilarityOps.GraphSeeds,
      hops: Int = SimilarityOps.GraphHops)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    queries.writeStream
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) => sink(serveTopK(batch.toDF(), index, k, beam, seedK, hops), id))
      .start()

  /** Streaming LAYERED serve: every micro-batch runs through
    * [[serveLayeredTopK]] against the same loaded layered index
    * (foreachBatch — the descent's layer/bucket prunes are literal
    * filters derived from the batch, the [[serveStream]] shape), so
    * stream ≡ batch is structural (spec-pinned). */
  def serveLayeredStream(queries: DataFrame,
      index: IndexStore.LayeredIndex, k: Int = 10,
      beam: Int = SimilarityOps.GraphBeam,
      seedK: Int = SimilarityOps.GraphSeeds,
      hops: Int = SimilarityOps.GraphHops)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    queries.writeStream
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) =>
        sink(serveLayeredTopK(batch.toDF(), index, k, beam, seedK, hops), id))
      .start()

  /** [[serveLayeredStream]] bound to the artifact DIRECTORY:
    * generation (and tombstone stamp) re-resolved per micro-batch
    * ([[IndexStore.GenCached]] — see [[serveStreamFrom]]). */
  def serveLayeredStreamFrom(queries: DataFrame, dir: String, k: Int = 10,
      beam: Int = SimilarityOps.GraphBeam,
      seedK: Int = SimilarityOps.GraphSeeds,
      hops: Int = SimilarityOps.GraphHops)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val spark = queries.sparkSession
    val cache = new IndexStore.GenCached[IndexStore.LayeredIndex](
      spark, dir, g => IndexStore.loadKnnLayeredAt(spark, dir, g))
    queries.writeStream
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) =>
        sink(serveLayeredTopK(batch.toDF(), cache.get(), k, beam, seedK, hops), id))
      .start()
  }

  /** [[serveStream]] bound to the artifact DIRECTORY: the generation
    * is re-resolved at every micro-batch boundary (one manifest list —
    * [[IndexStore.GenCached]]), so an append/compaction committed
    * mid-stream is served from batch N+1 on while batch N's answers
    * stand on the generation they started with (spec-pinned). */
  def serveStreamFrom(queries: DataFrame, dir: String, k: Int = 10,
      beam: Int = SimilarityOps.GraphBeam,
      seedK: Int = SimilarityOps.GraphSeeds,
      hops: Int = SimilarityOps.GraphHops)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val spark = queries.sparkSession
    val cache = new IndexStore.GenCached[KnnIndex](
      spark, dir, g => IndexStore.loadKnnAt(spark, dir, g))
    queries.writeStream
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) =>
        sink(serveTopK(batch.toDF(), cache.get(), k, beam, seedK, hops), id))
      .start()
  }
}
