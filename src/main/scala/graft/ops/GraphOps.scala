package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Distributed connected components — the completion step of every
  * fuzzy-dedup pipeline: candidate PAIRS (from MinHash-LSH / SimHash /
  * embedding LSH) become dedup GROUPS, and the group label doubles as
  * the canonical keeper id (lowest doc id of the component).
  *
  * Algorithm: alternating min-label propagation and pointer jumping
  * (label(v) ← label(label(v))), the DataFrame rendering of the
  * two-phase "star" contraction family — each round is two keyed
  * shuffles (neighbor min + parent lookup), and pointer jumping makes
  * label trees collapse geometrically, so rounds are O(log d) for
  * diameter-d components instead of O(d) for plain propagation.
  * Per-round frames are `localCheckpoint`'d: iteration re-reads the
  * previous labels from materialized blocks, never re-running the
  * whole lineage (the classic iterative-DataFrame trap).
  *
  * Driver involvement per round is ONE empty-check on the changed-set
  * (convergence probe) — no labels ever `collect()`.
  *
  * Composition order at scale: run EXACT dedup first and feed CC only
  * canonical docs. Exact-duplicate groups are cliques under any LSH
  * (identical text ⇒ identical band keys), so pair counts grow
  * quadratically in copy-group size — collapsing copies first keeps
  * the edge set near-linear (measured in ScaleProfile: 10× replicated
  * corpus ⇒ 550× pairs, while CC wall time stays overhead-bound).
  */
object GraphOps {

  /** Connected components of the undirected graph (`nodes`, `edges`).
    *
    * @param nodes single LONG column `node`; every vertex, including
    *              isolated ones (they come back as singletons)
    * @param edges columns `src`, `dst` (LONG); direction ignored
    * @return (`node`, `comp`) with `comp` = min node id reachable
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 30, edgesUnique: Boolean = false): DataFrame =
    ccWithStats(nodes, edges, maxIter, edgesUnique)._1

  /** [[connectedComponents]] plus the number of propagate+jump rounds
    * actually run — the observable behind the O(log diameter) claim.
    * CcAdversarialProfile measures it on worst-case topologies (path /
    * ring: diameter = n; skewed star: one component = half the graph)
    * and GraphOpsSpec pins the logarithmic bound in CI.
    *
    * @param edgesUnique caller guarantees `edges` holds DISTINCT
    *        unordered pairs with src < dst (true for every LSH
    *        candidate generator — they end in `.distinct()` on ordered
    *        pairs). Skips the symmetrize-then-distinct shuffle: the
    *        union of (a,b) and (b,a) images of a distinct a<b set
    *        cannot collide, so the dedupe is a full |E| shuffle spent
    *        proving nothing. At 100 TB that is the single largest
    *        avoidable cost in the CC pipeline; correctness is
    *        unaffected either way (duplicate edges only re-derive the
    *        same min). */
  def ccWithStats(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 30, edgesUnique: Boolean = false): (DataFrame, Int) = {
    // NOT pre-partitioned on src: AQE's partition coalescing defeats
    // the would-be exchange reuse anyway, and hash-partitioning the
    // edge list by src funnels a hub vertex's whole edge set into one
    // partition (measured: star-1M wall 6.5 s → 35 s). The per-round
    // |E| re-shuffle is the honest cost, linear in touched vertices.
    val symRaw = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    val sym = org.apache.spark.sql.graft.Bridge.freshLocalCheckpoint(
      if (edgesUnique) symRaw else symRaw.distinct())
    // Iterate ONLY over edge-touched vertices: in a dedup graph the
    // overwhelming majority of docs has no candidate edge at all, and
    // an isolated vertex can never change label — keeping them out of
    // the loop shrinks every per-round shuffle from |V| to |touched|
    // rows (typically a few % of the corpus); singletons rejoin at the
    // end as comp = own id.
    val allNodes = nodes.select(col("node")).distinct()
      .localCheckpoint(eager = false)
    // The labels chain uses the stats-resetting checkpoint
    // (Bridge.freshLocalCheckpoint): the pointer-jump SELF-join cubes
    // Catalyst's size estimate every round (S³ per round ⇒ million-
    // digit BigInts by round ~20), which stalls the DRIVER in stats
    // arithmetic on high-diameter graphs — found by the adversarial
    // path-topology profile, invisible on low-diameter dedup graphs.
    val touched = sym.select(col("src").as("node")).distinct()
    var labels = org.apache.spark.sql.graft.Bridge.freshLocalCheckpoint(
      touched.withColumn("comp", col("node")))
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // candidate label via neighbors: min comp over incoming edges
      val nbMin = sym
        .join(labels.select(col("node").as("src"), col("comp").as("src_comp")), "src")
        .groupBy(col("dst").as("node"))
        .agg(min("src_comp").as("nb_comp"))
      val stepped = labels.join(nbMin, Seq("node"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("nb_comp"), col("comp"))).as("comp"))
      // pointer jumping: comp ← comp(comp). comp values are node ids,
      // so the lookup always hits; coalesce guards the left join.
      val jumped = stepped.toDF("node", "comp")
        .join(stepped.toDF("p", "p_comp"), col("comp") === col("p"), "left")
        .select(col("node"), coalesce(col("p_comp"), col("comp")).as("comp"))
      // carry the changed flag INTO the materialized frame so the
      // convergence probe and the checkpoint are one action, not two
      val next = org.apache.spark.sql.graft.Bridge.freshLocalCheckpoint(jumped
        .join(labels.select(col("node"), col("comp").as("prev")), "node")
        .select(col("node"), col("comp"), (col("comp") =!= col("prev")).as("changed")))
      converged = next.filter(col("changed")).isEmpty
      labels = next.select("node", "comp")
      it += 1
    }
    (labels.unionByName(
      allNodes.join(labels.select(col("node")), Seq("node"), "left_anti")
        .withColumn("comp", col("node"))), it)
  }

  /** Per-vertex triangle counts + local clustering coefficient via
    * degree-ordered edge orientation — the standard bound that makes
    * distributed triangle counting feasible at scale: orienting every
    * edge from its lower-(degree, id) endpoint to the higher caps every
    * out-degree at O(√m), so the wedge self-join materializes at most
    * O(m^{3/2}) candidate wedges TOTAL regardless of skew (a hub vertex
    * with degree 10⁶ contributes ZERO wedges — all its edges point
    * inward). Without orientation the same join is Σ deg(v)² , which a
    * single celebrity vertex turns into 10¹² rows.
    *
    * Plan shape: two keyed joins to attach endpoint degrees, one
    * self-equi-join on the wedge corner, one closing equi-join on the
    * (v,w) pair, then a map-side-combinable per-corner count. Nothing
    * is broadcast (degree table is |V|-sized); nothing is collected.
    *
    * @param edges undirected edge list, columns `src` < `dst`, distinct
    * @return (`node`, `deg`, `tri`, `lcc_ppm`) — lcc in integer parts
    *         per million (2·tri·10⁶ div deg·(deg−1); 0 for deg<2),
    *         bit-exact across engines (no float division)
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    // materialize the edge list once: the degree union reads it twice
    // and the degree-attach joins twice more — without this the
    // caller's (possibly expensive) edge derivation re-runs per use
    // (measured 3.5 → 2.3 s on the co-purchase query at sf0.1)
    val e = edges.select(col("src").as("s"), col("dst").as("d"))
      .localCheckpoint(eager = false)
    val deg = e.select(col("s").as("n")).unionAll(e.select(col("d").as("n")))
      .groupBy("n").agg(count(lit(1)).as("dg"))
    val ed = e
      .join(deg.select(col("n").as("s"), col("dg").as("sdg")), "s")
      .join(deg.select(col("n").as("d"), col("dg").as("ddg")), "d")
    val sFirst = col("sdg") < col("ddg") ||
      (col("sdg") === col("ddg") && col("s") < col("d"))
    // oriented edge u→v with ord(u) < ord(v); carry the head's degree
    // so the wedge join can order its two heads without a re-join
    val o = ed.select(
      when(sFirst, col("s")).otherwise(col("d")).as("u"),
      when(sFirst, col("d")).otherwise(col("s")).as("v"),
      when(sFirst, col("ddg")).otherwise(col("sdg")).as("vdg"))
      .localCheckpoint(eager = false) // reused 3× below — scan once
    // wedge (u; v, w) with ord(v) < ord(w); the closing edge v—w, if
    // present, is oriented v→w under the SAME total order, so one
    // equi-join on (v, w) closes every triangle exactly once (at its
    // lowest-ordered corner)
    val headLt = col("w1.vdg") < col("w2.vdg") ||
      (col("w1.vdg") === col("w2.vdg") && col("w1.v") < col("w2.v"))
    val tri = o.as("w1").join(o.as("w2"),
        col("w1.u") === col("w2.u") && headLt)
      .select(col("w1.u").as("a"), col("w1.v").as("b"), col("w2.v").as("c"))
      .join(o.select(col("u").as("b"), col("v").as("c")), Seq("b", "c"))
    val corners = tri.select(col("a").as("n"))
      .unionAll(tri.select(col("b").as("n")))
      .unionAll(tri.select(col("c").as("n")))
      .groupBy("n").agg(count(lit(1)).as("tri"))
    deg.join(corners, Seq("n"), "left")
      .select(col("n").as("node"), col("dg").as("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"),
        when(col("dg") >= 2,
          expr("2 * coalesce(tri, 0L) * 1000000 div (dg * (dg - 1))"))
          .otherwise(lit(0L)).as("lcc_ppm"))
  }

  /** Fixed-point PageRank: `iters` power-iteration rounds over an
    * undirected edge list, ALL arithmetic in integer pico-rank units
    * (1 rank-mass = 10¹²). Floating-point PageRank is not reproducible
    * on a cluster — `sum(double)` depends on partial-aggregation
    * order, which AQE re-plans, speculative retries and partition
    * count all perturb — so two runs over identical 100 TB inputs
    * disagree in the low bits and any rank-derived downstream fate
    * (keep/drop, ordering) silently churns. With ranks as longs and
    * contributions as `rank div degree`, every reduction is exact
    * integer addition: associative, commutative, identical on any
    * topology, and bit-equal to an independent engine's recomputation
    * (the DuckDB oracle runs the same five unrolled rounds).
    *
    * Cost shape: per round one |E| equi-join (rank lookup) + one
    * map-side-combinable sum into the destination — two keyed
    * shuffles, same as one CC round; rounds are FIXED (no convergence
    * probe), so the 100 TB cost is exactly `iters` × that. Per-round
    * frames are stats-resetting localCheckpoints (same driver-stall
    * guard as [[connectedComponents]]).
    *
    * Mass conservation: `div` floors, so each round leaks < 1 pico per
    * edge plus the damping remainder — deterministic leak, same in
    * both engines, irrelevant at 10¹² scale.
    *
    * @param edges undirected, distinct, `src` < `dst` (LONG)
    * @return (`node`, `deg`, `rank_pico`) after `iters` rounds
    */
  def pageRankFixed(edges: DataFrame, iters: Int = 5): DataFrame = {
    // materialize the symmetrized edges once: deg and symd both read
    // them, and the caller's edge derivation may be expensive
    val sym = org.apache.spark.sql.graft.Bridge.freshLocalCheckpoint(
      edges.select(col("src"), col("dst"))
        .union(edges.select(col("dst").as("src"), col("src").as("dst"))))
    val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("dg"))
      .localCheckpoint(eager = false)
    // degree rides ON the edge list (materialized once): each round is
    // then ONE |E| join + one map-side-combinable sum — the
    // rank-to-degree lookup join disappears from the loop entirely.
    // r16 (guide §2.4 — two operations keyed the same way share one
    // exchange): pin the edge list's partitioning on the join key with
    // an EXPLICIT partition count, pre-sort within partitions, and
    // checkpoint — every round's sort-merge join then reuses the edge
    // side's layout and only the rank side (|V| partial-agg rows)
    // exchanges + sorts, instead of re-shuffling + re-sorting |E|
    // edges per round. The layout survives ONLY if the checkpoint's
    // plan is compiled non-adaptively: under AQE the executed plan is
    // not finalized when LogicalRDD captures outputPartitioning /
    // outputOrdering, so both read Unknown and every round
    // re-exchanged (measured — plan unchanged, 5 |E| exchanges). AQE
    // is toggled off around THIS plan compilation only (a fixed-shape
    // repartition+sort gains nothing from AQE); the loop itself still
    // runs adaptive. The partition count comes from
    // spark.sql.shuffle.partitions, so it scales with the deployment,
    // not the bench machine.
    // (two layers: the degree-attach JOIN stays adaptive — AQE's skew
    // handling matters for hot nodes at scale — and only the
    // fixed-shape repartition+sort over the joined RDD compiles
    // non-adaptively)
    val sess = edges.sparkSession
    val symdRaw = sym
      .join(deg.select(col("node").as("src"), col("dg")), "src")
      .localCheckpoint()
    val aqeWas = sess.conf.get("spark.sql.adaptive.enabled")
    sess.conf.set("spark.sql.adaptive.enabled", "false")
    val symd = try org.apache.spark.sql.graft.Bridge.freshLocalCheckpoint(
      symdRaw
        .repartition(sess.sessionState.conf.numShufflePartitions,
          col("src"))
        .sortWithinPartitions("src"))
    finally sess.conf.set("spark.sql.adaptive.enabled", aqeWas)
    // one scalar action to fold N into the plan as a literal (keeps
    // the teleport term inside codegen); NOT a per-round collect
    val n = deg.count()
    val scale = 1000000000000L
    val tele = (15L * scale) / (100L * n)
    var ranks = deg.select(col("node"), lit(scale / n).as("r"))
    // Unlike the CC loop there is NO per-round checkpoint: rounds are
    // FIXED (no convergence probe forcing a driver action), so the
    // whole computation is one declarative `iters`-deep plan — Spark
    // materializes each round's exchange on shuffle disk anyway (the
    // fault-tolerance story), Catalyst optimizes the pipeline as a
    // unit, and stats cannot cube unboundedly at a bounded depth.
    var it = 0
    while (it < iters) {
      ranks = symd
        .join(ranks.select(col("node").as("src"), col("r")), "src")
        .groupBy(col("dst"))
        .agg(sum(expr("r div dg")).as("m"))
        .select(col("dst").as("node"),
          (lit(tele) + expr("(85 * m) div 100")).as("r"))
      it += 1
    }
    ranks.join(deg, "node")
      .select(col("node"), col("dg").as("deg"), col("r").as("rank_pico"))
  }

  // ------------------------------------------------------------ queries

  type QFn = (SparkSession, String) => DataFrame

  /** Support-2 co-purchase edges over lineitem: parts adjacent when
    * they share ≥ 2 orders. Pairs via per-order collect_set +
    * higher-order-function explosion, NOT a self-join: one exchange on
    * l_orderkey (with map-side partial collect) instead of distinct's
    * (okey, pkey) exchange plus two more join-side okey exchanges —
    * baskets are small (≤ a few parts/order), so the pair blow-up is
    * bounded per row and stays inside codegen (measured 3.4 → 2.1 s).
    * The support threshold is what keeps a co-occurrence graph sparse
    * as draws grow. */
  private def coPurchaseEdges(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps)), y ->
          |    struct(x AS s, y AS d))))""".stripMargin)).as("e"))
      .select(col("e.s").as("src"), col("e.d").as("dst"))
      .groupBy("src", "dst")
      .agg(count(lit(1)).as("supp"))
      .filter(col("supp") >= 2)
      .select("src", "dst")

  /** LEAKAGE-SAFE train/valid/test split: the split key is the
    * near-dup COMPONENT label (min doc id of the MinHash-LSH-CC
    * group), not the doc id — so a whole duplicate cluster moves as
    * one unit and no near-dup pair can straddle a split boundary, by
    * construction (the Lee et al. 2021 train→test contamination fix;
    * a per-doc hash split separates ~1−(0.8²+0.1²+0.1²) = 34 % of
    * near-dup pairs). Same 80/10/10 md5 arithmetic as
    * `split_train_test` (salt "split:" + the component id), same CC
    * machinery as `dedup_cc_groups`; marginal rates stay ~80/10/10
    * because components are overwhelmingly singletons. Scale shape =
    * the CC shape (O(log d) keyed rounds) + one narrow hash
    * projection. */
  def leakageSafeSplit(docs: DataFrame): DataFrame = {
    val edges = DedupOps.lshCandidatePairs(docs).toDF("src", "dst")
    val cc = connectedComponents(docs.select(col("doc_id").as("node")), edges,
      edgesUnique = true)
    val h = TextOps.strHash(concat(lit("split:"), col("comp").cast("string")))
    cc.select(col("node").as("doc_id"), col("comp"),
      when(h % 100 < 80, "train")
        .when(h % 100 < 90, "valid")
        .otherwise("test").as("split"))
  }

  val queries: Map[String, QFn] = Map(
    // MinHash-LSH candidate pairs → transitive dup groups. comp is the
    // keeper doc id; comp_size the group cardinality (1 = unique doc).
    "dedup_cc_groups" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val edges = DedupOps.lshCandidatePairs(docs).toDF("src", "dst")
      val cc = connectedComponents(docs.select(col("doc_id").as("node")), edges,
        edgesUnique = true)
      val sizes = cc.groupBy("comp").agg(count(lit(1)).as("comp_size"))
      cc.join(sizes, "comp")
        .select(col("node").as("doc_id"), col("comp"), col("comp_size"))
    }),

    // The cluster-size DISTRIBUTION — the standard dedup report
    // figure (how much of the corpus sits in duplicate clusters of
    // which size): one more |components|-row agg on top of the
    // committed CC derivation, tiny output, the number a curation
    // run quotes ("N% of docs live in clusters > 1").
    "dedup_cluster_hist" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val edges = DedupOps.lshCandidatePairs(docs).toDF("src", "dst")
      val cc = connectedComponents(docs.select(col("doc_id").as("node")), edges,
        edgesUnique = true)
      cc.groupBy("comp").agg(count(lit(1)).as("comp_size"))
        .groupBy("comp_size")
        .agg(count(lit(1)).as("n_clusters"))
        .select(col("comp_size"), col("n_clusters"),
          (col("comp_size") * col("n_clusters")).as("n_docs"))
    }),

    // Near-dup-cluster-aware split (see [[leakageSafeSplit]]): the fix
    // for split_train_test's train→test near-dup contamination.
    "split_leakage_safe" -> ((s, d) => leakageSafeSplit(t(s, d, "documents"))),

    // ROUND-10 CAPSTONE: the training-export manifest as ONE plan —
    // near-dup CC → leakage-safe split → keeper selection (component
    // representative, train split only) → Feistel global shuffle of
    // the survivors into (shard, pos). Each stage is the separately-
    // oracled derivation; composing them adds only the keeper filter
    // and one keyed join (the curate_pipeline discipline applied to
    // the round-10 export stack). comp_size rides along as manifest
    // metadata: how many near-dups each exported keeper represents.
    "curate_export_manifest" -> ((s, d) => {
      val split = leakageSafeSplit(t(s, d, "documents"))
      val sizes = split.groupBy("comp").agg(count(lit(1)).as("comp_size"))
      // checkpointed: the keepers frame feeds THREE consumers — the
      // count+max scalar action feistelShuffle's auto-sizing needs,
      // the permutation plan, and the comp_size join — so without it
      // the whole CC→split→keeper lineage executes once per consumer
      val keepers = split
        .filter(col("doc_id") === col("comp") && col("split") === "train")
        .join(sizes, "comp")
        .localCheckpoint(eager = false)
      CurationOps.feistelShuffle(keepers.select(col("doc_id")))
        .join(keepers.select(col("doc_id"), col("comp_size")), "doc_id")
        .select(col("doc_id"), col("comp_size"), col("perm"),
          col("shard"), col("pos"))
    }),

    // The fuzzy-dedup corpus materializer: the component label IS the
    // keeper id (min doc id), so the deduplicated corpus is simply the
    // rows whose id equals their label — the near-dup counterpart of
    // dedup_keep's exact-hash keeper.
    "dedup_cc_keep" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val edges = DedupOps.lshCandidatePairs(docs).toDF("src", "dst")
      connectedComponents(docs.select(col("doc_id").as("node")), edges,
          edgesUnique = true)
        .filter(col("node") === col("comp"))
        .join(docs, col("node") === col("doc_id"))
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    // Quality-aware keeper — the "keep the BEST duplicate" rule real
    // curation uses (CCNet/RefinedWeb keep the longest/most complete
    // copy of a near-dup cluster, not the lowest id): keeper =
    // argmax(n_tokens, tie → min doc_id) per CC component. One keyed
    // max(struct) agg on top of the committed CC derivation — the
    // quality column rides the existing node join, no new
    // corpus-volume exchange.
    "dedup_cc_keep_longest" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val edges = DedupOps.lshCandidatePairs(docs).toDF("src", "dst")
      val cc = connectedComponents(docs.select(col("doc_id").as("node")),
        edges, edgesUnique = true)
      cc.join(docs.select(col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tokens")),
          col("node") === col("doc_id"))
        .groupBy("comp")
        .agg(count(lit(1)).as("comp_size"),
          max(struct(col("n_tokens"), (-col("doc_id")).as("nid"))).as("b"))
        .select((-col("b.nid")).as("doc_id"), col("comp"),
          col("comp_size"), col("b.n_tokens").as("n_tokens"))
    }),

    // embedding-space analogue of dedup_cc_keep: cosine near-dup PAIRS
    // (hashed-plane LSH gate + exact rerank) become transitive groups,
    // keeper = min vec_id — the canonical corpus after semantic dedup.
    // Exact-canonicalization first (SimilarityOps.exactCanonicalReps):
    // LSH/rerank/CC run over one rep per DISTINCT vector, so the
    // candidate stage scales with distinct content, not corpus size —
    // byte-identical copies form cliques the pair join would otherwise
    // rediscover O(copies²) per bucket. Output-identical to the direct
    // form (rep = min id of its copy-group ⇒ min-over-reps ≡
    // min-over-copies; keepers ARE reps), pinned in
    // SimilarityCanonicalSpec; on the 10× exact-replica sf1 probe this
    // is the difference between ~100× and ~1× candidate growth.
    "emb_dedup_keep" -> ((s, d) => {
      val embs = t(s, d, "embeddings")
      val reps = SimilarityOps.exactCanonicalReps(embs)
        .localCheckpoint(eager = false) // reused 4× below — shuffle once
      val edges = SimilarityOps.nearDupPairs(reps, tau = SimilarityOps.NdTau,
          nBands = SimilarityOps.NdBands, bitsPerBand = SimilarityOps.NdBits,
          dim = SimilarityOps.OracleDim)
        .select(col("d1").as("src"), col("d2").as("dst"))
      connectedComponents(reps.select(col("vec_id").as("node")), edges,
          edgesUnique = true)
        .filter(col("node") === col("comp"))
        .join(embs.select(col("vec_id"), col("label").cast("long").as("label")),
          col("node") === col("vec_id"))
        .select(col("vec_id"), col("label"))
    }),

    // Triangle census of the support-2 co-purchase graph: parts are
    // adjacent when they appear together in ≥ 2 orders (the frequent-
    // itemset support threshold that keeps a co-occurrence graph sparse
    // as draws grow). Output = per-part degree, triangle count and
    // integer-ppm clustering coefficient — the community-structure
    // signal used to cluster items/documents before curation. The
    // expensive step at 100 TB is the pair-support aggregation (one
    // shuffle, map-side combinable); the census itself is bounded by
    // the degree orientation (see triangleStats).
    "graph_triangles" -> ((s, d) => triangleStats(coPurchaseEdges(s, d))),

    // Item centrality on the same graph: five fixed power-iteration
    // rounds of integer-arithmetic PageRank — the popularity prior
    // used to weight items/documents before sampling. Deterministic by
    // construction (see pageRankFixed): the oracle re-runs the
    // identical rounds in DuckDB and the hashes must be bit-equal,
    // something float PageRank cannot promise on ANY engine pair.
    "graph_pagerank" -> ((s, d) => pageRankFixed(coPurchaseEdges(s, d)))
  )

  /** Oracle: DuckDB recursive transitive closure over the SAME LSH
    * pair derivation as [[DedupOps.oracle]]'s dedup_lsh_pairs, reduced
    * to min reachable id — an independent recomputation of both the
    * edge set and the component labels. Closure is O(Σ comp²) rows:
    * fine for the oracle scale, which is exactly why the engine side
    * runs label propagation instead. */
  val oracle: Map[String, String] = Map(
    "dedup_cc_groups" -> {
      val pairsSql = DedupOps.oracle("dedup_lsh_pairs")
      s"""WITH RECURSIVE pairs AS ($pairsSql),
         |edges AS (
         |  SELECT d1 AS src, d2 AS dst FROM pairs
         |  UNION
         |  SELECT d2 AS src, d1 AS dst FROM pairs),
         |reach(node, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r),
         |comp AS (
         |  SELECT node AS doc_id, MIN(r) AS comp FROM reach GROUP BY 1)
         |SELECT doc_id, comp,
         |  COUNT(1) OVER (PARTITION BY comp) AS comp_size
         |FROM comp""".stripMargin
    },

    // the CC chain rolled twice: comp sizes, then the size histogram
    "dedup_cluster_hist" -> {
      val pairsSql = DedupOps.oracle("dedup_lsh_pairs")
      s"""WITH RECURSIVE pairs AS ($pairsSql),
         |edges AS (
         |  SELECT d1 AS src, d2 AS dst FROM pairs
         |  UNION
         |  SELECT d2 AS src, d1 AS dst FROM pairs),
         |reach(node, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r),
         |comp AS (
         |  SELECT node AS doc_id, MIN(r) AS comp FROM reach GROUP BY 1),
         |sz AS (
         |  SELECT comp, CAST(COUNT(1) AS BIGINT) AS comp_size
         |  FROM comp GROUP BY 1)
         |SELECT comp_size, CAST(COUNT(1) AS BIGINT) AS n_clusters,
         |  CAST(comp_size * COUNT(1) AS BIGINT) AS n_docs
         |FROM sz GROUP BY 1""".stripMargin
    },

    "split_leakage_safe" -> {
      val pairsSql = DedupOps.oracle("dedup_lsh_pairs")
      val h = "('0x' || substr(md5('split:' || comp::VARCHAR), 1, 15))::BIGINT" +
        s" % ${TextOps.HashMod} % 100"
      s"""WITH RECURSIVE pairs AS ($pairsSql),
         |edges AS (
         |  SELECT d1 AS src, d2 AS dst FROM pairs
         |  UNION
         |  SELECT d2 AS src, d1 AS dst FROM pairs),
         |reach(node, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r),
         |comp AS (
         |  SELECT node AS doc_id, MIN(r) AS comp FROM reach GROUP BY 1)
         |SELECT doc_id, comp,
         |  CASE WHEN $h < 80 THEN 'train'
         |       WHEN $h < 90 THEN 'valid'
         |       ELSE 'test' END AS split
         |FROM comp""".stripMargin
    },

    "dedup_cc_keep" -> {
      val pairsSql = DedupOps.oracle("dedup_lsh_pairs")
      s"""WITH RECURSIVE pairs AS ($pairsSql),
         |edges AS (
         |  SELECT d1 AS src, d2 AS dst FROM pairs
         |  UNION
         |  SELECT d2 AS src, d1 AS dst FROM pairs),
         |reach(node, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r),
         |comp AS (
         |  SELECT node, MIN(r) AS comp FROM reach GROUP BY 1)
         |SELECT d.doc_id, d.lang, d.source
         |FROM comp c JOIN documents d ON c.node = d.doc_id
         |WHERE c.node = c.comp""".stripMargin
    },

    // the same CC chain, keeper = longest (tie → lowest id) per comp
    "dedup_cc_keep_longest" -> {
      val pairsSql = DedupOps.oracle("dedup_lsh_pairs")
      s"""WITH RECURSIVE pairs AS ($pairsSql),
         |edges AS (
         |  SELECT d1 AS src, d2 AS dst FROM pairs
         |  UNION
         |  SELECT d2 AS src, d1 AS dst FROM pairs),
         |reach(node, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r),
         |comp AS (
         |  SELECT node, MIN(r) AS comp FROM reach GROUP BY 1),
         |lens AS (
         |  SELECT c.node, c.comp,
         |    CAST(len(list_filter(string_split_regex(trim(lower(d.text)),
         |      '\\s+'), x -> x != '')) AS BIGINT) AS n_tokens
         |  FROM comp c JOIN documents d ON c.node = d.doc_id),
         |rk AS (
         |  SELECT node, comp, n_tokens,
         |    COUNT(1) OVER (PARTITION BY comp) AS comp_size,
         |    ROW_NUMBER() OVER (PARTITION BY comp
         |      ORDER BY n_tokens DESC, node ASC) AS rn
         |  FROM lens)
         |SELECT node AS doc_id, comp, CAST(comp_size AS BIGINT) AS comp_size,
         |  n_tokens
         |FROM rk WHERE rn = 1""".stripMargin
    },

    // Capstone composition: the CC/split CTEs verbatim, then the
    // source-parameterized Feistel chain over the SURVIVORS (so the
    // permutation domain derives from the survivor id span, exactly
    // like the engine passing only keepers to feistelShuffle).
    "curate_export_manifest" -> {
      val pairsSql = DedupOps.oracle("dedup_lsh_pairs")
      val h = "('0x' || substr(md5('split:' || comp::VARCHAR), 1, 15))::BIGINT" +
        s" % ${TextOps.HashMod} % 100"
      s"""WITH RECURSIVE pairs AS ($pairsSql),
         |edges AS (
         |  SELECT d1 AS src, d2 AS dst FROM pairs
         |  UNION
         |  SELECT d2 AS src, d1 AS dst FROM pairs),
         |reach(node, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r),
         |comp AS (
         |  SELECT node AS doc_id, MIN(r) AS comp FROM reach GROUP BY 1),
         |splt AS (
         |  SELECT doc_id, comp,
         |    CASE WHEN $h < 80 THEN 'train'
         |         WHEN $h < 90 THEN 'valid'
         |         ELSE 'test' END AS split
         |  FROM comp),
         |sizes AS (SELECT comp, CAST(COUNT(1) AS BIGINT) AS comp_size
         |  FROM splt GROUP BY 1),
         |surv AS (
         |  SELECT s.doc_id, z.comp_size
         |  FROM splt s JOIN sizes z ON s.comp = z.comp
         |  WHERE s.doc_id = s.comp AND s.split = 'train'),
         |${CurationOps.feistelCtes("surv")}
         |SELECT m.doc_id, v.comp_size, m.perm,
         |  CAST(m.perm % 16 AS INT) AS shard,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY m.perm % 16
         |    ORDER BY m.perm ASC) AS BIGINT) AS pos
         |FROM pm m JOIN surv v ON m.doc_id = v.doc_id""".stripMargin
    },

    "emb_dedup_keep" -> {
      val pairsSql = SimilarityOps.oracle("sim_neardup_pairs")
      s"""WITH RECURSIVE pairs AS ($pairsSql),
         |edges AS (
         |  SELECT d1 AS src, d2 AS dst FROM pairs
         |  UNION
         |  SELECT d2 AS src, d1 AS dst FROM pairs),
         |reach(node, r) AS (
         |  SELECT vec_id, vec_id FROM embeddings
         |  UNION
         |  SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r),
         |comp AS (
         |  SELECT node, MIN(r) AS comp FROM reach GROUP BY 1)
         |SELECT e.vec_id, CAST(e.label AS BIGINT) AS label
         |FROM comp c JOIN embeddings e ON c.node = e.vec_id
         |WHERE c.node = c.comp""".stripMargin
    },

    // Independent recomputation: the oracle enumerates each triangle
    // once as an id-ordered triple a<b<c over the canonical (s<d) edge
    // list — NO degree orientation — so a bug in the engine's
    // orientation/wedge machinery cannot be mirrored here. lcc is the
    // same integer-ppm division (DuckDB // ≡ Spark div on BIGINT ≥ 0).
    "graph_triangles" ->
      s"""WITH $coPurchaseEdgeCte,
        |deg AS (
        |  SELECT n, COUNT(1) AS dg
        |  FROM (SELECT s AS n FROM e UNION ALL SELECT d FROM e)
        |  GROUP BY 1),
        |tri3 AS (
        |  SELECT e1.s AS a, e1.d AS b, e2.d AS c
        |  FROM e e1
        |  JOIN e e2 ON e2.s = e1.s AND e2.d > e1.d
        |  JOIN e e3 ON e3.s = e1.d AND e3.d = e2.d),
        |corners AS (
        |  SELECT n, COUNT(1) AS tri
        |  FROM (SELECT a AS n FROM tri3 UNION ALL
        |        SELECT b FROM tri3 UNION ALL
        |        SELECT c FROM tri3)
        |  GROUP BY 1)
        |SELECT deg.n AS node, deg.dg AS deg,
        |  COALESCE(corners.tri, 0) AS tri,
        |  CASE WHEN deg.dg >= 2
        |       THEN (2 * COALESCE(corners.tri, 0) * 1000000)
        |              // (deg.dg * (deg.dg - 1))
        |       ELSE 0 END AS lcc_ppm
        |FROM deg LEFT JOIN corners ON corners.n = deg.n""".stripMargin,

    // Independent recomputation of the SAME five integer rounds —
    // DuckDB's BIGINT // is Spark's div on non-negative values, and
    // integer sums are order-free, so the match is exact by design.
    "graph_pagerank" -> {
      val rounds = (1 to 5).map { i =>
        s"""r$i AS (
           |  SELECT sym.d AS node,
           |    CAST((SELECT tele FROM consts)
           |      + (85 * SUM(r${i - 1}.r // deg.dg)) // 100 AS BIGINT) AS r
           |  FROM sym
           |  JOIN r${i - 1} ON r${i - 1}.node = sym.s
           |  JOIN deg ON deg.n = sym.s
           |  GROUP BY sym.d)""".stripMargin
      }.mkString(",\n")
      s"""WITH $coPurchaseEdgeCte,
         |sym AS (SELECT s, d FROM e UNION ALL SELECT d AS s, s AS d FROM e),
         |deg AS (SELECT s AS n, COUNT(1) AS dg FROM sym GROUP BY 1),
         |consts AS (SELECT
         |  1000000000000 // COUNT(1) AS r0v,
         |  15000000000000 // (100 * COUNT(1)) AS tele FROM deg),
         |r0 AS (SELECT n AS node, (SELECT r0v FROM consts) AS r FROM deg),
         |$rounds
         |SELECT r5.node, deg.dg AS deg, r5.r AS rank_pico
         |FROM r5 JOIN deg ON deg.n = r5.node""".stripMargin
    }
  )

  /** The co-purchase edge list as a SQL CTE pair (`op`, `e`) — shared
    * by every graph-query oracle so engine and oracle agree on the
    * graph by construction. */
  private def coPurchaseEdgeCte: String =
    """op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e AS (
      |  SELECT a.l_partkey AS s, b.l_partkey AS d
      |  FROM op a JOIN op b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING COUNT(1) >= 2)""".stripMargin
}
