package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SimilarityOps
import graft.serving.IndexStore
import graft.streaming.StreamGraphServe

/** The LAYERED (HNSW-shape) graph serving rung: hash-sampled upper
  * layers with mirrored degree-[[SimilarityOps.LayerK]] kNN edges,
  * greedy descent, committed beam at layer 0. Pinned here:
  *   - artifact serve ≡ the in-plan operator, row for row
  *   - the measured ladder entry: ≥ 0.8 recall@10 at ≤ 5 % of the
  *     corpus scanned on a hierarchically-clustered corpus (the
  *     structure real embedding corpora have; the driver's synthetic
  *     embeddings are iid noise, where recall at fraction f scanned
  *     is bounded near f for EVERY sublinear index — measured and
  *     documented in SURVEY §2.4)
  *   - the flat rung (committed degree 5, first-K entry scan) stays
  *     strictly below the layered rung on the same corpus/budget
  *   - hop scans carry literal (layer, sb) PartitionFilters
  *   - tombstone deletes mask the layered artifact too */
class LayeredGraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val emb = {
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  }
  private val pred = col("vec_id") % 25 === 0

  /** Hierarchically-clustered corpus: 6×6×6 nested gaussian clusters,
    * ids permuted (the first-K entry convention assumes id-random
    * corpora, true of the driver tables). */
  private lazy val hier: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val dim = 64; val b = 6; val nPer = 14
    val l1 = Array.fill(b)(Array.fill(dim)(rnd.nextGaussian()))
    val l2 = l1.flatMap(c => Array.fill(b)(c.map(_ + 0.6 * rnd.nextGaussian())))
    val l3 = l2.flatMap(c => Array.fill(b)(c.map(_ + 0.4 * rnd.nextGaussian())))
    val pts = l3.flatMap { c =>
      Array.fill(nPer)(c.map(x => (x + 0.12 * rnd.nextGaussian()).toFloat))
    }
    val perm = rnd.shuffle(pts.indices.toList)
    perm.zipWithIndex.map { case (p, id) => (id.toLong, pts(p)) }
      .toDF("vec_id", "embedding")
  }

  private def asTuples(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  private def fresh(name: String): String = {
    val dir = IndexStore.scratchDir(s"spec_layered_$name", "lknn")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    dir
  }

  test("artifact serve ≡ in-plan graphLayeredTopK row for row (same layer " +
    "sampling, descent, beam, ties — through a parquet roundtrip)") {
    val want = asTuples(
      SimilarityOps.graphLayeredTopK(emb, pred).collect())
    val dir = fresh("eq")
    IndexStore.writeKnnLayered(emb, dir)
    val got = asTuples(StreamGraphServe.serveLayeredTopK(
      emb.filter(pred).select(col("vec_id"), col("embedding")),
      IndexStore.loadKnnLayered(spark, dir)).collect())
    assert(want.nonEmpty && got == want)
  }

  test("measured ladder entry: >= 0.8 recall@10 at <= 5% scanned on the " +
    "hierarchical corpus, served from the artifact with DEFAULT params; " +
    "the flat rung stays below on the same corpus") {
    val n = hier.count()
    val qp = SimilarityOps.servingQueryPred(hier)
    val nQ = hier.filter(qp).count()
    val exact = SimilarityOps.bruteForceTopK(hier, qp)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dir = fresh("recall")
    IndexStore.writeKnnLayered(hier, dir)
    val idx = IndexStore.loadKnnLayered(spark, dir)
    val served = StreamGraphServe.serveLayeredTopK(
        hier.filter(qp).select(col("vec_id"), col("embedding")), idx)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = served.intersect(exact).size.toDouble / exact.size
    // scanned = distinct scored nodes per query, from the in-plan
    // twin's visited frame (serve ≡ in-plan is pinned above)
    val (_, visited) = SimilarityOps.graphLayeredSearch(
      hier, qp, 10, SimilarityOps.GraphBeam, SimilarityOps.GraphSeeds,
      SimilarityOps.GraphHops, SimilarityOps.GraphLayers)
    val scanned = visited.count().toDouble / nQ / n
    info(f"layered: recall=$recall%.3f scanned=${scanned * 100}%.1f%% " +
      f"(corpus $n, $nQ queries)")
    assert(recall >= 0.8, s"layered recall $recall must reach 0.8")
    assert(scanned <= 0.05, s"layered scan fraction $scanned must be <= 5%")
    val flat = SimilarityOps.graphTopK(hier, qp)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val flatRecall = flat.intersect(exact).size.toDouble / exact.size
    info(f"flat rung on the same corpus: recall=$flatRecall%.3f")
    assert(flatRecall < recall,
      "the layered rung must beat the flat rung on structured data")
  }

  test("hop scans carry literal (layer, sb) PartitionFilters — the layer " +
    "and the frontier's buckets both prune the (layer, sb)-partitioned " +
    "edge artifact") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import spark.implicits._
    val dir = fresh("prune")
    IndexStore.writeKnnLayered(emb, dir)
    val idx = IndexStore.loadKnnLayered(spark, dir)
    val frontier = Seq((0L, 25L), (0L, 150L)).toDF("q_id", "node")
    val df = StreamGraphServe.expandLayer(frontier, idx.edges, 1)
    val scans = df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("/ledges"))
        => f
    }
    assert(scans.nonEmpty)
    scans.foreach { f =>
      val static = f.partitionFilters.filterNot(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
      val refs = static.flatMap(_.references.map(_.name)).toSet
      assert(refs.contains("layer") && refs.contains("sb"),
        s"expected literal layer+sb filters, got ${f.partitionFilters}")
      val pruned = f.relation.location.listFiles(static, Nil).length
      val total = f.relation.location.listFiles(Nil, Nil).length
      assert(pruned <= 2 && pruned < total,
        s"a 2-node frontier must read <= 2 (layer,sb) partitions, " +
          s"got $pruned of $total")
    }
  }

  test("autoLayers: the smallest depth with E[N/16^L] <= LayerEntryBudget; " +
    "every oracled scale resolves to the SQL's unroll depth (2), the sf1 " +
    "replica to 3") {
    import SimilarityOps.{autoLayers, LayerFactor, LayerEntryBudget}
    assert(autoLayers(0) == 1 && autoLayers(256) == 1)
    assert(autoLayers(500) == 2, "sf0.001 / sf0.01 corpora")
    assert(autoLayers(2000) == 2, "sf0.1 bench corpus")
    assert(autoLayers(3024) == 2, "the hierarchical spec corpus")
    assert(autoLayers(20000) == 3, "the 10x sf1 replica")
    for (n <- Seq(1L, 100L, 4096L, 100000L, 10000000L, 1000000000L,
        1000000000000L)) {
      val l = autoLayers(n)
      def top(lv: Int) = (1 to lv).foldLeft(n)((a, _) => a / LayerFactor)
      assert(top(l) <= LayerEntryBudget,
        s"n=$n depth $l leaves the top layer over budget")
      assert(l == 1 || top(l - 1) > LayerEntryBudget,
        s"n=$n depth $l is deeper than needed")
    }
  }

  test("the artifact records its resolved depth (lmeta); serve, append " +
    "and compaction read it back instead of assuming a constant") {
    val dir = fresh("meta")
    IndexStore.writeKnnLayered(emb, dir) // N=500 -> auto depth 2
    assert(IndexStore.loadKnnLayered(spark, dir).layers == 2)
    // a pinned depth-3 build records 3, serves at 3, compacts at 3
    val dir3 = fresh("meta3")
    IndexStore.writeKnnLayered(emb, dir3, layers = 3)
    val idx3 = IndexStore.loadKnnLayered(spark, dir3)
    assert(idx3.layers == 3)
    val q = emb.filter(pred).select(col("vec_id"), col("embedding"))
    val got = asTuples(StreamGraphServe.serveLayeredTopK(q, idx3).collect())
    val want = asTuples(
      SimilarityOps.graphLayeredTopK(emb, pred, layers = 3).collect())
    assert(got.nonEmpty && got == want,
      "the serve descends exactly the recorded depth")
    IndexStore.compactKnnLayered(spark, dir3)
    assert(IndexStore.loadKnnLayered(spark, dir3).layers == 3,
      "compaction carries the frozen depth through")
  }

  test("layered append (HNSW insert, hash-derived levels): edges land only " +
    "at layers the vector's md5 level reaches, a new top-layer member " +
    "becomes an entry point, every edge is mirrored, appended nodes serve") {
    val newPred = SimilarityOps.graphAppendPred
    val dir = fresh("append")
    IndexStore.writeKnnLayered(emb.filter(!newPred), dir)
    val entriesBefore = IndexStore.loadKnnLayered(spark, dir)
      .entries.select("node").collect().map(_.getLong(0)).toSet
    IndexStore.appendKnnLayered(emb.filter(newPred), dir)
    val idx = IndexStore.loadKnnLayered(spark, dir)
    val newIds = emb.filter(newPred).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    // per-id md5 level, computed through the engine's own pred
    val levelOf = emb.filter(newPred).select(col("vec_id"),
        (0 to SimilarityOps.GraphLayers).map(l =>
          when(SimilarityOps.layerMemberPred(l), l).otherwise(-1))
          .reduce((a, b) => greatest(a, b)).as("lv"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val newEdges = idx.edges.select("layer", "src", "dst").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .filter(e => newIds(e._2) || newIds(e._3))
    assert(newEdges.nonEmpty)
    assert(newEdges.forall { case (l, s, d) =>
      val id = if (newIds(s)) s else d
      levelOf(id) >= l
    }, "an appended vector's edges exist ONLY at layers its level reaches")
    assert(newEdges.map(e => (e._1, e._3, e._2)).toSet
      .subsetOf(idx.edges.select("layer", "src", "dst").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet),
      "every appended edge carries its mirror")
    val topLayerNew = newIds.filter(id => levelOf(id) >= SimilarityOps.GraphLayers)
    val entriesAfter = idx.entries.select("node").collect()
      .map(_.getLong(0)).toSet
    assert((entriesAfter -- entriesBefore) == topLayerNew,
      "exactly the new TOP-layer members join the entry table")
    // appended nodes servable: probe each appended vector afresh
    val probes = emb.filter(newPred).orderBy("vec_id").limit(8)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val served = StreamGraphServe.serveLayeredTopK(probes, idx).collect()
      .map(r => (r.getLong(0) - 1000000L, r.getLong(1), r.getLong(2)))
    val selfTop = served.filter(r => r._1 == r._2 && r._3 == 1L).map(_._1).toSet
    info(s"self-findable at rank 1: ${selfTop.size} of 8 probed appended nodes")
    assert(selfTop.size >= 4,
      "most appended nodes findable through mirrors/entries")
  }

  test("layered compact: every (layer, src) out-degree pruned to exactly " +
    "its exact-cosine top-LayerK; tombstones dropped physically; the " +
    "compacted artifact serves the masked artifact's answers") {
    val delPred = SimilarityOps.graphDeletePred
    val dir = fresh("compact")
    IndexStore.writeKnnLayered(emb, dir)
    IndexStore.deleteKnn(emb.filter(delPred).select("vec_id"), dir)
    val masked = IndexStore.loadKnnLayered(spark, dir)
    val q = emb.filter(pred).select(col("vec_id"), col("embedding"))
    val servedMasked = asTuples(
      StreamGraphServe.serveLayeredTopK(q, masked).collect())
    // expected retention from the MASKED edge set, recomputed locally
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val bEdges = masked.edges.select("layer", "src", "dst").distinct()
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val wantKeep = bEdges.groupBy(e => (e._1, e._2)).toSeq.flatMap {
      case ((l, s), es) =>
        es.toSeq.map(e => (e._3, cos(vecs(s), vecs(e._3))))
          .sortBy(t => (-t._2, t._1)).take(SimilarityOps.LayerK)
          .map(t => (l, s, t._1))
    }.toSet
    IndexStore.compactKnnLayered(spark, dir)
    assert(!new java.io.File(
      IndexStore.tableDir(spark, dir, "tombstones")).exists(),
      "the compacted generation carries no tombstone table")
    val after = IndexStore.loadKnnLayered(spark, dir)
    val aEdges = after.edges.select("layer", "src", "dst").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(aEdges.length == aEdges.toSet.size, "no duplicate edges survive")
    assert(aEdges.toSet == wantKeep,
      "compaction keeps exactly each (layer, src)'s top-LayerK out-edges")
    assert(asTuples(StreamGraphServe.serveLayeredTopK(q, after).collect())
      .nonEmpty, "the pruned layered index still serves")
    val delIds = emb.filter(delPred).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(aEdges.forall(e => !delIds(e._2) && !delIds(e._3)),
      "tombstoned nodes physically gone from the compacted edges")
  }

  test("tuneGraphRung (the r14 'no layer axis' gap): at a 0.8 recall SLO " +
    "on the structured corpus the tuner picks the LAYERED rung — every " +
    "flat config measures below the SLO at any grid beam") {
    val qp = SimilarityOps.servingQueryPred(hier)
    val (chosen, all) = SimilarityOps.tuneGraphRung(hier, qp,
      recallSlo = 0.8, grid = Seq(4, 16))
    all.foreach(m => info(f"${m.rung}%-8s beam=${m.beam}%2d " +
      f"recall=${m.recallPpm / 1e6}%.3f scanned=${m.scannedRows}"))
    assert(chosen.isDefined, "the grid must contain an SLO-meeting config")
    assert(chosen.get.rung == "layered",
      "the layered rung is the only one reaching the SLO")
    assert(all.filter(_.rung == "flat").forall(_.recallPpm < 800000L),
      "no flat config reaches 0.8 on this corpus")
    val cheaper = all.filter(m => m.recallPpm >= 800000L)
      .minBy(m => (m.scannedRows, m.beam))
    assert(chosen.get == cheaper, "chosen = cheapest SLO-meeting config")
  }

  test("layered stream ≡ batch: queries split across 3 micro-batches " +
    "(serveLayeredStream, foreachBatch) produce the batch serve's answers; " +
    "serveLayeredStreamFrom picks up a mid-stream rebuild by the next batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val newPred = SimilarityOps.graphAppendPred
    val dir = fresh("stream")
    IndexStore.writeKnnLayered(emb.filter(!newPred), dir)
    val queries = emb.filter(pred)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    assert(queries.length >= 3)
    def expect(): Set[(Long, Long, Long, Double)] = asTuples(
      StreamGraphServe.serveLayeredTopK(
        emb.filter(pred).select(col("vec_id"), col("embedding")),
        IndexStore.loadKnnLayered(spark, dir)).collect())
    val want0 = expect()
    val mem = MemoryStream[(Long, Array[Float])]
    val qdf = mem.toDF().select(col("_1").as("vec_id"),
      col("_2").cast("array<float>").as("embedding"))
    val perBatch = scala.collection.mutable.ArrayBuffer
      .empty[Set[(Long, Long, Long, Double)]]
    val query = StreamGraphServe.serveLayeredStreamFrom(qdf, dir) { (out, _) =>
      perBatch.synchronized { perBatch += asTuples(out.collect()) }
    }
    try {
      val (b1, b2) = queries.splitAt(queries.length / 2)
      mem.addData(b1.toSeq: _*); query.processAllAvailable()
      mem.addData(b2.toSeq: _*); query.processAllAvailable()
      assert(perBatch.synchronized(perBatch.flatten.toSet) == want0,
        "streamed answers equal the batch serve's")
      // mid-stream rebuild over the full corpus → new generation
      IndexStore.writeKnnLayered(emb, dir)
      val want1 = expect()
      assert(want1 != want0)
      perBatch.synchronized(perBatch.clear())
      mem.addData(queries.toSeq: _*); query.processAllAvailable()
      assert(perBatch.synchronized(perBatch.flatten.toSet) == want1,
        "the next batch serves the generation committed mid-stream")
    } finally query.stop()
  }

  test("layered filtered serve: every row matches the predicate and the " +
    "rows are the true top-k of the matching UNFILTERED visited set") {
    val dir = fresh("filtered")
    IndexStore.writeKnnLayered(emb, dir)
    val idx = IndexStore.loadKnnLayered(spark, dir)
    val labels = emb.select(col("vec_id"), col("label"))
    val q = emb.filter(pred).select(col("vec_id"), col("embedding"))
    val mod = SimilarityOps.FilterLabelMod
    val got = StreamGraphServe.serveLayeredFilteredTopK(q, idx, labels)
      .collect()
    assert(got.nonEmpty && got.forall(_.getLong(2) % mod == 0))
    val labelMap = emb.select(col("vec_id"), col("label").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (qn, gathered) = StreamGraphServe.gatherLayeredVisited(q, idx,
      SimilarityOps.GraphBeam, SimilarityOps.GraphSeeds,
      SimilarityOps.GraphHops, SimilarityOps.GraphLayers,
      SimilarityOps.LayerHops)
    val want = StreamGraphServe.scoreNodes(gathered, qn, idx.nodes)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(t => labelMap(t._2) % mod == 0)
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(t => (-t._3, t._2)).take(10).map(t => (t._1, t._2)).toSeq
      }.toSet
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet == want,
      "the answer is the true top-k of the matching visited set")
  }

  test("tombstone deletes mask the layered artifact: deleted nodes are " +
    "neither entries, nor edge endpoints, nor served") {
    val delPred = SimilarityOps.graphDeletePred
    val dir = fresh("del")
    IndexStore.writeKnnLayered(emb, dir)
    IndexStore.deleteKnn(emb.filter(delPred).select("vec_id"), dir)
    val delIds = emb.filter(delPred).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    val idx = IndexStore.loadKnnLayered(spark, dir)
    assert(idx.entries.select("node").collect()
      .forall(r => !delIds(r.getLong(0))))
    assert(idx.edges.select("src", "dst").collect()
      .forall(r => !delIds(r.getLong(0)) && !delIds(r.getLong(1))))
    val served = StreamGraphServe.serveLayeredTopK(
      emb.filter(pred).select(col("vec_id"), col("embedding")), idx).collect()
    assert(served.nonEmpty &&
      served.forall(r => !delIds(r.getLong(1))))
  }
}
