package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SimilarityOps
import graft.serving.IndexStore
import graft.streaming.StreamGraphServe

/** The streaming graph-ANN serving path (persisted src-bucketed edges
  * + node-bucketed vectors + frontier-pruned hop joins + TopKSimAgg)
  * must (a) reproduce the batch graph operator row for row when
  * serving from the ARTIFACT — same entry points, hop unrolling,
  * beam, tie-breaks, with every float having made a parquet roundtrip
  * — (b) read ONLY a frontier's buckets from both artifacts, and
  * (c) produce the SAME answers when the query workload arrives split
  * across micro-batches (foreachBatch). */
class StreamGraphServeSpec extends AnyFunSuite {

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

  private lazy val index: IndexStore.KnnIndex = {
    val dir = IndexStore.scratchDir("spec_knn", "knn")
    IndexStore.writeKnn(emb, dir)
    IndexStore.loadKnn(spark, dir)
  }

  private def asTuples(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  test("artifact serve ≡ graphTopK row for row (same entry points, hops, " +
    "beam, ties — through a parquet write/load roundtrip)") {
    val want = asTuples(SimilarityOps.graphTopK(emb, pred).collect())
    val got = asTuples(StreamGraphServe.serveTopK(
      emb.filter(pred).select(col("vec_id"), col("embedding")), index)
      .collect())
    assert(want.nonEmpty && got == want)
  }

  test("both artifact scans read ONLY the frontier's buckets: literal " +
    "PartitionFilters on sb (edges) and nb (nodes), pruned < total") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import spark.implicits._
    // a 2-node frontier for one query — the seed-hop shape
    val frontier = Seq((0L, 25L), (0L, 150L)).toDF("q_id", "node")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        SimilarityOps.norm(col("embedding")).as("q_nrm"))
    def audit(df: org.apache.spark.sql.DataFrame, part: String,
        sub: String): Unit = {
      val scans = df.queryExecution.sparkPlan.collect {
        case f: FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.contains(sub))
          => f
      }
      assert(scans.nonEmpty, s"must scan the persisted $sub artifact")
      scans.foreach { f =>
        val static = f.partitionFilters.filterNot(_.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
        assert(static.nonEmpty &&
          static.exists(_.references.exists(_.name == part)),
          s"$sub scan must carry a literal $part filter, got ${f.partitionFilters}")
        val pruned = f.relation.location.listFiles(static, Nil).length
        val total = f.relation.location.listFiles(Nil, Nil).length
        assert(pruned <= 2 && pruned < total,
          s"a 2-node frontier must read <= 2 $sub buckets, got $pruned of $total")
      }
    }
    audit(StreamGraphServe.expandFrontier(frontier, index), "sb", "/edges")
    audit(StreamGraphServe.scoreFrontier(frontier, q, index), "nb", "/nodes")
  }

  test("append (NSW search-then-connect): new nodes' out-edges are exactly " +
    "the graph-search top-KnnK against the base artifact; every new edge " +
    "carries its back-edge; appended nodes are servable and findable") {
    val newPred = SimilarityOps.graphAppendPred
    val dir = IndexStore.scratchDir("spec_knn_append", "knn")
    IndexStore.writeKnn(emb.filter(!newPred), dir)
    val base = IndexStore.loadKnn(spark, dir)
    val want = StreamGraphServe.serveTopK(
        emb.filter(newPred).select(col("vec_id"), col("embedding")), base,
        k = SimilarityOps.KnnK)
      .select(col("q_id"), col("n_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    IndexStore.appendKnn(emb.filter(newPred), dir)
    val idx = IndexStore.loadKnn(spark, dir)
    val newIds = emb.filter(newPred).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(newIds.nonEmpty && want.nonEmpty)
    val edges = idx.edges.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.filter(e => newIds(e._1)).toSet == want,
      "out-edges of appended nodes = the search results, exactly")
    assert(edges.filter(e => newIds(e._2)).toSet == want.map(p => (p._2, p._1)),
      "every new edge has its mirror back-edge")
    // the node store carries the appended vectors
    val nodeIds = idx.nodes.select("node").collect().map(_.getLong(0)).toSet
    assert(newIds.subsetOf(nodeIds))
    // findability: serve each appended node's own vector under a FRESH
    // query id — reachable only through a neighbor's back-edge; when
    // visited, sim 1.0 ranks it first
    val probes = emb.filter(newPred).orderBy("vec_id").limit(8)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val served = StreamGraphServe.serveTopK(probes, idx).collect()
      .map(r => (r.getLong(0) - 1000000L, r.getLong(1), r.getLong(2)))
    val selfTop = served.filter(r => r._1 == r._2 && r._3 == 1L).map(_._1).toSet
    info(s"self-findable at rank 1: ${selfTop.size} of 8 probed appended nodes")
    assert(selfTop.size >= 4,
      "most appended nodes must be findable through back-edges (measured 8/8)")
  }

  test("sliced append: a near-dup pair planted in ONE batch gets NO mutual " +
    "edge with slices=1 (the documented bulk trade-off) and a direct " +
    "edge + mirror with slices=2, both findable; cost delta measured") {
    import spark.implicits._
    val x = emb.filter(col("vec_id") === 10)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    // two fresh ids landing in DIFFERENT md5 slices (the split the
    // sliced append uses), both carrying x's exact vector
    val sliceOf = (2000001L to 2000100L).toDF("vec_id")
      .select(col("vec_id"), graft.ops.TextOps.strHash(
        concat(lit("knnslice:"), col("vec_id").cast("string")))
        .mod(lit(2L)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val idA = sliceOf.find(_._2 == 0L).get._1
    val idB = sliceOf.find(_._2 == 1L).get._1
    val batch = Seq((idA, x), (idB, x))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val pair = Set(idA, idB)
    def pairEdges(dir: String): Set[(Long, Long)] =
      IndexStore.loadKnn(spark, dir).edges.select("src", "dst").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .filter(e => pair(e._1) && pair(e._2)).toSet
    val d1 = IndexStore.scratchDir("spec_knn_slice1", "knn")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d1))
    IndexStore.writeKnn(emb, d1)
    val t1 = System.nanoTime()
    IndexStore.appendKnn(batch, d1)
    val plainMs = (System.nanoTime() - t1) / 1000000
    assert(pairEdges(d1).isEmpty,
      "slices=1: batch-mates never link (the documented bulk trade-off)")
    val d2 = IndexStore.scratchDir("spec_knn_slice2", "knn")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d2))
    IndexStore.writeKnn(emb, d2)
    val t2 = System.nanoTime()
    IndexStore.appendKnn(batch, d2, slices = 2)
    val slicedMs = (System.nanoTime() - t2) / 1000000
    assert(pairEdges(d2) == Set((idB, idA), (idA, idB)),
      "slices=2: the later slice links the earlier near-dup directly, " +
        "with its mirror back-edge")
    info(s"append cost: slices=1 ${plainMs} ms, slices=2 ${slicedMs} ms " +
      f"(${slicedMs.toDouble / plainMs}%.2fx)")
    // mutual findability: each copy's vector (fresh q_id) returns the other
    val probes = Seq((9000001L, x), (9000002L, x))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val served = StreamGraphServe.serveTopK(probes,
      IndexStore.loadKnn(spark, d2)).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(Seq(9000001L, 9000002L).forall(q =>
      pair.subsetOf(served.filter(_._1 == q).map(_._2).toSet)),
      "both planted near-dups are served for their shared vector")
  }

  test("compact: every out-degree pruned back to exactly each src's " +
    "top-KnnK by cosine; one file set per bucket; the pruned index serves") {
    val newPred = SimilarityOps.graphAppendPred
    val dir = IndexStore.scratchDir("spec_knn_compact", "knn")
    IndexStore.writeKnn(emb.filter(!newPred), dir)
    IndexStore.appendKnn(emb.filter(newPred), dir)
    def filesPerBucket(sub: String): Map[String, Int] = {
      val root = new java.io.File(IndexStore.tableDir(spark, dir, sub))
      root.listFiles().filter(f => f.isDirectory && f.getName.contains("="))
        .map(d => d.getName ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    }
    assert(filesPerBucket("edges").values.exists(_ > 1),
      "an append must add file sets to touched edge buckets")
    val bEdges = IndexStore.loadKnn(spark, dir).edges
      .select("src", "dst").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(bEdges.groupBy(_._1).values.exists(_.length > SimilarityOps.KnnK),
      "back-edges must overfill some out-degree")
    // expected retention: per src, top-KnnK by (cos DESC, dst ASC) —
    // recomputed locally with the kernel's exact sequential double fold
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
    val wantKeep = bEdges.groupBy(_._1).toSeq.flatMap { case (s, es) =>
      es.toSeq.map(e => (e._2, cos(vecs(s), vecs(e._2))))
        .sortBy(t => (-t._2, t._1)).take(SimilarityOps.KnnK)
        .map(t => (s, t._1))
    }.toSet
    IndexStore.compactKnn(spark, dir)
    val after = IndexStore.loadKnn(spark, dir)
    val aEdges = after.edges.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(aEdges.length == aEdges.toSet.size, "no duplicate edges survive")
    assert(aEdges.toSet == wantKeep,
      "compaction keeps exactly each src's top-KnnK out-edges")
    assert(filesPerBucket("edges").values.forall(_ == 1) &&
      filesPerBucket("nodes").values.forall(_ == 1),
      "one file set per bucket after compaction")
    val served = StreamGraphServe.serveTopK(
      emb.filter(pred).select(col("vec_id"), col("embedding")), after).collect()
    assert(served.nonEmpty, "the pruned index still serves")
  }

  test("generation manifests: a COLD load during compaction (after the new " +
    "generation is written, before its manifest commits) resolves the old, " +
    "complete generation; after commit the new one; old generations GC'd") {
    val newPred = SimilarityOps.graphAppendPred
    val dir = IndexStore.scratchDir("spec_knn_gen", "knn")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    IndexStore.writeKnn(emb.filter(!newPred), dir)
    IndexStore.appendKnn(emb.filter(newPred), dir)
    val gen0 = IndexStore.currentGen(spark, dir)
    assert(gen0.contains(0), s"write+append stay in generation 0, got $gen0")
    def edgeSet(): Set[(Long, Long)] =
      IndexStore.loadKnn(spark, dir).edges.select("src", "dst").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val preCompact = edgeSet()
    var midGen: Option[Int] = None
    var midEdges: Set[(Long, Long)] = Set.empty
    IndexStore.compactKnn(spark, dir, () => {
      midGen = IndexStore.currentGen(spark, dir)
      midEdges = edgeSet()
    })
    assert(midGen == gen0,
      "mid-compaction, the committed generation is still the old one")
    assert(midEdges == preCompact,
      "a cold load mid-compaction serves the OLD generation's full edge set")
    assert(IndexStore.currentGen(spark, dir).contains(1),
      "the commit flips the manifest to the new generation")
    assert(new java.io.File(s"$dir/g0").exists() &&
      new java.io.File(s"$dir/manifest-0.json").exists(),
      "the previous generation survives ONE commit (reader grace period)")
    assert(edgeSet().nonEmpty && edgeSet() != preCompact,
      "the new generation carries the degree-pruned edge table")
  }

  test("reader grace period: a WARM reader of generation N-1 completes its " +
    "scan after the commit of N; a SECOND commit GC's N-1; orphans of " +
    "failed attempts are GC'd regardless") {
    val dir = IndexStore.scratchDir("spec_knn_grace", "knn")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    IndexStore.writeKnn(emb, dir)                       // gen 0
    val warm = IndexStore.loadKnn(spark, dir)           // reader holds gen 0
    // an orphan from a failed attempt: a generation dir with no manifest
    new java.io.File(s"$dir/g7/edges").mkdirs()
    IndexStore.compactKnn(spark, dir)                   // commits gen 1
    assert(new java.io.File(s"$dir/g0").exists(),
      "gen 0 is retained through the commit of gen 1")
    assert(!new java.io.File(s"$dir/g7").exists(),
      "a manifest-less orphan is GC'd at commit")
    // the warm reader's lazy DataFrames still resolve gen-0 files
    val oldScan = warm.edges.select("src", "dst").collect()
    assert(oldScan.nonEmpty, "the warm gen-0 reader completes its scan")
    IndexStore.compactKnn(spark, dir)                   // commits gen 2
    assert(!new java.io.File(s"$dir/g0").exists() &&
      !new java.io.File(s"$dir/manifest-0.json").exists(),
      "gen 0 is GC'd by the SECOND commit (GenRetain = 2)")
    assert(new java.io.File(s"$dir/g1").exists(),
      "gen 1 (now N-1) is retained")
    assert(IndexStore.currentGen(spark, dir).contains(2))
  }

  test("writer coordination: a racing writer that committed the same next " +
    "generation first makes the loser's commit FAIL (manifest created with " +
    "overwrite=false) instead of silently GC'ing the winner's work") {
    val dir = IndexStore.scratchDir("spec_knn_race", "knn")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    IndexStore.writeKnn(emb, dir)                       // gen 0
    // the loser: compactKnn resolves next gen = 1, writes its tables,
    // then — via the midCompaction seam, i.e. BEFORE its own commit —
    // the racing winner's manifest-1 lands
    val ex = intercept[Exception] {
      IndexStore.compactKnn(spark, dir, () => {
        val f = new java.io.FileOutputStream(s"$dir/manifest-1.json")
        f.write("""{"gen":1}""".getBytes("UTF-8")); f.close()
      })
    }
    assert(ex != null)
    assert(new java.io.File(s"$dir/g0").exists() &&
      new java.io.File(s"$dir/manifest-0.json").exists(),
      "the failed commit GC'd nothing — gen 0 intact")
  }

  test("filtered serve (filtered-DiskANN shape): traversal is UNFILTERED, " +
    "every returned row matches the predicate, the rows are the true top-k " +
    "of the matching VISITED set, and it strictly beats naive post-filter") {
    val labels = emb.select(col("vec_id"), col("label"))
    val q = emb.filter(pred).select(col("vec_id"), col("embedding"))
    val mod = SimilarityOps.FilterLabelMod
    val got = StreamGraphServe.serveFilteredTopK(q, index, labels).collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getLong(2) % mod == 0),
      "every returned row matches the metadata predicate")
    // expected: top-10 of the matching subset of the SAME (unfiltered)
    // visited set — recomputed from the exposed gather
    val labelMap = emb.select(col("vec_id"), col("label").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (qn, gathered) = StreamGraphServe.gatherVisited(q, index,
      SimilarityOps.GraphBeam, SimilarityOps.GraphSeeds,
      SimilarityOps.GraphHops)
    val want = StreamGraphServe.scoreFrontier(gathered, qn, index).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(t => labelMap(t._2) % mod == 0)
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(t => (-t._3, t._2)).take(10).map(t => (t._1, t._2)).toSeq
      }.toSet
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet == want,
      "the answer is the true top-k of the matching visited set")
    // naive post-filter (rank THEN drop) silently returns fewer
    // matching rows whenever the unfiltered top-k holds ineligible ones
    val naive = StreamGraphServe.serveTopK(q, index).collect()
      .count(r => labelMap(r.getLong(1)) % mod == 0)
    info(s"filtered rows ${got.length} vs naive post-filter $naive")
    assert(naive < got.length,
      "emit-stage filtering must beat naive post-filter on this corpus")
  }

  test("serveStreamFrom: a generation committed BETWEEN micro-batches is " +
    "served from the next batch on (per-batch manifest re-resolve), while " +
    "the earlier batch's answers stand on the generation they started with") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val newPred = SimilarityOps.graphAppendPred
    val dir = IndexStore.scratchDir("spec_knn_live", "knn")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    IndexStore.writeKnn(emb.filter(!newPred), dir)       // gen 0: base only
    val probes = emb.filter(newPred).orderBy("vec_id").limit(4)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def expect(): Set[(Long, Long, Long, Double)] = asTuples(
      StreamGraphServe.serveTopK(
        probes.toSeq.toDF("vec_id", "embedding")
          .select(col("vec_id"), col("embedding").cast("array<float>")),
        IndexStore.loadKnn(spark, dir)).collect())
    val want0 = expect()
    val mem = MemoryStream[(Long, Array[Float])]
    val qdf = mem.toDF().select(col("_1").as("vec_id"),
      col("_2").cast("array<float>").as("embedding"))
    val perBatch = scala.collection.mutable.ArrayBuffer
      .empty[Set[(Long, Long, Long, Double)]]
    val query = StreamGraphServe.serveStreamFrom(qdf, dir) { (out, _) =>
      perBatch.synchronized { perBatch += asTuples(out.collect()) }
    }
    try {
      mem.addData(probes.toSeq: _*); query.processAllAvailable()
      assert(perBatch.synchronized(perBatch.head) == want0,
        "batch 1 serves generation 0")
      // mid-stream maintenance: full rebuild over base + delta → gen 1
      IndexStore.writeKnn(emb, dir)
      val want1 = expect()
      assert(want1 != want0,
        "the rebuilt generation must answer differently for these probes")
      mem.addData(probes.toSeq: _*); query.processAllAvailable()
      assert(perBatch.synchronized(perBatch.last) == want1,
        "batch 2 serves the NEW generation committed between batches")
      assert(perBatch.synchronized(perBatch.head) == want0,
        "batch 1's answers stand")
    } finally query.stop()
  }

  test("stream ≡ batch: queries split across 3 micro-batches (foreachBatch " +
    "against the loaded artifact) produce the batch twin's answers, " +
    "each query emitted in its own batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val queries = emb.filter(pred)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    assert(queries.length >= 3)
    val want = asTuples(StreamGraphServe.serveTopK(
      emb.filter(pred).select(col("vec_id"), col("embedding")), index).collect())

    val mem = MemoryStream[(Long, Array[Float])]
    val qdf = mem.toDF().select(col("_1").as("vec_id"),
      col("_2").cast("array<float>").as("embedding"))
    val perBatch = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[(Long, Long, Long, Double)])]
    val query = StreamGraphServe.serveStream(qdf, index) { (out, id) =>
      perBatch.synchronized { perBatch += id -> asTuples(out.collect()) }
    }
    try {
      val (b1, rest) = queries.splitAt(1)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      mem.addData(b1: _*); query.processAllAvailable()
      val afterB1 = perBatch.synchronized(perBatch.flatMap(_._2).toSet)
      assert(afterB1.map(_._1) == b1.map(_._1).toSet,
        "a query's answer must complete within its own micro-batch")
      mem.addData(b2: _*); query.processAllAvailable()
      mem.addData(b3: _*); query.processAllAvailable()
      val got = perBatch.synchronized(perBatch.flatMap(_._2).toSet)
      assert(got == want, "streamed answers must equal the batch twin's")
    } finally query.stop()
  }
}
