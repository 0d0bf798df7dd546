package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SimilarityOps
import graft.serving.IndexStore
import graft.streaming.StreamAnnServe

/** The streaming ANN serving path (persisted cid-partitioned index +
  * probed-cell partition pruning + TopKSimAgg) must (a) reproduce the
  * batch IVF operator row for row when serving from the ARTIFACT —
  * same centroids, probes, tie-breaks, with every float having made a
  * parquet roundtrip — and (b) produce the SAME answers when the
  * query workload arrives split across micro-batches (foreachBatch),
  * each query answered within its own batch. */
class StreamAnnServeSpec extends AnyFunSuite {

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

  private lazy val index: IndexStore.AnnIndex = {
    val dir = IndexStore.scratchDir("spec_ann", "ann")
    IndexStore.writeAnn(emb, dir, SimilarityOps.IvfCentroids)
    IndexStore.loadAnn(spark, dir)
  }

  private def asTuples(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  test("artifact serve ≡ ivfTopK row for row (same first-K centroids, probes, " +
    "ties — through a parquet write/load roundtrip)") {
    val want = asTuples(SimilarityOps.ivfTopK(emb, pred,
      nCentroids = SimilarityOps.IvfCentroids, nProbe = SimilarityOps.IvfProbe)
      .collect())
    val got = asTuples(StreamAnnServe.serveTopK(
      emb.filter(pred).select(col("vec_id"), col("embedding")), index,
      nProbe = SimilarityOps.IvfProbe)
      .collect())
    assert(want.nonEmpty && got == want)
  }

  test("CellProbe: exhaustive probe returns every live cell in exact " +
    "(sim DESC, cid ASC) order; nProbe=1 is its head") {
    val cents = StreamAnnServe.collectCentroids(emb, SimilarityOps.IvfCentroids)
    val k = cents.length
    val full = emb.filter(pred)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.cell_probe(col("embedding"), cents, k).as("cids"),
        graft.functions.VectorFunctions.cell_probe(col("embedding"), cents, 1).as("one"))
      .collect()
    assert(full.nonEmpty)
    // reference ordering via the window formulation the kernel replaces
    val wanted = emb.filter(pred)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        SimilarityOps.norm(col("embedding")).as("q_nrm"))
      .crossJoin(emb.filter(col("vec_id") < SimilarityOps.IvfCentroids)
        .select(col("vec_id").as("cid"), col("embedding").as("c_emb"),
          SimilarityOps.norm(col("embedding")).as("c_nrm")))
      .withColumn("c_sim",
        SimilarityOps.dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
      .select("q_id", "cid", "c_sim")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(r => (-r.getDouble(2), r.getLong(1))).map(_.getLong(1)).toSeq
      }
    full.foreach { r =>
      val q = r.getLong(0)
      assert(r.getSeq[Long](1) == wanted(q),
        s"kernel ordering must equal the window formulation for q=$q")
      assert(r.getSeq[Long](2) == wanted(q).take(1))
    }
  }

  test("the artifact scan reads ONLY probed partitions: PartitionFilters on " +
    "cid, pruned partition count == the query's probed cells < K") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val oneQuery = emb.filter(col("vec_id") === 75)
      .select(col("vec_id"), col("embedding"))
    val served = StreamAnnServe.serveTopK(oneQuery, index,
      nProbe = SimilarityOps.IvfProbe)
    val scans = served.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("/assign"))
        => f
    }
    assert(scans.nonEmpty, "the serve must scan the persisted assignment")
    scans.foreach { f =>
      // keep only statically-evaluable predicates (the probed-cid isin
      // literal) — DPP subqueries also land in partitionFilters but
      // cannot be interpreted outside execution
      val static = f.partitionFilters.filterNot(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
      assert(static.nonEmpty &&
        static.exists(_.references.exists(_.name == "cid")),
        s"assign scan must carry a literal cid partition filter, got ${f.partitionFilters}")
      val pruned = f.relation.location.listFiles(static, Nil).length
      val total = f.relation.location.listFiles(Nil, Nil).length
      assert(pruned == SimilarityOps.IvfProbe && pruned < total,
        s"one query at nProbe=${SimilarityOps.IvfProbe} must read exactly its " +
          s"probed cells, got $pruned of $total partitions")
    }
  }

  test("physical append: delta vectors assigned against the artifact's " +
    "FROZEN centroids land in their cells; the appended index serves " +
    "exactly like an in-memory index over the full corpus") {
    val newPred = col("vec_id") % 8 === 7 // the serve_index_append split
    val base = emb.filter(!newPred)
    val delta = emb.filter(newPred)
    val dir = IndexStore.scratchDir("spec_ann_append", "ann")
    IndexStore.writeAnn(base, dir, SimilarityOps.IvfCentroids)
    IndexStore.appendAnn(delta, dir)
    val appended = IndexStore.loadAnn(spark, dir)
    // ground truth: the SAME frozen (base-trained) centroids over the
    // full corpus, assigned in memory
    val cents = appended.centroids
    val want = StreamAnnServe.serveTopK(
      emb.filter(pred).select(col("vec_id"), col("embedding")),
      IndexStore.AnnIndex(cents, StreamAnnServe.assignCorpus(emb, cents)
        .withColumn("cid", col("cid").cast("long"))))
      .collect()
    val got = StreamAnnServe.serveTopK(
      emb.filter(pred).select(col("vec_id"), col("embedding")), appended)
      .collect()
    assert(want.nonEmpty && asTuples(got) == asTuples(want),
      "append ≡ rebuild-under-frozen-centroids, row for row")
    // and the artifact genuinely contains the delta rows
    val nLoaded = appended.assign.count()
    val nExpected = StreamAnnServe.assignCorpus(emb, cents).count()
    assert(nLoaded == nExpected)

    // --- compaction: appends accumulate file sets per cell; compact
    // rewrites each cell to one file set with IDENTICAL serve results
    def filesPerCell(): Map[String, Int] = {
      val root = new java.io.File(IndexStore.tableDir(spark, dir, "assign"))
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("cid="))
        .map(d => d.getName ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    }
    val before = filesPerCell()
    assert(before.values.exists(_ > 1),
      s"an append must add file sets to touched cells, got $before")
    IndexStore.compactAnn(spark, dir)
    val after = filesPerCell()
    assert(after.values.forall(_ == 1),
      s"compaction must leave one file per cell, got $after")
    val servedAfter = StreamAnnServe.serveTopK(
      emb.filter(pred).select(col("vec_id"), col("embedding")),
      IndexStore.loadAnn(spark, dir)).collect()
    assert(asTuples(servedAfter) == asTuples(want),
      "compaction must not change a single served row")
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
    val want = asTuples(StreamAnnServe.serveTopK(
      emb.filter(pred).select(col("vec_id"), col("embedding")), index).collect())

    val mem = MemoryStream[(Long, Array[Float])]
    val qdf = mem.toDF().select(col("_1").as("vec_id"),
      col("_2").cast("array<float>").as("embedding"))
    val perBatch = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[(Long, Long, Long, Double)])]
    val query = StreamAnnServe.serveStream(qdf, index) { (out, id) =>
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
