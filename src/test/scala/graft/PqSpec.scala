package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SimilarityOps

/** Product-quantization ANN: the quantities the DuckDB hash-compare
  * can't express — recall vs the exact-L2 truth set, the
  * shortlist-width knob's exactness limit, and distributed-execution
  * invariance of the encode. */
class PqSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val emb = {
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.t(spark, "/root/testdata/sf0.01", "embeddings")
  }
  private val pred = col("vec_id") % 100 === 0

  /** Exact L2 top-k — the truth set the two-stage PQ path approximates. */
  private def exactL2TopK(k: Int): Set[(Long, Long)] = {
    val c = emb.filter(col("embedding").isNotNull &&
        size(col("embedding")) === SimilarityOps.OracleDim)
      .select(col("vec_id"), col("embedding"))
    val q = c.filter(pred)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val dist = graft.functions.VectorFunctions.vec_dot(
      zip_with(col("q_emb"), col("embedding"), (x, y) => x - y),
      zip_with(col("q_emb"), col("embedding"), (x, y) => x - y))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("d").asc, col("vec_id").asc)
    c.join(broadcast(q), col("q_id") =!= col("vec_id"))
      .withColumn("d", dist)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("two-stage PQ (ADC shortlist 50 + exact rerank) recall@10 vs exact L2") {
    val truth = exactL2TopK(10)
    val got = SimilarityOps.pqTopK(emb, pred, k = 10, dim = SimilarityOps.OracleDim)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(truth).size.toDouble / truth.size
    info(f"PQ recall@10 = $recall%.3f (shortlist=${SimilarityOps.PqShortlist}, " +
      f"${SimilarityOps.PqSubs}x${SimilarityOps.PqCodes} codes = 8 B/vector)")
    assert(got.size == truth.size, "same cardinality (k per query)")
    // isotropic random 64-dim embeddings are PQ's worst case (no
    // cluster structure for the sample-trained codebook to exploit);
    // the 5x-overfetch rerank recovers most ADC ranking error
    assert(recall >= 0.5, f"recall $recall%.3f")
  }

  test("shortlist spanning the corpus makes the two-stage result EXACT") {
    val truth = exactL2TopK(10)
    val got = SimilarityOps.pqTopK(emb, pred, k = 10, shortlist = 1000,
        dim = SimilarityOps.OracleDim)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // with every corpus row in the shortlist, the rerank IS brute
    // force — the ADC stage can only reorder, never exclude
    assert(got == truth)
  }

  test("PQ encode: codes in range, one per subspace, partitioning-invariant") {
    val enc = SimilarityOps.pqEncode(emb, dim = SimilarityOps.OracleDim)
      .select(col("vec_id"), col("codes"))
    val rows = enc.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.length == SimilarityOps.PqSubs)
      assert(codes.forall(c => c >= 0 && c < SimilarityOps.PqCodes))
    }
    val repart = SimilarityOps.pqEncode(emb.repartition(7, col("vec_id")),
        dim = SimilarityOps.OracleDim)
      .select(col("vec_id"), col("codes"))
    assert(repart.collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toMap ==
      rows.map(r => (r.getLong(0), r.getSeq[Int](1))).toMap,
      "codes independent of input partitioning")
  }

  test("IVF-PQ (8/64 cells probed + ADC + rerank) recall@10 vs exact L2") {
    val truth = exactL2TopK(10)
    val got = SimilarityOps.ivfPqTopK(emb, pred, k = 10, dim = SimilarityOps.OracleDim)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(truth).size.toDouble / truth.size
    val scanned = SimilarityOps.IvfPqProbe.toDouble / SimilarityOps.IvfPqCells
    info(f"IVF-PQ recall@10 = $recall%.3f scanning ~${scanned * 100}%.0f%% of codes " +
      f"(${SimilarityOps.IvfPqProbe}/${SimilarityOps.IvfPqCells} cells, 8 B/vector)")
    // measured 0.60 on the deterministic sf0.01 corpus — ABOVE pure
    // PQ's 0.52 at 13% of the scan: the L2 cells prune mostly
    // non-neighbors, so the ADC shortlist wastes fewer slots
    assert(recall >= 0.5, f"recall $recall%.3f")
    assert(got.size == truth.size)
  }

  test("IVF-PQ probing ALL cells converges to the pure-PQ two-stage result") {
    val pq = SimilarityOps.pqTopK(emb, pred, k = 10, dim = SimilarityOps.OracleDim)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = SimilarityOps.ivfPqTopK(emb, pred, k = 10,
        nProbe = SimilarityOps.IvfPqCells, dim = SimilarityOps.OracleDim)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // with every cell probed the IVF layer is a no-op: same codes, same
    // ADC, same shortlist, same rerank metric ordering (cosine-free
    // L2 both paths for the shortlist; rerank metrics differ — L2 vs
    // L2 — so the sets must coincide exactly)
    assert(all == pq)
  }

  test("native PQ kernels are bit-identical to the interpreted HOF forms") {
    val dim = SimilarityOps.OracleDim
    val (m, k) = (SimilarityOps.PqSubs, SimilarityOps.PqCodes)
    val cb = SimilarityOps.pqCodebookRow(emb, dim, m, k)
    val base = emb.filter(col("embedding").isNotNull && size(col("embedding")) === dim)
      .select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(cb))
    // encode parity: fused argmin kernel vs transform/array_min tower
    val encCmp = base
      .withColumn("native", graft.functions.VectorFunctions
        .pq_encode(col("embedding"), col("fcb"), m, k))
      .withColumn("hof", SimilarityOps.pqEncodeHof(dim, m, k))
      .filter(not(col("native") === col("hof")))
    assert(encCmp.count() == 0, "pq_encode kernel == HOF on every row")
    // ADC parity: fused distance kernel vs aggregate-over-sequence,
    // compared EXACTLY (double equality — same fold grouping)
    val q = base.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val adcCmp = base
      .withColumn("codes", graft.functions.VectorFunctions
        .pq_encode(col("embedding"), col("fcb"), m, k))
      .join(broadcast(q), col("q_id") =!= col("vec_id"))
      .withColumn("native", graft.functions.VectorFunctions
        .pq_adc(col("q_emb"), col("codes"), col("fcb"), m, k))
      .withColumn("hof", SimilarityOps.pqAdcHof(dim, m, k))
      .filter(not(col("native") === col("hof")))
    assert(adcCmp.count() == 0, "pq_adc kernel == HOF on every pair")
  }

  test("vec_dot_n kernel is bit-identical to vec_dot over slice() copies, " +
    "for every prefix width incl. over-length") {
    val base = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"))
    val q = base.filter(pred)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val pairs = base.join(broadcast(q), col("q_id") =!= col("vec_id"))
    Seq(1, 4, 16, 64, 1000).foreach { n =>
      val cmp = pairs
        .withColumn("native", graft.functions.VectorFunctions
          .vec_dot_n(col("q_emb"), col("embedding"), n))
        .withColumn("sliced", graft.functions.VectorFunctions
          .vec_dot(slice(col("q_emb"), 1, n), slice(col("embedding"), 1, n)))
        .filter(not(col("native") === col("sliced")))
      assert(cmp.count() == 0, s"vec_dot_n($n) == vec_dot(slice($n)) on every pair")
    }
  }

  test("codebook row: M*K sub-codewords of subspace width") {
    val cb = SimilarityOps.pqCodebookRow(emb, dim = SimilarityOps.OracleDim)
      .collect()
    assert(cb.length == 1)
    val fcb = cb(0).getSeq[scala.collection.Seq[Float]](0)
    assert(fcb.length == SimilarityOps.PqSubs * SimilarityOps.PqCodes)
    assert(fcb.forall(_.length == SimilarityOps.PqSubDim))
  }
}
