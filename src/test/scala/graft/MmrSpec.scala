package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SimilarityOps

/** MMR diversified top-k (`mmrTopK`): the k-step integer greedy must
  * match a straight-line local reference on the engine's own candidate
  * and pair data (so a bug in the round joins cannot hide), step 1
  * must equal the relevance top-1, and the selection must actually
  * diversify — strictly lower intra-list similarity than plain top-k
  * on a corpus with near-dup cliques. */
class MmrSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val emb = {
    spark.sparkContext.setLogLevel("WARN")
    Tables.t(spark, "/root/testdata/sf0.01", "embeddings").cache()
  }
  private val pred = col("vec_id") % 100 === 0

  /** Straight-line greedy over collected per-query candidates — the
    * reference the distributed round-join formulation must equal.
    * `first` is the rank-1 candidate (raw-sim order, the engine's and
    * oracle's step-1 contract). */
  private def refMmr(first: Long, simq: Map[Long, Long],
      pair: Map[(Long, Long), Long], k: Int): Seq[Long] = {
    var sel = Vector(first)
    while (sel.size < k && sel.size < simq.size) {
      val next = simq.keys.filterNot(sel.contains).toSeq.map { c =>
        val mx = sel.map(s => pair((c, s))).max
        (c, simq(c) - mx)
      }.sortBy { case (id, sc) => (-sc, id) }.head._1
      sel = sel :+ next
    }
    sel
  }

  test("distributed greedy equals the straight-line reference per query") {
    val out = SimilarityOps.mmrTopK(emb, pred).cache()
    // rebuild the integer candidate/pair inputs exactly as the engine
    // derives them, then replay locally
    val q = emb.filter(pred)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = emb.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("n_id").asc)
    val cands = q.join(c, col("q_id") =!= col("n_id"))
      .withColumn("sim", SimilarityOps.dot(col("q_emb"), col("n_emb")) /
        (sqrt(SimilarityOps.dot(col("q_emb"), col("q_emb"))) *
          sqrt(SimilarityOps.dot(col("n_emb"), col("n_emb")))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= SimilarityOps.MmrCands)
      .select(col("q_id"), col("n_id"),
        round(col("sim") * 1e6).cast("long").as("simq_u"), col("rank"))
      .collect()
    val byQ = cands.groupBy(_.getLong(0))
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cosU(a: Long, b: Long): Long = {
      val (x, y) = (vecs(a), vecs(b))
      var d = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- x.indices) {
        d += x(i).toDouble * y(i).toDouble
        nx += x(i).toDouble * x(i).toDouble
        ny += y(i).toDouble * y(i).toDouble
      }
      math.round(d / (math.sqrt(nx) * math.sqrt(ny)) * 1e6)
    }
    byQ.foreach { case (qid, rows) =>
      val simq = rows.map(r => r.getLong(1) -> r.getLong(2)).toMap
      val first = rows.find(_.getInt(3) == 1).get.getLong(1)
      val ids = simq.keys.toSeq
      val pair = (for (a <- ids; b <- ids if a != b)
        yield (a, b) -> cosU(a, b)).toMap
      val expect = refMmr(first, simq, pair, 10)
      val got = out.filter(col("q_id") === qid).orderBy("step")
        .select("n_id").collect().map(_.getLong(0)).toSeq
      assert(got == expect, s"q=$qid: engine $got vs reference $expect")
    }
  }

  test("step 1 is the plain relevance top-1; steps are dense 1..k") {
    val out = SimilarityOps.mmrTopK(emb, pred).cache()
    val top1 = SimilarityOps.bruteForceTopK(emb, pred, 1)
      .select(col("q_id"), col("n_id").as("t1"))
    assert(out.filter(col("step") === 1)
      .join(top1, "q_id").filter(col("n_id") =!= col("t1")).isEmpty)
    val perQ = out.groupBy("q_id")
      .agg(count(lit(1)).as("n"), min("step").as("lo"), max("step").as("hi"),
        countDistinct("step").as("nd"))
    assert(perQ.filter(col("lo") =!= 1 || col("hi") =!= col("n") ||
      col("nd") =!= col("n")).isEmpty)
  }

  test("on a duplicate-clique corpus, MMR breaks up what plain top-k returns") {
    import spark.implicits._
    // 4 cliques of 8 EXACT copies of orthogonal axis vectors + a query
    // leaning mostly along axis 0: plain top-10 is dominated by
    // clique-0 copies (the near-dup serving failure); at λ=½ a second
    // copy scores simq − 10⁶ < 0 while an orthogonal clique scores its
    // full simq − 0, so MMR must cover all 4 cliques in its first 4
    def axisVec(axis: Int): Seq[Float] =
      (0 until 4).map(i => if (i == axis) 1.0f else 0.0f)
    val rows = (for (axis <- 0 until 4; j <- 0 until 8)
      yield (axis * 8 + j + 1L, axisVec(axis))).toDF("vec_id", "embedding")
      .unionByName(Seq((0L, Seq(0.8f, 0.5f, 0.3f, 0.1f)))
        .toDF("vec_id", "embedding"))
    val plain = SimilarityOps.bruteForceTopK(rows, col("vec_id") === 0, 10)
      .select("n_id").collect().map(_.getLong(0))
    val mmr = SimilarityOps.mmrTopK(rows, col("vec_id") === 0, k = 10)
      .orderBy("step").select("n_id").collect().map(_.getLong(0))
    def cliquesCovered(ids: Seq[Long], first: Int) =
      ids.take(first).map(id => (id - 1) / 8).distinct.size
    info(s"plain top-10: ${plain.mkString(",")}")
    info(s"mmr top-10:   ${mmr.mkString(",")}")
    assert(cliquesCovered(plain.toSeq, 8) == 1)
    assert(cliquesCovered(mmr.toSeq, 4) == 4)
  }
}
