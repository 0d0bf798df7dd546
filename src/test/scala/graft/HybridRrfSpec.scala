package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SimilarityOps
import graft.ops.TextOps

/** Hybrid retrieval by reciprocal-rank fusion (`hybridRrf`): the
  * integer-ppm RRF arithmetic replays locally from the two input
  * rankings, a doc present in BOTH lists beats the same ranks held
  * singly, and the fused list is a permutation of the union of the
  * two top-k lists. */
class HybridRrfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val (docs, emb) = {
    spark.sparkContext.setLogLevel("WARN")
    (Tables.t(spark, "/root/testdata/sf0.01", "documents"),
      Tables.t(spark, "/root/testdata/sf0.01", "embeddings"))
  }

  test("fused ranking replays locally from the two input rankings") {
    val out = SimilarityOps.hybridRrf(docs, emb).collect()
      .map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        r.getLong(3), r.getLong(4)))
    // rebuild the two rankings independently
    val wb = org.apache.spark.sql.expressions.Window
      .orderBy(col("score_u").desc, col("doc_id").asc)
    val bm = TextOps.bm25TopDocs(docs)
      .withColumn("r", row_number().over(wb))
      .select("doc_id", "r").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val vr = SimilarityOps.bruteForceTopK(emb, col("vec_id") === 0, 20)
      .select("n_id", "rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val union = (bm.keySet ++ vr.keySet).toSeq
    val fused = union.map { id =>
      val s = bm.get(id).map(r => 1000000L / (60 + r)).getOrElse(0L) +
        vr.get(id).map(r => 1000000L / (60 + r)).getOrElse(0L)
      (id, s)
    }.sortBy { case (id, s) => (-s, id) }.take(20)
    assert(out.length == fused.length)
    out.sortBy(_._5).zip(fused).foreach { case (got, (id, s)) =>
      assert(got._1 == id && got._4 == s, s"rank ${got._5}: $got vs ($id,$s)")
      assert(got._2 == bm.get(id) && got._3 == vr.get(id))
    }
    // non-vacuous fusion: at least one doc appears in both lists OR
    // the two lists genuinely interleave
    info(s"bm25∩vector overlap: ${(bm.keySet & vr.keySet).size} docs")
  }

  test("a doc topping BOTH modalities fuses to overall rank 1") {
    import spark.implicits._
    // doc 7: stuffed with every BM25 query term (lexical top) AND its
    // embedding is the query vector itself scaled (cosine 1.0, vector
    // top). The sf0.01 corpus has 0 natural overlap, so this pins the
    // fusion path the corpus can't.
    val sdocs = (1 to 30).map(i => (i.toLong,
      if (i == 7) "vector spark query data hash vector spark query data hash"
      else s"filler text number $i nothing relevant here at all"))
      .toDF("doc_id", "text")
    val base = Seq(0.5f, -0.25f, 0.125f, 1.0f)
    val sembs = ((0L, base) +: (1 to 30).map(i => (i.toLong,
      if (i == 7) base.map(x => x * 2.0f)
      else Seq(math.sin(i * 1.7).toFloat, math.cos(i * 2.3).toFloat,
        math.sin(i * 0.9).toFloat, math.cos(i * 1.1).toFloat))))
      .toDF("vec_id", "embedding")
    val out = SimilarityOps.hybridRrf(sdocs, sembs, queryVecId = 0L, k = 10)
      .orderBy("rank").collect()
    assert(out.head.getLong(0) == 7L, s"expected doc 7 first, got ${out.head}")
    assert(out.head.getLong(1) == 1L && out.head.getLong(2) == 1L)
  }

  test("a doc in both lists outranks the same single-list ranks") {
    // pure arithmetic property of the fusion rule at any rank r ≥ 1:
    // 1/(60+r) + 1/(60+r') > max single contribution
    for (r <- 1 to 20; r2 <- 1 to 20) {
      val both = 1000000L / (60 + r) + 1000000L / (60 + r2)
      assert(both > 1000000L / (60 + r) && both > 1000000L / (60 + r2))
    }
  }
}
