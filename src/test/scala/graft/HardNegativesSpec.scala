package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SimilarityOps

/** Contrastive pair mining: label contracts and ranking shape. */
class HardNegativesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val emb = {
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.t(spark, "/root/testdata/sf0.01", "embeddings")
  }
  private lazy val labelOf: Map[Long, Long] =
    emb.select(col("vec_id"), col("label").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap

  private lazy val mined =
    SimilarityOps.hardNegatives(emb, col("vec_id") % 20 === 0)
      .select("anchor", "role", "other", "rank", "sim").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))

  test("label contract: pos rows share the anchor's label, neg rows differ") {
    assert(mined.nonEmpty)
    mined.foreach { case (a, role, o, _, _) =>
      if (role == "pos") assert(labelOf(a) == labelOf(o), s"pos ($a,$o)")
      else assert(labelOf(a) != labelOf(o), s"neg ($a,$o)")
    }
  }

  test("ranking shape: one pos, <= negK negs, contiguous ranks, sims non-increasing") {
    mined.groupBy(t => (t._1, t._2)).foreach { case ((_, role), rows) =>
      val sorted = rows.sortBy(_._4)
      val limit = if (role == "pos") 1 else SimilarityOps.HnNegK
      assert(sorted.length <= limit)
      assert(sorted.map(_._4).toSeq == (1L to sorted.length.toLong))
      assert(sorted.map(_._5).toSeq == sorted.map(_._5).sorted.reverse.toSeq,
        "sim non-increasing with rank")
    }
  }

  test("a planted same-label near-duplicate is chosen as the positive") {
    import spark.implicits._
    // anchor 0 with a near-identical copy (id 500, same label) and
    // orthogonal-ish fillers of the other label — the copy must win pos
    def v(seed: Int): Array[Float] =
      Array.tabulate(8)(j => (((seed * 31 + j * 17) % 13) - 6).toFloat)
    val rows = Seq(
      (0L, v(1), 1),
      (500L, v(1).map(x => x + 0.01f), 1),
      (501L, v(5), 2), (502L, v(9), 2), (503L, v(11), 1))
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.hardNegatives(df, col("vec_id") === 0L,
        nCentroids = 4, nProbes = 2)
      .filter(col("role") === "pos").collect()
    assert(out.length == 1)
    assert(out(0).getLong(2) == 500L)
  }
}
