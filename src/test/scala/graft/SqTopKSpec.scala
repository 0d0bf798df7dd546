package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SimilarityOps

/** SQ8 integer-ADC serving (`sqTopK`): the scalar-quantized member of
  * the quantized-ANN family. Pins the exactness contract (a corpus-
  * wide shortlist collapses to the brute-force exact-dot ranking —
  * quantization can cost recall ONLY through shortlist truncation),
  * the int64-exactness bound that makes the shortlist ranking
  * bit-exact cross-engine, and the measured recall@10 at the default
  * shortlist. */
class SqTopKSpec extends AnyFunSuite {

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

  /** Brute-force exact-dot top-k — the ground truth sqTopK's rerank
    * stage approximates through the shortlist. */
  private def bruteDotTopK(k: Int) = {
    val q = emb.filter(pred)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val n = emb.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val w = Window.partitionBy("q_id").orderBy(col("dotp").desc, col("n_id").asc)
    q.join(n, col("q_id") =!= col("n_id"))
      .withColumn("dotp", SimilarityOps.dot(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank").cast("long").as("rank"))
  }

  test("corpus-wide shortlist collapses to the brute-force exact-dot ranking") {
    val n = emb.count().toInt
    val full = SimilarityOps.sqTopK(emb, pred, k = 10, shortlist = n)
      .select("q_id", "n_id", "rank")
    val truth = bruteDotTopK(10)
    assert(full.exceptAll(truth).isEmpty && truth.exceptAll(full).isEmpty)
  }

  test("integer ADC scores stay inside the double-exact window (< 2^53)") {
    // the shortlist aggregator carries the score as a double; the
    // int64 score must be exactly representable or map-side partial
    // top-k ordering could diverge from the SQL window's BIGINT order
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    val amaxU = emb.select(
      max(round(aggregate(col("embedding"), lit(0.0),
        (a, x) => greatest(a, abs(x.cast("double")))) * 1e6).cast("long")))
      .first().getLong(0)
    val bound = dim.toLong * 127L * 127L * amaxU
    info(s"dim=$dim amax_u max=$amaxU worst |score| = $bound")
    assert(bound < (1L << 53))
  }

  test("sqRecall: exhaustive shortlist reports recall 1.0 exactly, per query") {
    val n = emb.count().toInt
    val audit = SimilarityOps.sqRecall(emb, pred, k = 10, shortlist = n)
    assert(audit.filter(col("recall_ppm") =!= 1000000L).isEmpty)
    assert(audit.count() == emb.filter(pred).count())
  }

  test("recall@10 at the default shortlist, measured") {
    val served = SimilarityOps.sqTopK(emb, pred, k = 10)
      .select("q_id", "n_id")
    val truth = bruteDotTopK(10).select("q_id", "n_id")
    val hits = served.intersect(truth).count()
    val total = truth.count()
    info(f"sq8 recall@10 = ${hits.toDouble / total}%.2f ($hits/$total)")
    // int8 at full dimension is the gentlest quantizer in the ladder —
    // it must not do worse than the 8-bit RQ codes' measured 0.54
    assert(hits.toDouble / total >= 0.54)
  }
}
