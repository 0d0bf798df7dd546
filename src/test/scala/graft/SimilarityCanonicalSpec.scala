package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{GraphOps, SimilarityOps}

/** Exact-canonicalization pre-pass (SimilarityOps.exactCanonicalReps):
  * the near-dup CC pipeline over reps-of-distinct-vectors must produce
  * the IDENTICAL keeper set as the direct form over every copy — rep =
  * min id of its copy-group, so min-over-reps ≡ min-over-all-copies.
  * The workload stresses every structural case:
  *   - exact copy-groups (the 100 TB motivation) of sizes 1..4;
  *   - a copy-group whose vector ALSO has a near-dup (scaled) vector —
  *     the expanded component must keep ONE keeper across both;
  *   - pathological rows the canonicalizer must NOT group: NULL
  *     embedding, zero vector, NaN vector — cos(x,x) ≠ 1 for those, so
  *     the direct path leaves each a singleton keeper and grouping
  *     them would merge distinct keepers.
  */
class SimilarityCanonicalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Tau = 0.95
  private val Bands = 8
  private val Bits = 8
  private val Dim = 8

  /** base direction vectors; near-dups are positive scalings (cos=1
    * with their base), far vectors are axis-distinct */
  private def corpus(): DataFrame = {
    import spark.implicits._
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val a = Seq(1.0, 2.0, 3.0, 4.0, 0.5, 1.5, 2.5, 3.5)
    val b = Seq(-4.0, 1.0, 0.0, 2.0, 3.0, -1.0, 2.0, 0.5)
    val rows: Seq[(Long, Option[Array[Float]], Long)] = Seq(
      // copy-group of 3 on vector a  → keeper 10
      (10L, Some(v(a: _*)), 0L), (11L, Some(v(a: _*)), 0L),
      (12L, Some(v(a: _*)), 0L),
      // near-dup of a (exact positive scaling, cos = 1): joins the
      // same component; copy of it too → still ONE keeper (10)
      (13L, Some(v(a.map(_ * 2): _*)), 0L),
      (14L, Some(v(a.map(_ * 2): _*)), 0L),
      // copy-group of 2 on unrelated vector b → keeper 20
      (20L, Some(v(b: _*)), 1L), (21L, Some(v(b: _*)), 1L),
      // singleton far vector → keeper 30
      (30L, Some(v(5.0, -3.0, 1.0, 0.0, -2.0, 4.0, -1.0, 2.0)), 2L),
      // NULL embedding, zero vector, NaN vector: singletons BOTH ways
      (40L, None, 3L),
      (41L, Some(v(0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)), 3L),
      (42L, Some(Array(Float.NaN, 1f, 1f, 1f, 1f, 1f, 1f, 1f)), 3L),
      // a SECOND zero vector and NaN vector: identical bytes, but
      // cos(x,x)=NaN/undefined → must stay separate keepers
      (43L, Some(v(0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)), 3L),
      (44L, Some(Array(Float.NaN, 1f, 1f, 1f, 1f, 1f, 1f, 1f)), 3L)
    )
    rows.toDF("vec_id", "embedding", "label")
  }

  /** the pre-canonicalization formulation: LSH + CC over EVERY copy */
  private def direct(embs: DataFrame): DataFrame = {
    val edges = SimilarityOps.nearDupPairs(embs, tau = Tau,
      nBands = Bands, bitsPerBand = Bits, dim = Dim)
      .select(col("d1").as("src"), col("d2").as("dst"))
    GraphOps.connectedComponents(embs.select(col("vec_id").as("node")), edges)
      .filter(col("node") === col("comp"))
      .join(embs.select(col("vec_id"), col("label")), col("node") === col("vec_id"))
      .select(col("vec_id"), col("label"))
  }

  private def canonical(embs: DataFrame): DataFrame = {
    val reps = SimilarityOps.exactCanonicalReps(embs)
    val edges = SimilarityOps.nearDupPairs(reps, tau = Tau,
      nBands = Bands, bitsPerBand = Bits, dim = Dim)
      .select(col("d1").as("src"), col("d2").as("dst"))
    GraphOps.connectedComponents(reps.select(col("vec_id").as("node")), edges)
      .filter(col("node") === col("comp"))
      .join(embs.select(col("vec_id"), col("label")), col("node") === col("vec_id"))
      .select(col("vec_id"), col("label"))
  }

  test("canonical reps: one min-id rep per distinct healthy vector; " +
    "null/zero/NaN rows pass through unmerged") {
    spark.sparkContext.setLogLevel("WARN")
    val reps = SimilarityOps.exactCanonicalReps(corpus())
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    // healthy distinct vectors → reps 10 (a×3), 13 (2a×2), 20 (b×2),
    // 30; unhealthy rows 40-44 all pass through individually
    assert(reps == Seq(10L, 13L, 20L, 30L, 40L, 41L, 42L, 43L, 44L))
  }

  test("canonical path produces the identical keeper set as the direct path") {
    val embs = corpus()
    val d = direct(embs).collect().map(_.toString).sorted.toSeq
    val c = canonical(embs).collect().map(_.toString).sorted.toSeq
    assert(c == d)
    // and the keeper set is the structurally expected one: the a-family
    // (copies + scaled near-dup + its copies) collapses to keeper 10
    assert(d.exists(_.startsWith("[10,")), d)
    assert(!d.exists(_.startsWith("[11,")) && !d.exists(_.startsWith("[13,")), d)
    // unhealthy rows each survive as their own keeper
    Seq(40L, 41L, 42L, 43L, 44L).foreach { id =>
      assert(d.exists(_.startsWith(s"[$id,")), s"missing singleton $id in $d")
    }
  }
}
