package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SimilarityOps

/** Fixed-point power-iteration PCA (`pcaPower`): recovers a planted
  * dominant direction, degenerates gracefully on an isotropic/constant
  * corpus, relies on cross-engine truncating-division parity
  * (asserted), and replays bit-for-bit against a straight-line local
  * recompute of mean → center → Gram → matvec rounds. */
class PcaPowerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("integral division truncates toward zero in BOTH engines' semantics") {
    spark.sparkContext.setLogLevel("WARN")
    // the whole fixed-point pipeline (means and normalization touch
    // negatives) leans on Spark div ≡ DuckDB // ≡ Java / — trunc, not
    // floor. DuckDB verified manually: (-7)//2 = -3.
    assert(spark.sql("SELECT -7 div 2").first().getLong(0) == -3L)
    assert(spark.sql("SELECT 7 div -2").first().getLong(0) == -3L)
  }

  test("recovers a planted dominant direction") {
    import spark.implicits._
    // x_k = t·u + small noise, u = (3,4,0,...)/5; deterministic noise
    val d = 8
    val u = Array(0.6, 0.8) ++ Array.fill(d - 2)(0.0)
    val rows = (0 until 400).map { k =>
      val t = (k % 21 - 10) / 10.0 // spread along u
      val x = (0 until d).map { i =>
        (t * u(i) + 0.01 * math.sin(k * 12.9898 + i * 78.233)).toFloat
      }
      (k.toLong, x)
    }.toDF("vec_id", "embedding")
    val out = SimilarityOps.pcaPower(rows).collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val v = (0 until d).map(i => out(i).toDouble)
    val cos = v.zip(u).map { case (a, b) => a * b }.sum /
      (math.sqrt(v.map(x => x * x).sum) * math.sqrt(u.map(x => x * x).sum))
    info(f"planted-direction |cos| = ${math.abs(cos)}%.4f")
    assert(math.abs(cos) > 0.99)
  }

  test("constant corpus: zero Gram, v stays at the init, w_last = 0") {
    import spark.implicits._
    val rows = (0 until 50)
      .map(k => (k.toLong, Seq(0.25f, -0.5f, 0.125f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = SimilarityOps.pcaPower(rows).collect()
    assert(out.forall(r => r.getLong(1) == 1000L && r.getLong(2) == 0L))
  }

  test("abttApply: pure on-axis corpus leaves ~zero residual, spread projections") {
    import spark.implicits._
    // vectors exactly t·u (no noise): after removing the top component
    // the residual must be quantization-level only, while the
    // projection p tracks t monotonically
    val d = 8
    val u = Array(0.6f, 0.8f) ++ Array.fill(d - 2)(0.0f)
    val rows = (0 until 200).map { k =>
      val t = (k % 21 - 10) / 10.0f
      (k.toLong, u.map(x => x * t).toSeq)
    }.toDF("vec_id", "embedding")
    val v = SimilarityOps.pcaPower(rows).collect()
      .sortBy(_.getLong(0)).map(_.getLong(1))
    val vv = v.map(x => x * x).sum
    val out = SimilarityOps.abttApply(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // res_l1 is in vv-scaled micro units; compare it against the
    // vector's own vv-scaled L1 mass — on-axis content must be ≥ 99 %
    // (the only residual source is v's milli-scale rounding)
    out.foreach { case (id, _, res) =>
      val t = (id % 21 - 10) / 10.0
      val xuL1 = u.map(x => math.abs(math.round(x * t * 1e6))).sum
      if (xuL1 > 0)
        assert(res.toDouble / (xuL1.toDouble * vv) < 0.01,
          s"vec $id residual fraction ${res.toDouble / (xuL1.toDouble * vv)}")
    }
    // projection is monotone in |t|: t=0 projects to ~0, t=-1 to max
    val byId = out.map(r => r._1 -> r._2).toMap
    assert(math.abs(byId(10L)) < math.abs(byId(0L))) // t=0 vs t=-1
    assert(out.map(r => math.abs(r._2)).max > 0)
  }

  test("abttApply replays locally from the trained direction") {
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val v = SimilarityOps.pcaPower(emb).collect()
      .sortBy(_.getLong(0)).map(_.getLong(1))
    val vv = v.map(x => x * x).sum
    val out = SimilarityOps.abttApply(emb).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding").collect().foreach { r =>
        val xu = r.getSeq[Float](1).map(f => math.round(f.toDouble * 1e6)).toArray
        val p = xu.zip(v).map { case (a, b) => a * b }.sum
        val res = xu.zip(v).map { case (a, b) => math.abs(a * vv - p * b) }.sum
        assert(out(r.getLong(0)) == ((p, res)), s"vec ${r.getLong(0)}")
      }
  }

  test("straight-line local replay on the real corpus matches stage for stage") {
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val data = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val d = data.values.head.length
    val n = data.size
    val xu = data.map { case (id, x) =>
      id -> x.map(f => math.round(f.toDouble * 1e6))
    }
    val mean = (0 until d).map(i => xu.values.map(_(i)).sum / n)
    val cm = xu.map { case (id, x) =>
      id -> (0 until d).map(i => (x(i) - mean(i)) / 1000L).toArray
    }
    val g = Array.tabulate(d, d)((i, j) =>
      cm.values.map(v => v(i) * v(j)).sum)
    var v = Array.fill(d)(1000L)
    var w = Array.fill(d)(0L)
    for (_ <- 1 to SimilarityOps.PcaRounds) {
      w = Array.tabulate(d)(i => (0 until d).map(j => g(i)(j) * v(j)).sum)
      val mx = w.map(math.abs).max
      if (mx != 0L) v = w.map(x => x * 1000L / mx)
    }
    val out = SimilarityOps.pcaPower(emb).collect()
      .map(r => r.getLong(0).toInt -> (r.getLong(1), r.getLong(2))).toMap
    (0 until d).foreach { i =>
      assert(out(i) == ((v(i), w(i))), s"dim $i: ${out(i)} vs (${v(i)},${w(i)})")
    }
  }

  test("top-D: planted two-direction corpus recovered through deflation") {
    import spark.implicits._
    // x = a·u1 + b·u2 on an exact product grid (a ⟂ b by construction),
    // amplitude ratio 2.5 ⇒ eigen-gap ~6×: after 3 power rounds the
    // contamination of v1 is (1/6.25)³ ≈ 0.4 %, and Hotelling deflation
    // must expose u2 as the dominant direction of the residual Gram
    val d = 8
    val u1 = Array(0.6, 0.8) ++ Array.fill(d - 2)(0.0)
    val u2 = Array(0.0, 0.0, 1.0) ++ Array.fill(d - 3)(0.0)
    val rows = (0 until 400).map { k =>
      val a = ((k / 20) - 9.5) / 10.0
      val b = ((k % 20) - 9.5) / 25.0
      (k.toLong, (0 until d).map(i => (a * u1(i) + b * u2(i)).toFloat))
    }.toDF("vec_id", "embedding")
    val dirs = SimilarityOps.pcaPowerDirs(rows, nDirs = 2)
    def cosWith(v: Array[Long], u: Array[Double]): Double = {
      val num = v.zip(u).map { case (x, y) => x * y }.sum
      num / (math.sqrt(v.map(x => x.toDouble * x).sum) *
        math.sqrt(u.map(x => x * x).sum))
    }
    val c1 = math.abs(cosWith(dirs(0), u1))
    val c2 = math.abs(cosWith(dirs(1), u2))
    info(f"planted |cos(v1,u1)| = $c1%.4f, |cos(v2,u2)| = $c2%.4f")
    assert(c1 > 0.98, s"direction 1 not recovered: $c1")
    assert(c2 > 0.95, s"direction 2 not recovered after deflation: $c2")
    // and the D=2 apply drains the corpus: both planted directions
    // removed, residual down to milli-rounding of the removal chain
    val applied = SimilarityOps.abttTopD(rows, nDirs = 2).collect()
    applied.foreach { r =>
      val id = r.getLong(0)
      val a = ((id / 20) - 9.5) / 10.0
      val b = ((id % 20) - 9.5) / 25.0
      val xuL1 = (0 until d).map(i =>
        math.abs(math.round((a * u1(i) + b * u2(i)) * 1e6))).sum
      val res = r.getLong(3)
      if (xuL1 > 1000)
        assert(res.toDouble / xuL1 < 0.02,
          s"vec $id residual fraction ${res.toDouble / xuL1}")
    }
    // single-direction apply CANNOT drain it: u2-mass survives
    val one = SimilarityOps.abttTopD(rows, nDirs = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val survivors = one.count { case (id, res) =>
      val b = ((id % 20) - 9.5) / 25.0
      res > math.abs(b) * 1e6 * 0.5 // at least half the u2 L1 mass left
    }
    assert(survivors > 300, s"expected u2 mass to survive 1-dir removal: $survivors")
  }
}
