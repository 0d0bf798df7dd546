package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The vector-similarity auto-rewrite rule: a pure-SQL cosine / squared-
  * distance theta-join must (a) stop planning as a cartesian and
  * (b) return EXACTLY the rows the naive plan returns — the rule is a
  * prune, not an approximation (unlike the ops layer's recall-tuned
  * banded LSH). Oracles are exhaustive driver-side double loops through
  * the same arithmetic, immune to the rule. */
class VecSimJoinRuleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession).foreach(_.stop())
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("vecsimrule-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  /** driver-side reference copies of the kernels' zero-padded math */
  private def sqdist(a: Array[Float], b: Array[Float]): Double = {
    val n = math.max(a.length, b.length)
    var acc = 0.0; var i = 0
    while (i < n) {
      val d = (if (i < a.length) a(i).toDouble else 0.0) -
        (if (i < b.length) b(i).toDouble else 0.0)
      acc += d * d; i += 1
    }
    acc
  }
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    val n = math.max(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = if (i < a.length) a(i).toDouble else 0.0
      val y = if (i < b.length) b(i).toDouble else 0.0
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private lazy val vecs: Array[(Long, Array[Float])] = {
    val emb = Tables.t(spark, "/root/testdata/sf0.01", "embeddings")
    emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
  }

  private def setupViews(): Unit = {
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.t(spark, "/root/testdata/sf0.01", "embeddings")
    emb.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
      .createOrReplaceTempView("va")
    emb.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
      .createOrReplaceTempView("vb")
  }

  private def assertRewritten(df: org.apache.spark.sql.DataFrame): Unit = {
    val planStr = df.queryExecution.executedPlan.toString
    assert(!planStr.contains("CartesianProduct") && !planStr.contains("NestedLoop"),
      s"rewritten plan must not be a cartesian:\n$planStr")
    assert(planStr.contains("SortMergeJoin") || planStr.contains("ShuffledHashJoin"),
      s"expected a shuffled equi-join:\n$planStr")
  }

  test("cosine theta-join rewrites to a grid equi-join with identical results") {
    setupViews()
    val tau = 0.45 // the corpus's near-pair knee — nonempty but selective
    val df = spark.sql(
      s"""SELECT a_id, b_id FROM va JOIN vb
         |  ON vec_cos_sim(a_emb, b_emb) >= $tau AND a_id < b_id""".stripMargin)
    assertRewritten(df)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      (ai, a) <- vecs; (bi, b) <- vecs
      if ai < bi && cos(a, b) >= tau
    } yield (ai, bi)).toSet
    assert(got == expected,
      s"mismatch: extra=${(got -- expected).take(5)} missing=${(expected -- got).take(5)}")
    assert(got.nonEmpty, "threshold must produce at least one pair")
  }

  test("sqdist theta-join rewrites to a grid equi-join with identical results") {
    setupViews()
    // pick t at a small quantile of pair distances so the join is selective
    val t = 9.0
    val df = spark.sql(
      s"""SELECT a_id, b_id FROM va JOIN vb
         |  ON vec_sqdist(a_emb, b_emb) <= $t AND a_id < b_id""".stripMargin)
    assertRewritten(df)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      (ai, a) <- vecs; (bi, b) <- vecs
      if ai < bi && sqdist(a, b) <= t
    } yield (ai, bi)).toSet
    assert(got == expected,
      s"mismatch: extra=${(got -- expected).take(5)} missing=${(expected -- got).take(5)}")
    assert(got.nonEmpty, "threshold must produce at least one pair")
  }

  test("flipped literal form and extra conjuncts still match the pattern") {
    setupViews()
    val df = spark.sql(
      """SELECT a_id, b_id FROM va JOIN vb
        |  ON 0.45 <= vec_cos_sim(a_emb, b_emb) AND a_id % 2 = 0 AND a_id != b_id
        |""".stripMargin)
    assertRewritten(df)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      (ai, a) <- vecs; (bi, b) <- vecs
      if ai % 2 == 0 && ai != bi && cos(a, b) >= 0.45
    } yield (ai, bi)).toSet
    assert(got == expected)
  }

  test("unrewritable thresholds leave the plan alone (empty-result guard)") {
    setupViews()
    // tau > 1: no vector pair can match; radius undefined -> no rewrite
    val df = spark.sql(
      """SELECT a_id, b_id FROM va JOIN vb
        |  ON vec_cos_sim(a_emb, b_emb) >= 1.5""".stripMargin)
    assert(df.count() == 0L)
  }
}
