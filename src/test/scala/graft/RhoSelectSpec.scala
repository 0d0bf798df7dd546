package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextOps

/** RHO-style learnability selection (`curate_rho_select`): the
  * keep-rule replays locally from the output, bigram-structured text
  * separates from frequency-matched scrambled text, and fates are
  * partitioning-independent. */
class RhoSelectSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 120 docs: even ids cycle a FIXED bigram chain (every transition
    * repeats corpus-wide — the KN arm learns it), odd ids walk the
    * same 8-word vocabulary in an id-dependent stride (uniform
    * unigram mass, but transitions scatter). Both classes land in the
    * doc_id % 4 = 0 reference split. */
  private def docs = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val vocab = Vector("alpha", "beta", "gamma", "delta",
      "eps", "zeta", "eta", "theta")
    (0 until 120).map { i =>
      val words =
        if (i % 2 == 0) (0 until 40).map(p => vocab(p % 8))
        // quadratic position hash: transitions scatter within and
        // across docs (a constant stride would itself be a chain)
        else (0 until 40).map(p => vocab((p * p * 7 + i * 13 + p) % 8))
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("keep == excess strictly above the truncated corpus mean") {
    val rows = TextOps.rhoSelect(docs).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    val mean = rows.map(_._2).sum / rows.length
    rows.foreach { case (id, ex, keep) =>
      assert(keep == (ex > mean), s"doc $id: excess=$ex mean=$mean")
    }
    assert(rows.exists(_._3) && rows.exists(!_._3), "both fates occur")
  }

  test("bigram structure scores higher excess than scrambled text") {
    val rows = TextOps.rhoSelect(docs).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    val structured = rows.filter(_._1 % 2 == 0).map(_._2)
    val scrambled = rows.filter(_._1 % 2 == 1).map(_._2)
    assert(structured.nonEmpty && scrambled.nonEmpty)
    assert(structured.sum / structured.length >
      scrambled.sum / scrambled.length,
      "the chain docs' transitions are the learnable mass")
    // and the selection tracks the classes: every kept doc is
    // structured on this corpus
    val keep = TextOps.rhoSelect(docs).collect()
      .filter(_.getBoolean(4)).map(_.getLong(0))
    assert(keep.forall(_ % 2 == 0))
  }

  test("fates are partitioning-independent") {
    val a = TextOps.rhoSelect(docs).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4))).toSet
    val b = TextOps.rhoSelect(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4))).toSet
    assert(a == b)
  }
}
