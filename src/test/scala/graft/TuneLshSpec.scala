package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SimilarityOps

/** Closed-loop LSH band tuning: tuneLsh must return the
  * measured-cheapest (nBands, bitsPerBand) meeting the recall SLO,
  * with the audit run through `nearDupRecall` and the cost meter
  * through the serving pipeline's own candidate front end — the
  * near-dup twin of TuneIvfSpec. */
class TuneLshSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val emb = {
    spark.sparkContext.setLogLevel("WARN")
    Tables.t(spark, "/root/testdata/sf0.01", "embeddings").cache()
  }

  test("tuneLsh returns the measured-cheapest config meeting 0.8 recall at sf0.01") {
    val (chosen, all) = SimilarityOps.tuneLsh(emb, recallSlo = 0.8,
      dim = SimilarityOps.OracleDim)
    assert(all.size == SimilarityOps.DefaultLshGrid.size)
    assert(chosen.isDefined, s"no config met the SLO: $all")
    val c = chosen.get
    info(s"chosen: $c")
    all.foreach(m => info(s"  measured: $m"))
    assert(c.recallPpm >= 800000L)
    val meeting = all.filter(_.recallPpm >= 800000L)
    val best = meeting.sortBy(m => (m.candPairs, m.nBands, -m.bitsPerBand)).head
    assert(c == best)
    // the committed driver params are on the grid and meet the SLO
    // (the hand-picked NdBands×NdBits sweep, now closed-loop)
    val committed = all.find(m =>
      m.nBands == SimilarityOps.NdBands && m.bitsPerBand == SimilarityOps.NdBits)
    assert(committed.isDefined)
    assert(committed.get.recallPpm >= 800000L,
      s"committed banding no longer meets its own SLO: $committed")
    // the tuner may beat the hand-picked config, never return a more
    // expensive one
    assert(c.candPairs <= committed.get.candPairs)
  }

  test("recall audit and cost meter agree with independent recomputes") {
    val (chosen, _) = SimilarityOps.tuneLsh(emb, recallSlo = 0.8,
      grid = Seq((SimilarityOps.NdBands, SimilarityOps.NdBits)),
      dim = SimilarityOps.OracleDim)
    val c = chosen.get
    val rec = SimilarityOps.nearDupRecall(emb, SimilarityOps.NdTau,
      c.nBands, c.bitsPerBand, SimilarityOps.OracleDim)
      .agg(sum("n_found"), sum("n_exact")).collect()(0)
    assert(c.recallPpm == rec.getLong(0) * 1000000L / rec.getLong(1))
    // cost sanity: candidate pairs bounded by all-pairs, and strictly
    // below it — the point of banding
    val n = emb.count()
    assert(c.candPairs > 0 && c.candPairs < n * (n - 1) / 2)
  }

  test("unreachable SLO returns None, with the full table still measured") {
    val (chosen, all) = SimilarityOps.tuneLsh(emb, recallSlo = 1.1,
      grid = Seq((4, 5), (8, 8)), dim = SimilarityOps.OracleDim)
    assert(chosen.isEmpty)
    assert(all.size == 2)
  }
}
