package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{CurationOps, TextOps}

/** Curriculum-ordered export: band assignment from exact token
  * entropy, dense per-(band, shard) positions from the Feistel
  * bijection, and partitioning-invariant determinism. */
class CurriculumSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bands come from entropy; positions are dense per (band, shard)") {
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val out = CurationOps.curateCurriculum(docs).collect()
    assert(out.nonEmpty)
    // band = clamp(ent_mbits div 1000, 0, 3) row-wise
    out.foreach { r =>
      val want = math.min(3L, math.max(0L, r.getLong(1) / 1000L)).toInt
      assert(r.getInt(2) == want, s"band drift: $r")
    }
    // positions are 1..n dense within every (band, shard)
    out.groupBy(r => (r.getInt(2), r.getInt(3))).foreach { case (_, rows) =>
      val pos = rows.map(_.getLong(4)).sorted
      assert(pos.toSeq == (1L to rows.length).toSeq, s"gapped positions: $pos")
    }
    // every doc with tokens appears exactly once
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    val withToks = TextOps.tokenEntropy(docs).count()
    assert(out.length.toLong == withToks)
  }

  test("the schedule is a pure function of content (partitioning-invariant)") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val a = CurationOps.curateCurriculum(docs).collect().map(_.toString).sorted
    val b = CurationOps.curateCurriculum(docs.repartition(13)).collect()
      .map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("easy band precedes hard band by entropy: max(ent) of band b < min over band b+2 impossible") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val out = CurationOps.curateCurriculum(docs).collect()
    val byBand = out.groupBy(_.getInt(2)).view.mapValues(_.map(_.getLong(1)))
    for (b <- byBand.keys; c <- byBand.keys if b < c) {
      assert(byBand(b).max < (c.toLong * 1000) + 1000,
        s"band $b contains entropy beyond its ceiling")
      assert(byBand(c).min >= c.toLong * 1000 || c == 3,
        s"band $c contains entropy below its floor")
    }
  }
}
