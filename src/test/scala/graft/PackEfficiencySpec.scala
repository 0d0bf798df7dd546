package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.CurationOps

/** Budget-sizing table (`export_pack_efficiency`): row-for-row
  * consistency with the packed export it sizes, token conservation,
  * and the waste/straddle tradeoff direction. */
class PackEfficiencySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 200 docs of 100 tokens each — shard totals are hand-derivable. */
  private def docs = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    (0 until 200).map(i =>
      (i.toLong, Seq.fill(100)("w").mkString(" "))).toDF("doc_id", "text")
  }

  test("each budget row reproduces the packed export's own arithmetic") {
    val eff = CurationOps.packEfficiency(docs, 4, Seq(512L)).collect()
    assert(eff.length == 1)
    val row = eff.head
    val packed = CurationOps.exportPackedSequences(docs, 4, 512L)
      .collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    // n_seqs = sum over shards of ceil(shard_tokens / 512)
    val perShard = packed.groupBy(_._2).map { case (_, rs) => rs.map(_._1).sum }
    val expSeqs = perShard.map(t => (t + 511) / 512).sum
    assert(row.getAs[Long]("n_seqs") == expSeqs)
    assert(row.getAs[Long]("used_tokens") == 200L * 100L)
    assert(row.getAs[Long]("capacity_tokens") == expSeqs * 512L)
    // straddle = docs whose offset + n_tokens crosses the budget
    val expStraddle = packed.count { case (n, _, _, off) => off + n > 512L }
    assert(row.getAs[Long]("n_straddle") == expStraddle.toLong)
    val cap = expSeqs * 512L
    assert(row.getAs[Long]("waste_ppm") == (cap - 20000L) * 1000000L / cap)
  }

  test("the tradeoff axis: bigger budgets never straddle fewer docs per boundary count") {
    val eff = CurationOps.packEfficiency(docs, 4, Seq(128L, 256L, 512L, 1024L))
      .collect()
      .map(r => (r.getAs[Long]("budget"), r.getAs[Long]("n_seqs"),
        r.getAs[Long]("used_tokens"), r.getAs[Long]("capacity_tokens"),
        r.getAs[Long]("n_straddle")))
      .sortBy(_._1)
    assert(eff.length == 4)
    eff.foreach { case (budget, nSeqs, used, cap, _) =>
      assert(used == 20000L)
      assert(cap == nSeqs * budget && cap >= used)
    }
    // 100-token docs: halving the budget cannot reduce boundary crossings
    assert(eff.map(_._5).toSeq == eff.map(_._5).sortBy(-_).toSeq,
      "straddle count is non-increasing in budget for uniform docs")
    // sequence counts shrink as budgets grow
    assert(eff.map(_._2).toSeq == eff.map(_._2).sortBy(-_).toSeq)
  }

  test("partitioning-independence") {
    val a = CurationOps.packEfficiency(docs, 4).collect()
      .map(_.toSeq).toSet
    val b = CurationOps.packEfficiency(docs.repartition(7), 4).collect()
      .map(_.toSeq).toSet
    assert(a == b)
  }
}
