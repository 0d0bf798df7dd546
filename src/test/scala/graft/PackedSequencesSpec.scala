package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.CurationOps

/** Packed-sequence export (`export_packed_sequences`): the
  * seq_id·budget + offset = cum-tokens-before invariant (the loader's
  * whole contract), greedy boundary behavior, token conservation, and
  * partitioning-independence of every assignment. */
class PackedSequencesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 200 docs of 100 tokens each (no empties, so in-shard order by
    * (seq_id, offset) is exactly perm order). */
  private def docs = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    (0 until 200).map(i =>
      (i.toLong, Seq.fill(100)("w").mkString(" "))).toDF("doc_id", "text")
  }

  private def packed(nShards: Int = 4, budget: Long = 512L) =
    CurationOps.exportPackedSequences(docs, nShards, budget).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))

  test("seq_id*budget + offset reproduces the exact running token sum per shard") {
    val rows = packed()
    rows.groupBy(_._3).foreach { case (shard, rs) =>
      val inOrder = rs.sortBy(r => (r._4, r._5)) // = perm order (no 0-token docs)
      var cum = 0L
      inOrder.foreach { case (id, n, _, seq, off) =>
        assert(seq * 512L + off == cum,
          s"shard $shard doc $id: seq=$seq off=$off cum=$cum")
        cum += n
      }
      // greedy rule: every earlier sequence of the shard is filled past
      // its start before the next opens — seq ids are non-decreasing
      // and skip nothing
      val seqs = inOrder.map(_._4).toSeq
      assert(seqs.distinct == seqs.distinct.sorted)
      assert(seqs.distinct.zipWithIndex.forall { case (s, i) => s == i.toLong })
    }
  }

  test("100-token docs on a 512 budget: the 6th doc of a shard straddles at offset 500") {
    val rows = packed()
    rows.groupBy(_._3).foreach { case (_, rs) =>
      val inOrder = rs.sortBy(r => (r._4, r._5))
      if (inOrder.length >= 6) {
        val sixth = inOrder(5)
        assert(sixth._4 == 0L && sixth._5 == 500L,
          "doc starting at cum 500 stays in seq 0 and spills")
      }
    }
  }

  test("token conservation and partitioning-independence") {
    val a = packed().toSet
    import spark.implicits._
    val b = CurationOps.exportPackedSequences(docs.repartition(7), 4, 512L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(a == b, "assignments are a pure function of content ids")
    assert(a.toSeq.map(_._2).sum == 200L * 100L)
    assert(a.map(_._3).subsetOf((0 until 4).toSet), "shards in range")
  }

  test("count-driven shard default: every test corpus resolves to the " +
    "gate floor of 16; a 100 TB-shaped count scales it") {
    import spark.implicits._
    assert(CurationOps.autoShards(docs) == 16,
      "small corpora must resolve to the gate-preserving floor")
    // parquet answers count(*) from metadata; range() likewise — the
    // resolution is one metadata-cheap action at any size
    val big = spark.range(20L * CurationOps.AutoShardDocs).toDF("doc_id")
    assert(CurationOps.autoShards(big) == 20,
      "above 16 x target the shard count tracks corpus size")
    // AutoShards sentinel routes through the resolver
    val viaDefault = CurationOps.exportPackedSequences(docs).collect()
      .map(_.getInt(2)).toSet
    assert(viaDefault.subsetOf((0 until 16).toSet) && viaDefault.size > 1)
  }

  test("pack invariants hold at two shard counts (the scale knob moves " +
    "freely): seq_id*budget + offset == per-shard running sum at 4 and 16") {
    Seq(4, 16).foreach { nSh =>
      val rows = packed(nSh)
      assert(rows.map(_._3).toSet.size > 1, s"multiple shards at $nSh")
      rows.groupBy(_._3).foreach { case (shard, rs) =>
        val inOrder = rs.sortBy(r => (r._4, r._5))
        var cum = 0L
        inOrder.foreach { case (id, n, _, seq, off) =>
          assert(seq * 512L + off == cum,
            s"nShards=$nSh shard $shard doc $id: seq=$seq off=$off cum=$cum")
          cum += n
        }
      }
      assert(rows.map(_._2).sum == 200L * 100L,
        s"token conservation at nShards=$nSh")
    }
  }
}
