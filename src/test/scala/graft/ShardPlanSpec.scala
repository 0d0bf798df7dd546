package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SimilarityOps

/** Cell→shard placement (`serve_shard_plan`): mass conservation,
  * exact serpentine arithmetic, the balance bound on adversarial
  * size sequences, and determinism. */
class ShardPlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def embeddings = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    (0 until 500).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 31 + j * 7).toFloat))
    }.toDF("vec_id", "embedding")
  }

  /** The serpentine stripe as pure arithmetic (the op's formula). */
  private def serp(rank: Long, s: Int): Int = {
    val idx = rank - 1
    if ((idx / s) % 2 == 0) (idx % s).toInt else (s - 1 - idx % s).toInt
  }

  test("conservation, rank order, and exact serpentine shards") {
    val rows = SimilarityOps.shardPlan(embeddings).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getLong(4)))
    assert(rows.map(_._2).sum == 500L, "every vector lands in a cell")
    val byRank = rows.sortBy(_._3)
    assert(byRank.map(_._3).toSeq == (1L to rows.length.toLong).toSeq)
    // ranks really order by (n_vecs desc, cid asc)
    byRank.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
    case _ => ()
    }
    rows.foreach { case (_, _, rank, shard, _) =>
      assert(shard == serp(rank, SimilarityOps.ServeShards))
    }
    // shard_load is the exact per-shard mass
    val loads = rows.groupBy(_._4).map { case (s, rs) => s -> rs.map(_._2).sum }
    rows.foreach { case (_, _, _, shard, load) =>
      assert(load == loads(shard))
    }
  }

  test("balance bound: max-min spread within the largest cell (incl. adversarial)") {
    val rows = SimilarityOps.shardPlan(embeddings).collect()
      .map(r => (r.getLong(1), r.getInt(3)))
    val loads = rows.groupBy(_._2).map(_._2.map(_._1).sum).toSeq
    assert(loads.max - loads.min <= rows.map(_._1).max)
    // adversarial descending sequences through the same arithmetic
    for (s <- Seq(2, 4, 8); sizes <- Seq(
      Seq(100L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L),
      (1L to 40L).reverse.map(x => x * x),
      Seq.fill(17)(7L))) {
      val load = Array.fill(s)(0L)
      sizes.sorted(Ordering[Long].reverse).zipWithIndex.foreach {
        case (sz, i) => load(serp(i + 1L, s)) += sz
      }
      assert(load.max - load.min <= sizes.max,
        s"s=$s sizes=${sizes.take(5)}...")
    }
  }

  test("placement is deterministic under repartition") {
    val a = SimilarityOps.shardPlan(embeddings).collect().map(_.toSeq).toSet
    val b = SimilarityOps.shardPlan(embeddings.repartition(7)).collect()
      .map(_.toSeq).toSet
    assert(a == b)
  }
}
