package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.GraphOps

/** Unit oracle for distributed connected components: exact expected
  * labels on graphs chosen to stress each mechanism — multi-edge
  * cliques (one round), a long path (pointer-jumping convergence,
  * would need diameter rounds under plain propagation), isolated
  * vertices, and direction/duplicate-edge noise.
  */
class GraphOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)],
      maxIter: Int = 30): Map[Long, Long] = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    GraphOps.connectedComponents(
        nodes.toDF("node"), edges.toDF("src", "dst"), maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("clique + pair + isolated vertex") {
    val got = cc(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L),
      Seq((2L, 1L), (3L, 2L), (1L, 3L), (5L, 4L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 6L, 7L -> 7L))
  }

  test("long path collapses via pointer jumping (diameter 63, few rounds)") {
    val n = 64L
    // path 1-2-3-...-64, reversed edge direction to prove symmetry
    val got = cc((1L to n), (1L until n).map(i => (i + 1, i)))
    assert(got.size == n)
    assert(got.values.forall(_ == 1L))
  }

  test("duplicate and self edges are harmless") {
    val got = cc(Seq(1L, 2L, 3L),
      Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("two mid-size components never merge") {
    // ring 1..10 and star 100..110 — no cross edges
    val ring = (1L to 10L).map(i => (i, if (i == 10L) 1L else i + 1))
    val star = (101L to 110L).map(i => (100L, i))
    val got = cc((1L to 10L) ++ (100L to 110L), ring ++ star)
    assert((1L to 10L).forall(got(_) == 1L))
    assert((100L to 110L).forall(got(_) == 100L))
  }
}
