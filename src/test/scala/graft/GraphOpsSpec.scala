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

  test("cluster-size histogram: exact counts on a planted corpus, mass conserved") {
    import spark.implicits._
    // two identical docs (one LSH cluster of 2) + three unique docs
    val docs = Seq(
      1L -> "one two three four five six seven eight",
      2L -> "one two three four five six seven eight",
      3L -> "alpha beta gamma delta eps zeta eta theta",
      4L -> "red blue green yellow purple orange pink black",
      5L -> "cats dogs birds fish mice foxes wolves bears"
    ).toDF("doc_id", "text")
    val rows = {
      val edges = graft.ops.DedupOps.lshCandidatePairs(docs).toDF("src", "dst")
      val comp = GraphOps.connectedComponents(
        docs.select(org.apache.spark.sql.functions.col("doc_id").as("node")),
        edges, edgesUnique = true)
      import org.apache.spark.sql.functions._
      comp.groupBy("comp").agg(count(lit(1)).as("comp_size"))
        .groupBy("comp_size").agg(count(lit(1)).as("n_clusters"))
        .select(col("comp_size"), col("n_clusters"),
          (col("comp_size") * col("n_clusters")).as("n_docs"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    }
    assert(rows == Map(2L -> (1L, 2L), 1L -> (3L, 3L)))
    assert(rows.values.map(_._2).sum == 5L, "every doc in exactly one cluster")
  }

  test("long path collapses via pointer jumping (diameter 63, few rounds)") {
    val n = 64L
    // path 1-2-3-...-64, reversed edge direction to prove symmetry
    val got = cc((1L to n), (1L until n).map(i => (i + 1, i)))
    assert(got.size == n)
    assert(got.values.forall(_ == 1L))
  }

  test("rounds stay logarithmic in diameter (the O(log d) claim, pinned)") {
    import spark.implicits._
    // path graphs with diameter 256 vs 4096: plain propagation would
    // need d rounds; pointer jumping must stay ~log2(d) — and growing
    // the diameter 16x may add only ~log2(16)=4 rounds
    def rounds(n: Long): Int = {
      val (ccDf, r) = GraphOps.ccWithStats(
        spark.range(n).select(org.apache.spark.sql.functions.col("id").as("node")),
        spark.range(n - 1).selectExpr("id AS src", "id + 1 AS dst"),
        maxIter = 64)
      assert(ccDf.filter("comp != 0").isEmpty, s"path $n: wrong labels")
      r
    }
    val r256 = rounds(256)
    val r4096 = rounds(4096)
    assert(r256 <= 2 * 8 + 4, s"diameter 256 took $r256 rounds")
    assert(r4096 <= 2 * 12 + 4, s"diameter 4096 took $r4096 rounds")
    assert(r4096 - r256 <= 10,
      s"16x diameter added ${r4096 - r256} rounds — not logarithmic")
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

  // ------------------------------------------------- triangle census

  private def tri(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    GraphOps.triangleStats(edges.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  /** Brute-force per-vertex triangle counts over id-ordered triples. */
  private def bruteTri(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] = {
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    val cnt = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      a <- nodes; b <- adj(a).filter(_ > a); c <- adj(a).filter(_ > b)
      if adj(b).contains(c)
    } { cnt(a) += 1; cnt(b) += 1; cnt(c) += 1 }
    nodes.map { n =>
      val dg = adj(n).size.toLong
      val t = cnt(n)
      val lcc = if (dg >= 2) 2 * t * 1000000L / (dg * (dg - 1)) else 0L
      n -> ((dg, t, lcc))
    }.toMap
  }

  test("triangles: K4 + pendant + disjoint triangle, exact counts") {
    // K4 on 1..4 (every vertex in C(3,2)=3 triangles, lcc=1), a
    // pendant 5 hanging off 4 (deg 1, no triangles), triangle 7-8-9
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = k4 ++ Seq((4L, 5L), (7L, 8L), (8L, 9L), (7L, 9L))
    val got = tri(edges)
    assert(got(1L) == ((3L, 3L, 1000000L)))
    assert(got(2L) == ((3L, 3L, 1000000L)))
    assert(got(4L) == ((4L, 3L, 500000L))) // 2*3/(4*3) = 1/2
    assert(got(5L) == ((1L, 0L, 0L)))
    assert(got(7L) == ((2L, 1L, 1000000L)))
    assert(got == bruteTri(edges))
  }

  test("triangles: hub star produces zero wedges at the hub") {
    // star = no triangles at all; a degree-10 hub must not blow up
    val edges = (1L to 10L).map(i => (0L, i))
    val got = tri(edges)
    assert(got(0L) == ((10L, 0L, 0L)))
    assert((1L to 10L).forall(got(_) == ((1L, 0L, 0L))))
  }

  test("triangles: random graph matches brute force (property)") {
    // deterministic LCG so the case is reproducible
    var seed = 0x2545F4914F6CDD1DL
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
    val n = 40
    val edges = (1 to 260).map { _ =>
      val a = math.floorMod(next() >>> 33, n).toLong
      val b = math.floorMod(next() >>> 33, n).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct
    val got = tri(edges)
    val want = bruteTri(edges)
    val diff = (got.keySet ++ want.keySet).toSeq.sorted
      .filter(k => got.get(k) != want.get(k))
      .map(k => s"$k: got=${got.get(k)} want=${want.get(k)}")
    assert(got == want, s"rows ${got.size}/${want.size}; " + diff.mkString("; "))
    assert(want.values.map(_._2).sum > 0, "degenerate case: no triangles")
  }

  // ---------------------------------------------------- pagerank

  private def pr(edges: Seq[(Long, Long)], parts: Int = 4)
      : Map[Long, Long] = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    GraphOps.pageRankFixed(edges.toDF("src", "dst").repartition(parts))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
  }

  test("pagerank: star hub dominates; symmetric leaves rank equal") {
    val got = pr((1L to 8L).map(i => (0L, i)))
    assert(got(0L) > 3 * got(1L)) // hub collects every leaf's mass
    assert((1L to 8L).map(got).toSet.size == 1) // leaves interchangeable
    // floor-division leaks mass but never mints it; leak is tiny
    val mass = got.values.sum
    assert(mass <= 1000000000000L && mass > 950000000000L, s"mass $mass")
  }

  test("pagerank: cycle is exactly uniform") {
    val got = pr((0L until 6L).map(i => (i, (i + 1) % 6)).map {
      case (a, b) => (math.min(a, b), math.max(a, b)) })
    assert(got.values.toSet.size == 1) // perfect symmetry, bit-equal
  }

  test("pagerank: bit-identical across partition counts (determinism)") {
    var seed = 0x9E3779B97F4A7C15L
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
    val n = 50
    val edges = (1 to 300).map { _ =>
      val a = math.floorMod(next() >>> 33, n).toLong
      val b = math.floorMod(next() >>> 33, n).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct
    // same graph, three physical layouts: the integer arithmetic must
    // produce the SAME longs regardless of partial-aggregation order —
    // the property float pagerank cannot offer
    val a = pr(edges, parts = 1)
    val b = pr(edges, parts = 7)
    val c = pr(edges, parts = 32)
    assert(a == b && b == c)
  }
}
