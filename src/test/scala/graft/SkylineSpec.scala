package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SkylineOps

/** Brute-force oracle for the two-phase distributed skyline: the
  * quadratic NOT-EXISTS definition recomputed in plain Scala on
  * randomized inputs (with duplicate coordinates to exercise the
  * tie rule), the anti-correlated worst case where the frontier is
  * the whole input, and a 3-dimensional instance — so the local
  * frontier scan and the cross-partition anti-join are both checked
  * against semantics, not against each other.
  */
class SkylineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def dominates(a: Seq[Double], b: Seq[Double]): Boolean =
    a.zip(b).forall { case (x, y) => x <= y } && a != b

  private def brute(rows: Seq[(Long, Seq[Double])]): Set[Long] =
    rows.filter { case (_, p) =>
      !rows.exists { case (_, q) => dominates(q, p) }
    }.map(_._1).toSet

  private def engine2d(rows: Seq[(Long, Double, Double)],
      parts: Int): Set[Long] = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val df = rows.toDF("id", "x", "y").repartition(parts)
    SkylineOps.skyline(df, Seq("x", "y"))
      .collect().map(_.getLong(0)).toSet
  }

  test("random points with ties match the quadratic definition") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      // small coordinate range forces duplicate points and ties
      val rows = (1L to 400L).map(i =>
        (i, rnd.nextInt(20).toDouble, rnd.nextInt(20).toDouble))
      val want = brute(rows.map(r => (r._1, Seq(r._2, r._3))))
      assert(engine2d(rows, parts = 5) == want, s"trial $trial")
    }
  }

  test("anti-correlated worst case: every point is on the frontier") {
    val rows = (0L until 100L).map(i => (i, i.toDouble, (99 - i).toDouble))
    assert(engine2d(rows, parts = 7) == rows.map(_._1).toSet)
  }

  test("duplicates of a frontier point all survive; dominated dups die") {
    val rows = Seq(
      (1L, 1.0, 1.0), (2L, 1.0, 1.0), // twin minima — both kept
      (3L, 2.0, 2.0), (4L, 2.0, 2.0), // dominated twins — both dropped
      (5L, 0.5, 3.0))                 // frontier on x
    assert(engine2d(rows, parts = 3) == Set(1L, 2L, 5L))
  }

  test("3-dimensional skyline matches the quadratic definition") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1L to 300L).map(i =>
      (i, rnd.nextInt(8).toDouble, rnd.nextInt(8).toDouble,
        rnd.nextInt(8).toDouble))
    val want = brute(rows.map(r => (r._1, Seq(r._2, r._3, r._4))))
    val got = SkylineOps.skyline(
        rows.toDF("id", "x", "y", "z").repartition(6), Seq("x", "y", "z"))
      .collect().map(_.getLong(0)).toSet
    assert(got == want)
  }
}
