package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DistanceJoin

/** The DataFrame-API distance join vs an exhaustive oracle. */
class DistanceJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("withinRange matches the exhaustive pair set, keyed plan") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    def pts(n: Int, seed: Int) = (0 until n).map { i =>
      val h = (i * 2654435761L + seed) & 0xffffffffL
      // ~70 x 70 grid of ~10 m cells: 300 points → dozens of close pairs
      (i.toLong, -103.5 + (h % 70) * 1e-4, 31.3 + ((h >> 9) % 70) * 9e-5)
    }
    val a = pts(300, 3).toDF("a_id", "a_lon", "a_lat")
    val b = pts(300, 11).toDF("b_id", "b_lon", "b_lat")
    val joined = DistanceJoin.withinRange(a, b, "a_lon", "a_lat", "b_lon", "b_lat", 30.0)

    val got = joined.select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      (ai, alon, alat) <- pts(300, 3)
      (bi, blon, blat) <- pts(300, 11)
      if graft.geo.Geodesic.distance(alon, alat, blon, blat) <= 30.0
    } yield (ai, bi)).toSet
    assert(got == expected)
    assert(got.nonEmpty)

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"), plan)
  }

  test("colliding column names and non-positive ranges are rejected up front") {
    import spark.implicits._
    val a = Seq((1L, 0.0, 0.0)).toDF("id", "lon", "lat")
    intercept[IllegalArgumentException] {
      DistanceJoin.withinRange(a, a, "lon", "lat", "lon", "lat", 10.0)
    }
    val b = Seq((1L, 0.0, 0.0)).toDF("id2", "lon2", "lat2")
    intercept[IllegalArgumentException] {
      DistanceJoin.withinRange(a, b, "lon", "lat", "lon2", "lat2", 0.0)
    }
  }
}
