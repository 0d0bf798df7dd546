package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The auto-rewrite rule: a pure-SQL geodesic theta-join must (a) stop
  * planning as a cartesian and (b) return exactly the rows the naive
  * plan returns. */
class GeodesicJoinRuleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // extensions only apply at session CREATION — a session left over
    // from another suite in this JVM would shadow them
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession).foreach(_.stop())
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("georule-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  private def mkPoints(name: String, n: Int, seed: Int): DataFrame = {
    import spark.implicits._
    // deterministic scatter in a ~2 km box near 31.3N
    val rows = (0 until n).map { i =>
      val h = (i * 2654435761L + seed) & 0xffffffffL
      val lon = -103.5 + (h % 1000) * 2e-5
      val lat = 31.3 + ((h >> 10) % 1000) * 1.8e-5
      (i.toLong, lon, lat)
    }
    rows.toDF(s"${name}_id", s"${name}_lon", s"${name}_lat")
  }

  test("geodesic theta-join rewrites to a grid equi-join with identical results") {
    spark.sparkContext.setLogLevel("WARN")
    mkPoints("a", 400, 1).createOrReplaceTempView("pa")
    mkPoints("b", 400, 7).createOrReplaceTempView("pb")
    val sql =
      """SELECT a_id, b_id,
        |  st_geodesic_distance(a_lon, a_lat, b_lon, b_lat) AS d
        |FROM pa JOIN pb
        |  ON st_geodesic_distance(a_lon, a_lat, b_lon, b_lat) <= 25.0""".stripMargin

    val withRule = spark.sql(sql)
    val planStr = withRule.queryExecution.executedPlan.toString
    assert(!planStr.contains("CartesianProduct") && !planStr.contains("NestedLoop"),
      s"rewritten plan must not be a cartesian:\n$planStr")
    assert(planStr.contains("SortMergeJoin") || planStr.contains("ShuffledHashJoin"),
      s"expected a shuffled equi-join:\n$planStr")

    val got = withRule.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // independent oracle: exhaustive driver-side double loop through the
    // SAME geodesic kernel (immune to the rule — no Spark plan at all)
    val as = mkPoints("a", 400, 1).collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val bs = mkPoints("b", 400, 7).collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val expected = (for {
      (ai, alon, alat) <- as
      (bi, blon, blat) <- bs
      if graft.geo.Geodesic.distance(alon, alat, blon, blat) <= 25.0
    } yield (ai, bi)).toSet

    assert(got == expected,
      s"row mismatch: only-rewritten=${(got -- expected).take(5)} only-naive=${(expected -- got).take(5)}")
    assert(got.nonEmpty, "test data must produce at least one in-range pair")
  }
}
