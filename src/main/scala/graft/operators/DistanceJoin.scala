package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions.st_geodesic_distance

/** Library-level geodesic distance join (SURVEY §4.2's planner helper —
  * the DataFrame-API counterpart of [[graft.plans.GeodesicJoinRule]]):
  * all (left, right) pairs within `rangeM` meters, planned as a 3×3
  * neighbor-grid equi-join + exact residual predicate instead of a
  * cartesian.
  *
  * Cell sizing matches the rule: lat cells = range in degrees, lon
  * cells widened ×3.25 (correct to ~72° latitude); the exact geodesic
  * postfilter is authoritative, the grid only prunes.
  */
object DistanceJoin {

  /** @return left columns + right columns + `distance_m`. Column names
    *         must be disjoint across the two sides (alias beforehand). */
  def withinRange(
      left: DataFrame, right: DataFrame,
      leftLon: String, leftLat: String,
      rightLon: String, rightLat: String,
      rangeM: Double): DataFrame = {
    require(rangeM > 0, s"rangeM must be positive, got $rangeM")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "left/right column names must be disjoint — alias before joining")
    val rDeg = rangeM / 111000.0
    val cellLon = rDeg * 3.25
    val cellLat = rDeg

    val l = left
      .withColumn("__dj_cx", floor(col(leftLon) / cellLon).cast("long"))
      .withColumn("__dj_cy", floor(col(leftLat) / cellLat).cast("long"))
      .withColumn("__dj_off", explode(array(
        (for (dx <- -1 to 1; dy <- -1 to 1)
          yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)))
      .withColumn("__dj_jx", col("__dj_cx") + col("__dj_off.dx"))
      .withColumn("__dj_jy", col("__dj_cy") + col("__dj_off.dy"))
    val r = right
      .withColumn("__dj_kx", floor(col(rightLon) / cellLon).cast("long"))
      .withColumn("__dj_ky", floor(col(rightLat) / cellLat).cast("long"))

    l.join(r, col("__dj_jx") === col("__dj_kx") && col("__dj_jy") === col("__dj_ky"))
      .withColumn("distance_m",
        st_geodesic_distance(col(leftLon), col(leftLat), col(rightLon), col(rightLat)))
      .filter(col("distance_m") <= rangeM)
      .drop("__dj_cx", "__dj_cy", "__dj_off", "__dj_jx", "__dj_jy", "__dj_kx", "__dj_ky")
  }
}
