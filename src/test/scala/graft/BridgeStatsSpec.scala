package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the behavior Bridge.freshLocalCheckpoint exists for: a frame
  * re-entering an iterative self-join loop must NOT carry origin
  * statistics, or the size estimate cubes per round (S³ growth) and
  * the DRIVER stalls in BigInteger.multiply by round ~20 (observed on
  * diameter-3M graphs before the round-5 fix; CcAdversarialProfile
  * covers the end-to-end effect, this spec pins the mechanism so a
  * Spark-internals change that silently reintroduces originStats
  * fails CI, not a profile run three rounds later). */
class BridgeStatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sizeEstimate(df: org.apache.spark.sql.DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** One CC-ish round: self-join on the label column (the pointer
    * jump's shape), then re-checkpoint for the next round. */
  private def round(df: org.apache.spark.sql.DataFrame,
      checkpoint: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) = {
    val j = df.as("a").join(df.as("b"), col("a.v") === col("b.v"))
      .select(col("a.v").as("v"))
    checkpoint(j)
  }

  test("freshLocalCheckpoint: size estimate stays at the session default across rounds") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    var df = (1L to 64L).toDF("v")
    val defaultEstimate = sizeEstimate(
      org.apache.spark.sql.graft.Bridge.freshLocalCheckpoint(df))
    for (_ <- 1 to 6)
      df = round(df, org.apache.spark.sql.graft.Bridge.freshLocalCheckpoint)
    val after = sizeEstimate(df)
    assert(after == defaultEstimate,
      s"stats must reset to the session default every round: " +
        s"default=$defaultEstimate after-6-rounds=$after — " +
        "freshLocalCheckpoint stopped dropping originStats " +
        "(check LogicalRDD.copy's signature against the Bridge version pin)")
  }

  test("plain localCheckpoint (the baseline being avoided) cubes the estimate") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    var df = (1L to 64L).toDF("v").localCheckpoint()
    val start = sizeEstimate(df)
    for (_ <- 1 to 3) df = round(df, _.localCheckpoint())
    val after = sizeEstimate(df)
    // 3 rounds of S -> ~S^3: the estimate must have exploded past any
    // plausible real size — the driver-stall mechanism this suite pins
    assert(after > start.pow(4),
      s"expected cubing origin-stats growth, saw $start -> $after; " +
        "if Spark stopped propagating originStats through " +
        "localCheckpoint, freshLocalCheckpoint may no longer be needed")
  }
}
