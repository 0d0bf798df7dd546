package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Evidence that the engine's skew story has TWO layers: the explicit
  * salted pre-aggregation (skew_salted_agg / salted as-of) for known
  * hot keys, and Spark AQE's runtime skew-join split for skew nobody
  * predicted. This spec pins the second: a sort-merge join whose left
  * side is 95% one key must come out of adaptive execution with the
  * skewed partition SPLIT (the `isSkew=true` marker), not one straggler
  * task dragging the stage — the 1000-executor failure mode where a
  * single task gets the hot key's entire partition.
  */
class AqeSkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("AQE splits a skewed sort-merge join partition at runtime") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // shrink thresholds so a ~MB-scale test partition counts as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "131072",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force SMJ
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // left: 200k rows, 95% on key 0, payload padding to give the hot
      // partition real bytes; right: 10 keys, too big to broadcast only
      // because broadcasting is disabled
      val left = spark.range(200000).select(
        when(col("id") % 20 =!= 0, 0L).otherwise(col("id") % 10).as("k"),
        concat(lit("x"), col("id").cast("string"),
          lit("_pad_pad_pad_pad_pad_pad_pad_pad")).as("payload"))
      val right = spark.range(10).select(
        col("id").as("k"), concat(lit("dim_"), col("id").cast("string")).as("name"))
      val joined = left.join(right, "k")
      // collect (not count): count would prune the payload before the
      // shuffle, leaving the hot partition under the skew byte
      // threshold — and collect finalizes THIS QueryExecution's
      // adaptive plan (foreach/rdd actions run a derived one)
      val n = joined.collect().length
      assert(n == 200000, "inner join on a complete dim must keep every row")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") && plan.contains("skew=true"),
        s"expected a skew-split sort-merge join in:\n${plan.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
