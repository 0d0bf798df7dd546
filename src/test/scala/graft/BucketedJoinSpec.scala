package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the co-located join pattern from the brief: two fact
  * tables bucketed on the join key join with ZERO exchanges — at 100 TB
  * the difference between a full-cluster shuffle and a local merge. */
class BucketedJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession).foreach(_.stop())
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("bucketed-by-key join plans with zero exchanges and exact results") {
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.001"
    val li = graft.Tables.t(spark, sf, "lineitem")
    val ord = graft.Tables.t(spark, sf, "orders")

    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    val joined = spark.table("li_b")
      .join(spark.table("ord_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum(round(col("l_extendedprice") * 100).cast("long")).as("px_c"))

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself reads co-located buckets: no exchange below it
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected SortMergeJoin:\n$plan")
    val belowJoin = plan.substring(joinIdx)
    assert(!belowJoin.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle its inputs:\n$plan")

    // results identical to the unbucketed join
    val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum(round(col("l_extendedprice") * 100).cast("long")).as("px_c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = joined.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)

    spark.sql("DROP TABLE li_b"); spark.sql("DROP TABLE ord_b")
  }
}
