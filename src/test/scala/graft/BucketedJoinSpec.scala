package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.LayoutOps

/** Plan evidence for [[LayoutOps.writeBucketed]] — the part the DuckDB
  * oracle can't see (it checks the rollup is lossless; this checks the
  * layout actually deletes the join's exchanges).
  *
  * The claim at 100 TB: bucketing both fact tables on the join key
  * moves the shuffle to write time, so every subsequent join on that
  * key runs exchange-free. The observable on the executed plan:
  *   - both scans report the bucket count ("SelectedBucketsCount"),
  *   - a SortMergeJoin is present,
  *   - ZERO Exchange nodes exist below the join (the only exchange in
  *     the full rollup is the post-join re-aggregation on a DIFFERENT
  *     key, which no layout on the join key can remove),
  * while the identical join over the raw parquet plans 2 exchanges.
  */
class BucketedJoinSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fmt(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize AQE so the formatted plan is the executed one
    df.queryExecution.executedPlan.toString
  }

  private def nExchanges(plan: String): Int = {
    // AQE's toString appends the pre-adaptive "== Initial Plan ==";
    // count exchanges only in the executed (final) section
    val finalSection = plan.split("== Initial Plan ==")(0)
    "(?m)^.*Exchange hashpartitioning".r.findAllIn(finalSection).length
  }

  test("bucketed orders-lineitem join runs with zero exchanges below the join") {
    spark.sparkContext.setLogLevel("WARN")
    val tag = sf.replaceAll("[^A-Za-z0-9_]", "_")
    val base =
      s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_buckets_spec/$tag"
    LayoutOps.writeBucketed(
      Tables.t(spark, sf, "orders").select(col("o_orderkey"), col("o_orderpriority")),
      s"graft_spec_b_orders_$tag", s"$base/orders", 4, "o_orderkey",
      Seq("o_orderkey"))
    LayoutOps.writeBucketed(
      Tables.t(spark, sf, "lineitem").select(col("l_orderkey"), col("l_quantity")),
      s"graft_spec_b_lineitem_$tag", s"$base/lineitem", 4, "l_orderkey",
      Seq("l_orderkey"))

    val o = spark.table(s"graft_spec_b_orders_$tag")
    val l = spark.table(s"graft_spec_b_lineitem_$tag")

    // the join alone: NO exchange anywhere — both sides arrive
    // pre-hashed from the bucketed files
    val joined = o.hint("merge").join(l, col("o_orderkey") === col("l_orderkey"))
    val joinPlan = fmt(joined)
    assert(joinPlan.contains("SortMergeJoin"), s"expected SMJ:\n$joinPlan")
    assert(nExchanges(joinPlan) == 0,
      s"bucketed join should be exchange-free:\n$joinPlan")
    assert(joinPlan.contains("SelectedBucketsCount"),
      s"scans should be bucket-aware:\n$joinPlan")

    // one file per bucket: the pre-write repartition uses the same
    // murmur3 hash as the bucket assignment, so writer task i holds
    // exactly bucket i
    assert(LayoutOps.countParquetFiles(spark, s"$base/orders") == 4,
      "expected exactly one file per bucket for orders")

    // full rollup: the ONLY exchange is the post-join groupBy on
    // o_orderpriority (different key — no join-key layout removes it)
    val rollup = joined.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"))
    val rollupPlan = fmt(rollup)
    assert(nExchanges(rollupPlan) == 1,
      s"expected exactly the agg exchange:\n$rollupPlan")

    // the identical join over raw parquet needs both join shuffles
    val rawO = Tables.t(spark, sf, "orders").select(col("o_orderkey"), col("o_orderpriority"))
    val rawL = Tables.t(spark, sf, "lineitem").select(col("l_orderkey"), col("l_quantity"))
    val rawPlan = fmt(rawO.hint("merge").join(rawL, col("o_orderkey") === col("l_orderkey")))
    assert(nExchanges(rawPlan) == 2,
      s"unbucketed baseline should shuffle both sides:\n$rawPlan")
  }

  test("aggregation on the bucket key is also exchange-free") {
    val tag = sf.replaceAll("[^A-Za-z0-9_]", "_")
    val o = spark.table(s"graft_spec_b_orders_$tag")
    val agg = o.groupBy("o_orderkey").agg(count(lit(1)).as("n"))
    val plan = fmt(agg)
    assert(nExchanges(plan) == 0,
      s"groupBy(bucket key) should reuse the bucket layout:\n$plan")
  }

  test("native as-of join over a bucketed events table is exchange-free and sort-free") {
    val tag = sf.replaceAll("[^A-Za-z0-9_]", "_")
    val base =
      s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_buckets_spec/$tag"
    // bucket by the as-of key, sort buckets by (key, ts): the scan then
    // satisfies BOTH AsofJoinExec child requirements —
    // ClusteredDistribution(key) via the bucket hash and
    // (key, ts)-ascending ordering via the per-bucket sort (Spark only
    // trusts bucket sort order with ONE file per bucket, which
    // writeBucketed guarantees — AND only when
    // legacy.bucketedTableScan.outputOrdering is on: reporting the
    // ordering needs a file listing at planning, so Spark defaults it
    // off; flipping it is the documented opt-in for sorted-bucket
    // layouts). Filters and the wrapper's re-aliasing Project both
    // preserve partitioning and ordering in Spark 4
    // (PartitioningPreserving/OrderPreservingUnaryExecNode), so the
    // whole as-of runs with zero exchanges AND zero sorts.
    val orderingConf = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    val prevOrdering = spark.conf.getOption(orderingConf)
    spark.conf.set(orderingConf, "true")
    try {
    LayoutOps.writeBucketed(
      Tables.t(spark, sf, "events")
        .select(col("user_id"), col("ts"), col("event_type"), col("value")),
      s"graft_spec_b_events_$tag", s"$base/events", 4, "user_id",
      Seq("user_id", "ts"))
    val ev = spark.table(s"graft_spec_b_events_$tag")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value").as("click_value"))
    val joined = graft.plans.AsofJoinNative.asof(
      purchases, clicks, keys = Seq("user_id"),
      leftTs = "ts", rightTs = "ts",
      rightPayload = Map("click_value" -> "last_click_value"),
      broadcast = Some(false)) // the point here is the scan-fed merge
    val plan = fmt(joined)
    assert(plan.contains("AsofJoin"), s"expected the native exec:\n$plan")
    assert(nExchanges(plan) == 0,
      s"bucketed as-of should be exchange-free:\n$plan")
    val finalSection = plan.split("== Initial Plan ==")(0)
    assert(!"(?m)^\\s*[+:]- \\*?\\(?\\d*\\)? ?Sort ".r.findFirstIn(finalSection).isDefined,
      s"bucketed as-of should need no Sort:\n$plan")

    // parity: same result as the unbucketed native as-of
    val rawEv = Tables.t(spark, sf, "events")
    val rawP = rawEv.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    val rawC = rawEv.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value").as("click_value"))
    val rawJoined = graft.plans.AsofJoinNative.asof(
      rawP, rawC, keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
      rightPayload = Map("click_value" -> "last_click_value"),
      broadcast = Some(false))
    assert(joined.exceptAll(rawJoined).isEmpty && rawJoined.exceptAll(joined).isEmpty,
      "bucketed and raw as-of results differ")
    } finally {
      prevOrdering match {
        case Some(v) => spark.conf.set(orderingConf, v)
        case None    => spark.conf.unset(orderingConf)
      }
    }
  }
}
