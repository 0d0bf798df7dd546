package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *
  * Every bucketed table is created by a shared lazy fixture, so each
  * test also passes under `testOnly -- -z <name>` in isolation.
  */
class BucketedJoinSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val tag = sf.replaceAll("[^A-Za-z0-9_]", "_")
  private lazy val base =
    s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_buckets_spec/$tag"

  // shared fixtures: each lazy val writes its table exactly once per
  // suite run, whichever test touches it first
  private lazy val bucketedOrders: DataFrame = {
    spark.sparkContext.setLogLevel("WARN")
    LayoutOps.writeBucketed(
      Tables.t(spark, sf, "orders").select(col("o_orderkey"), col("o_orderpriority")),
      s"graft_spec_b_orders_$tag", s"$base/orders", 4, "o_orderkey",
      Seq("o_orderkey"))
    spark.table(s"graft_spec_b_orders_$tag")
  }
  private lazy val bucketedLineitem: DataFrame = {
    LayoutOps.writeBucketed(
      Tables.t(spark, sf, "lineitem").select(col("l_orderkey"), col("l_quantity")),
      s"graft_spec_b_lineitem_$tag", s"$base/lineitem", 4, "l_orderkey",
      Seq("l_orderkey"))
    spark.table(s"graft_spec_b_lineitem_$tag")
  }
  private lazy val bucketedEvents: DataFrame = {
    LayoutOps.writeBucketed(
      Tables.t(spark, sf, "events")
        .select(col("user_id"), col("ts"), col("event_type"), col("value")),
      s"graft_spec_b_events_$tag", s"$base/events", 4, "user_id",
      Seq("user_id", "ts"))
    spark.table(s"graft_spec_b_events_$tag")
  }

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

  private def hasSort(plan: String): Boolean = {
    val finalSection = plan.split("== Initial Plan ==")(0)
    "(?m)^\\s*[+:]- \\*?\\(?\\d*\\)? ?Sort ".r.findFirstIn(finalSection).isDefined
  }

  /** Runs `body` with sorted-bucket-scan ordering reporting on (the
    * documented opt-in for one-file-per-bucket sorted layouts). */
  private def withBucketOrdering[A](body: => A): A = {
    val conf = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    val prev = spark.conf.getOption(conf)
    spark.conf.set(conf, "true")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(conf, v)
      case None    => spark.conf.unset(conf)
    }
  }

  test("bucketed orders-lineitem join runs with zero exchanges below the join") {
    spark.sparkContext.setLogLevel("WARN")
    val o = bucketedOrders
    val l = bucketedLineitem

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
    val agg = bucketedOrders.groupBy("o_orderkey").agg(count(lit(1)).as("n"))
    val plan = fmt(agg)
    assert(nExchanges(plan) == 0,
      s"groupBy(bucket key) should reuse the bucket layout:\n$plan")
  }

  test("native as-of join over a bucketed events table is exchange-free and sort-free") {
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
    withBucketOrdering {
      val ev = bucketedEvents
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
      assert(!hasSort(plan), s"bucketed as-of should need no Sort:\n$plan")

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
    }
  }

  test("broadcast as-of composes with the bucketed layout: zero exchanges end-to-end, " +
      "one fused stage, and the bucket partitioning survives into a downstream agg") {
    // The round-8 pieces, composed: a bucketed-sorted left (the 100 TB
    // event log, laid out once at ingest) enriched by a BROADCAST
    // as-of (the small in-force timeline) and then aggregated PER KEY.
    // BroadcastAsofJoinExec demands nothing of its left child
    // (UnspecifiedDistribution) and passes the scan's partitioning and
    // ordering through (outputPartitioning/outputOrdering = left's), so
    //   scan -> filter -> probe -> partial agg
    // fuses into ONE codegen stage, and the groupBy(user_id) that
    // follows needs NO exchange either — the bucket hash still holds
    // after the as-of. Nothing in the whole plan moves data: the only
    // exchange anywhere is the BroadcastExchange of the small side.
    withBucketOrdering {
      val ev = bucketedEvents
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value").as("click_value"))
        .filter(pmod(col("user_id"), lit(4)) === 0) // small deterministic slice: a keyed timeline that fits a broadcast
      val enriched = graft.plans.AsofJoinNative.asof(
        purchases, clicks, keys = Seq("user_id"),
        leftTs = "ts", rightTs = "ts",
        rightPayload = Map("click_value" -> "last_click_value"),
        broadcast = Some(true))
      val perUser = enriched.groupBy("user_id")
        .agg(sum("last_click_value").as("s"), count(lit(1)).as("n"))
      val plan = fmt(perUser)
      assert(plan.contains("BroadcastAsofJoin"), s"expected the broadcast exec:\n$plan")
      assert(nExchanges(plan) == 0,
        s"bucketed left + broadcast right + agg-on-bucket-key should move no data:\n$plan")
      assert(!hasSort(plan),
        s"nothing in this plan should sort (agg is hash-based, as-of probes):\n$plan")
      assert("\\*\\(\\d+\\) BroadcastAsofJoin".r.findFirstIn(plan).isDefined,
        s"probe should fuse into the scan's codegen stage:\n$plan")

      // value parity vs the same composition over raw parquet (which
      // must shuffle for the agg instead)
      val rawEv = Tables.t(spark, sf, "events")
      val rawP = rawEv.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      val rawJoined = graft.plans.AsofJoinNative.asof(
        rawP, clicks, keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        rightPayload = Map("click_value" -> "last_click_value"),
        broadcast = Some(true))
      val rawAgg = rawJoined.groupBy("user_id")
        .agg(sum("last_click_value").as("s"), count(lit(1)).as("n"))
      assert(perUser.exceptAll(rawAgg).isEmpty && rawAgg.exceptAll(perUser).isEmpty,
        "bucketed and raw compositions disagree")
      assert(nExchanges(fmt(rawAgg)) == 1,
        "raw baseline should need the agg shuffle the layout deletes")
    }
  }
}
