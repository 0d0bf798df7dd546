package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime-filtering evidence for the 100 TB grade: the two optimizer
  * mechanisms that turn a selective dim filter into fact-side scan
  * pruning at RUN time (static pushdown can't see across a join).
  *
  * - Dynamic partition pruning: a join on a PARTITION column reuses
  *   the broadcast of the filtered dim side to skip entire partition
  *   directories of the fact scan — on a date-partitioned 100 TB
  *   table, a one-month dim filter reads one month of files.
  * - Runtime bloom-filter join: when the join key is NOT a partition
  *   column, a bloom filter built from the filtered creation side is
  *   pushed into the application-side scan, dropping most fact rows
  *   before the shuffle instead of after it.
  *
  * Both asserted on plan SHAPE (dynamicpruning / might_contain in the
  * fact scan) and on result parity with the plain join.
  */
class RuntimeFilterSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private val scratch =
    s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_rtfilter"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("dynamic partition pruning: dim filter prunes the fact partition scan") {
    spark.sparkContext.setLogLevel("WARN")
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
      .map(k => k -> conf.getOption(k)).toMap
    // KB-scale local files make the cost model call pruning "not
    // beneficial"; force the ratio path the way a TB-scale fact side
    // would naturally satisfy it
    conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "10")
    try dppBody()
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  private def dppBody(): Unit = {
    val path = s"$scratch/orders_by_prio"
    val orders = Tables.t(spark, sf, "orders")
    orders.select(col("o_orderkey"), col("o_custkey"),
        Tables.cents(col("o_totalprice")).as("px_c"), col("o_orderpriority"))
      .write.partitionBy("o_orderpriority").mode("overwrite").parquet(path)

    val fact = spark.read.parquet(path)
    // the dim filter is on a NON-join column (status), so which
    // priorities survive is only knowable at runtime — a literal
    // filter on the join key itself would propagate through the join
    // as a STATIC partition filter and leave DPP nothing to do
    val dim = orders
      .select(col("o_orderpriority").as("prio"), col("o_orderstatus"))
      .distinct()
      .filter(col("o_orderstatus") === "P")
      .select(col("prio"))

    val joined = fact.join(dim, fact("o_orderpriority") === dim("prio"))
      .agg(count(lit(1)).as("n"), sum(col("px_c")).as("sum_c"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected dynamicpruningexpression in the fact scan:\n$plan")

    val Array(got) = joined.collect()
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    val Array(expected) =
      try fact.join(dim, fact("o_orderpriority") === dim("prio"))
        .agg(count(lit(1)).as("n"), sum(col("px_c")).as("sum_c")).collect()
      finally spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    assert(got == expected, s"DPP result mismatch: $got vs $expected")
    assert(got.getLong(0) > 0, "join matched no rows — dim filter too strict")
  }

  test("runtime bloom filter: selective dim filter reaches the fact scan as might_contain") {
    spark.sparkContext.setLogLevel("WARN")
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // local test data is KB-scale; drop the size gates so the rule
      // fires the way it would on a TB-scale application side
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // force a shuffle join — bloom filters target the pre-shuffle scan
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val li = Tables.t(spark, sf, "lineitem")
        .select(col("l_orderkey"), Tables.cents(col("l_quantity")).as("qty_c"))
      val ord = Tables.t(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))

      val joined = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("qty_c")).as("sum_qty_c"))

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom filter on the lineitem scan:\n$plan")

      val Array(got) = joined.collect()
      // parity vs the same join without the bloom filter
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val Array(expected) = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("qty_c")).as("sum_qty_c")).collect()
      assert(got == expected, s"bloom-filtered result mismatch: $got vs $expected")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
