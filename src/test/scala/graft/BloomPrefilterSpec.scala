package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.Tables.{t, revenueC4}

/** The bloom runtime-filter's three claims, each measured:
  * correctness (zero false negatives ⇒ result ≡ plain join),
  * effectiveness (the prefilter drops most non-joining fact rows
  * before the shuffle), and plan shape (the bit-test filter sits on
  * the fact side BELOW its join exchange — rows are dropped pre-
  * shuffle, which is the entire point at 100 TB).
  */
class BloomPrefilterSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.01"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val result =
    SparkEntry.queries("join_bloom_prefilter")(spark, dir)

  test("result is bit-identical to the plain join (no false negatives)") {
    val plain = t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      .agg(count(lit(1)).as("n_items"),
        sum(revenueC4(col("l_extendedprice"), col("l_discount")))
          .as("sum_rev_c4"))
    val got = result.collect().map(_.toSeq).toSet
    val want = plain.collect().map(_.toSeq).toSet
    assert(got == want, s"${got.size} vs ${want.size} rows")
  }

  test("prefilter drops most non-joining fact rows before the shuffle") {
    spark.udf.register("bloom_or", udaf(
      new graft.functions.BloomAgg(graft.queries.Coverage.BloomBits,
        graft.queries.Coverage.BloomJ)))
    val urgent = t(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val bloom = urgent
      .select(graft.queries.Coverage.bloomH("bf1:", col("o_orderkey")).as("h1"),
        graft.queries.Coverage.bloomH("bf2:", col("o_orderkey")).as("h2"))
      .agg(expr("bloom_or(h1, h2)").as("bf"))
    val li = t(spark, dir, "lineitem")
      .withColumn("h1", graft.queries.Coverage.bloomH("bf1:", col("l_orderkey")))
      .withColumn("h2", graft.queries.Coverage.bloomH("bf2:", col("l_orderkey")))
    val total = li.count()
    val kept = li.crossJoin(broadcast(bloom))
      .where(expr(graft.queries.Coverage.bloomMightContain)).count()
    val joining = li.join(urgent,
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(kept >= joining, "bloom dropped a joining row — false negative")
    // urgent ≈ 20 % of orders; with fpp ≈ 2 % the pass rate must stay
    // well under half even if the data drifts
    assert(kept < total / 2, s"prefilter kept $kept of $total rows")
    // and false positives are bounded: kept - joining ≤ 5 % of total
    assert(kept - joining <= total / 20,
      s"fp rows ${kept - joining} of $total")
  }

  test("the bit-test filter sits below the fact side's join exchange") {
    // pre-AQE initial plan: exchanges are inserted and the tree is a
    // plain SparkPlan (the AQE wrapper hides children behind stages)
    val plan = graft.tools.PlanFingerprint.initialPlan(result)
    import org.apache.spark.sql.execution.exchange.Exchange
    val factSide = plan.collect {
      case e: Exchange
          if e.treeString.contains("lineitem") &&
            e.treeString.contains("shiftright") => e
    }
    assert(factSide.nonEmpty,
      "no exchange found whose lineitem subtree carries the bloom bit-test " +
        "filter — the prefilter is not running before the shuffle")
  }
}
