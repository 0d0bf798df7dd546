package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsofJoin
import graft.plans.AsofJoinNative

/** Native as-of join (custom LogicalPlan + Strategy + SparkPlan):
  *   1. row-identical to the composed union+window [[AsofJoin.asof]] on
  *      a hot-key workload with timestamp ties;
  *   2. the self-as-of case (left/right filtered off the SAME scan) —
  *      the ExprId-collision trap the wrapper's re-alias exists for;
  *   3. the physical plan actually contains AsofJoinExec fed by TWO
  *      hash exchanges + sorts placed by EnsureRequirements (the
  *      operator declares distribution/ordering, it does not shuffle);
  *   4. handcrafted edges: non-strict match at equal ts, tie-break
  *      last-wins, no-match → null payload, SQL NULL semantics (null
  *      key/ts matches nothing), empty right side.
  */
class AsofNativeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("native == composed on a hot-key workload with ts ties") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    def rows(n: Int, seed: Int) = (0 until n).map { i =>
      val h = (i * 2654435761L + seed) & 0xffffffffL
      val key = if (h % 10 < 8) 0L else (h % 10)
      (i.toLong, key, ((h >> 4) % 50L) * 1000L)
    }
    val left = rows(2000, 3).toDF("l_id", "k", "ts")
    val right = rows(500, 11).toDF("r_id", "k", "ts")
    val composed = AsofJoin.asof(left, right, Seq("k"), "ts", "ts",
      Map("r_id" -> "match_id"), tieBreak = Seq("r_id"))
      .select("l_id", "k", "ts", "match_id")
    val native = AsofJoinNative.asof(left, right, Seq("k"), "ts", "ts",
      Map("r_id" -> "match_id"), tieBreak = Seq("r_id"),
      broadcast = Some(false))
      .select("l_id", "k", "ts", "match_id")
    assert(sortedRows(native) == sortedRows(composed))
  }

  test("self-as-of off one scan plans and matches composed") {
    import spark.implicits._
    val ev = (0 until 1000).map { i =>
      val h = (i * 40503L + 7) & 0xffffL
      (i.toLong, h % 7L, (h % 97L) * 100L, if (i % 3 == 0) "purchase" else "click")
    }.toDF("id", "user", "ts", "typ")
    val l = ev.filter(col("typ") === "purchase").select("id", "user", "ts")
    val r = ev.filter(col("typ") === "click").select("id", "user", "ts")
    val native = AsofJoinNative.asof(l, r, Seq("user"), "ts", "ts",
      Map("id" -> "click_id", "ts" -> "click_ts"), tieBreak = Seq("id"),
      broadcast = Some(false))
    val composed = AsofJoin.asof(l, r, Seq("user"), "ts", "ts",
      Map("id" -> "click_id", "ts" -> "click_ts"), tieBreak = Seq("id"))
    assert(sortedRows(native.select("id", "user", "ts", "click_id", "click_ts"))
      == sortedRows(composed.select("id", "user", "ts", "click_id", "click_ts")))
  }

  test("plan: AsofJoinExec with two EnsureRequirements-placed exchanges+sorts") {
    import spark.implicits._
    // The session is shared across suites in one JVM and several suites
    // flip spark.sql.adaptive.* on it via getOrCreate, so pin every conf
    // this plan assertion depends on and restore afterwards — the test
    // must not depend on suite ordering.
    val pinned = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      // parallelismFirst keeps tiny partitions alive to fill cores; for
      // a deterministic coalesce-to-1 on toy input, size must drive
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false")
    val saved = pinned.map { case (k, _) => k -> spark.conf.getOption(k) }
    pinned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val l = Seq((1L, 1L), (2L, 2L)).toDF("k", "ts")
      val r = Seq((1L, 1L), (2L, 2L)).toDF("k", "ts2")
      val df = AsofJoinNative.asof(l, r, Seq("k"), "ts", "ts2",
        Map("ts2" -> "m"), broadcast = Some(false))
      df.collect() // finalize the adaptive plan
      // the AQE plan string repeats the tree (Final + Initial) — count
      // operators in the final section only
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.contains("AdaptiveSparkPlan"), plan)
      assert(plan.contains("AsofJoin"), plan)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 2, s"expected 2 hash exchanges, plan:\n$plan")
      assert("Sort \\[".r.findAllIn(plan).size == 2, s"expected 2 sorts, plan:\n$plan")
      // AQE coalesced BOTH shuffle reads (one coalesce group for a
      // non-union binary node — partition alignment the merge relies on)
      assert("AQEShuffleRead coalesced".r.findAllIn(plan).size == 2, plan)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("edges: non-strict ts, tie-break last-wins, null semantics, no match") {
    import spark.implicits._
    val left = Seq(
      (10L, 1L, 100L),            // exact-ts right row matches (>=)
      (11L, 1L, 99L),             // only earlier rows match
      (12L, 2L, 500L),            // no right rows for key 2 → null
      (13L, 3L, 100L)             // right key 3 rows all later → null
    ).toDF("l_id", "k", "ts")
    val right = Seq(
      (20L, 1L, 100L), (21L, 1L, 100L), // tie at ts=100: r_id 21 wins
      (22L, 1L, 50L),
      (23L, 3L, 101L)
    ).toDF("r_id", "k", "ts")
    val out = AsofJoinNative.asof(left, right, Seq("k"), "ts", "ts",
      Map("r_id" -> "m"), tieBreak = Seq("r_id"), broadcast = Some(false))
      .select("l_id", "m").as[(Long, Option[Long])].collect().toMap
    assert(out == Map(10L -> Some(21L), 11L -> Some(22L),
      12L -> None, 13L -> None))
  }

  test("edges: null keys/timestamps match nothing (SQL semantics)") {
    import spark.implicits._
    val left = Seq(
      (1L, Some(1L), Some(10L)),
      (2L, None: Option[Long], Some(10L)),  // null key
      (3L, Some(1L), None: Option[Long])    // null ts
    ).toDF("l_id", "k", "ts")
    val right = Seq(
      (20L, Some(1L), Some(5L)),
      (21L, None: Option[Long], Some(1L)),  // null right key: never a match
      (22L, Some(1L), None: Option[Long])   // null right ts: never a match
    ).toDF("r_id", "k", "ts")
    val expected = Map(1L -> Some(20L), 2L -> None, 3L -> None)
    val native = AsofJoinNative.asof(left, right, Seq("k"), "ts", "ts",
      Map("r_id" -> "m"), broadcast = Some(false))
      .select("l_id", "m").as[(Long, Option[Long])].collect().toMap
    assert(native == expected)
    // the composed union+window form must agree: a caller switching
    // forms per workload (e.g. to asofSalted for a hot key) must not
    // silently change NULL behavior
    val composed = AsofJoin.asof(left, right, Seq("k"), "ts", "ts",
      Map("r_id" -> "m"))
      .select("l_id", "m").as[(Long, Option[Long])].collect().toMap
    assert(composed == expected)
  }

  test("edges: empty right side → all-null matches, row count preserved") {
    import spark.implicits._
    val left = Seq((1L, 1L, 10L), (2L, 2L, 20L)).toDF("l_id", "k", "ts")
    val right = Seq.empty[(Long, Long, Long)].toDF("r_id", "k", "ts")
    val out = AsofJoinNative.asof(left, right, Seq("k"), "ts", "ts",
      Map("r_id" -> "m"), broadcast = Some(false))
    assert(out.count() == 2)
    assert(out.filter(col("m").isNotNull).count() == 0)
  }
}
