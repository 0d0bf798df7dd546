package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.AsofJoinNative

/** [[graft.plans.BroadcastAsofJoinExec]] — the small-right-side
  * physical strategy for the native as-of. Pins:
  *  - plan shape: BroadcastExchange on the right, NO hash exchange and
  *    NO sort anywhere (the left side streams through untouched);
  *  - the strategy's size-based auto-pick (unhinted: broadcast under
  *    autoBroadcastJoinThreshold, shuffle merge when the threshold is
  *    disabled) and both hint directions;
  *  - row parity with the co-partitioned merge exec on a tie-heavy
  *    workload, and the shared NULL contract.
  */
class BroadcastAsofSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  private def workload() = {
    import spark.implicits._
    // deterministic, tie-heavy: many right rows share (k, ts)
    val l = (0 until 4000).map { i =>
      (i.toLong, (i * 37 % 23).toLong, ((i * 91) % 500).toLong)
    }.toDF("l_id", "k", "ts")
    val r = (0 until 2000).map { i =>
      (1000L + i, (i * 13 % 23).toLong, ((i * 7) % 250 * 2).toLong)
    }.toDF("r_id", "k", "ts")
    (l, r)
  }

  private def run(l: DataFrame, r: DataFrame,
      broadcast: Option[Boolean]): DataFrame =
    AsofJoinNative.asof(l, r, Seq("k"), "ts", "ts",
      Map("r_id" -> "m_id", "ts" -> "m_ts"), tieBreak = Seq("r_id"),
      broadcast = broadcast)

  test("broadcast plan: BroadcastExchange right, zero shuffles, zero sorts") {
    spark.sparkContext.setLogLevel("WARN")
    val (l, r) = workload()
    val plan = finalPlan(run(l, r, broadcast = Some(true)))
    assert(plan.contains("BroadcastAsofJoin"), s"expected the broadcast exec:\n$plan")
    assert(plan.contains("BroadcastExchange"), s"right side should broadcast:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"broadcast as-of must not shuffle:\n$plan")
    assert(!"(?m)^\\s*[+:]- \\*?\\(?\\d*\\)? ?Sort ".r.findFirstIn(plan).isDefined,
      s"broadcast as-of must not sort:\n$plan")
  }

  test("strategy auto-picks by right-side stats vs autoBroadcastJoinThreshold") {
    val (l, r) = workload()
    // tiny right side, default 10 MB threshold → broadcast
    val auto = finalPlan(run(l, r, broadcast = None))
    assert(auto.contains("BroadcastAsofJoin"),
      s"small right side should auto-broadcast:\n$auto")
    // threshold disabled → the co-partitioned merge
    val conf = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(conf)
    spark.conf.set(conf, "-1")
    try {
      val merged = finalPlan(run(l, r, broadcast = None))
      assert(merged.contains("AsofJoin") && !merged.contains("BroadcastAsofJoin"),
        s"disabled threshold should fall back to the merge exec:\n$merged")
      // and the hint overrides the disabled threshold
      val hinted = finalPlan(run(l, r, broadcast = Some(true)))
      assert(hinted.contains("BroadcastAsofJoin"),
        s"explicit hint should override the threshold:\n$hinted")
    } finally spark.conf.set(conf, prev)
  }

  test("row parity with the merge exec on a tie-heavy workload") {
    val (l, r) = workload()
    val bcast = run(l, r, broadcast = Some(true))
    val merge = run(l, r, broadcast = Some(false))
    assert(bcast.exceptAll(merge).isEmpty && merge.exceptAll(bcast).isEmpty,
      "broadcast and merge as-of disagree")
    // sanity: ties resolved identically (max tieBreak at the match ts)
    assert(bcast.count() == l.count(), "left row count must be preserved")
  }

  test("NULL contract matches the merge exec") {
    import spark.implicits._
    val left = Seq(
      (1L, Some(1L), Some(10L)),
      (2L, None: Option[Long], Some(10L)), // null key
      (3L, Some(1L), None: Option[Long])   // null ts
    ).toDF("l_id", "k", "ts")
    val right = Seq(
      (20L, Some(1L), Some(5L)),
      (21L, None: Option[Long], Some(1L)), // null right key: never a match
      (22L, Some(1L), None: Option[Long])  // null right ts: never a match
    ).toDF("r_id", "k", "ts")
    val out = AsofJoinNative.asof(left, right, Seq("k"), "ts", "ts",
      Map("r_id" -> "m"), broadcast = Some(true))
      .select("l_id", "m").as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> Some(20L), 2L -> None, 3L -> None))
  }

  test("codegen: probe fuses into the left scan's stage; rows match interpreted") {
    val (l, r) = workload()
    def rows(codegen: Boolean): Seq[String] = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
      try run(l, r, broadcast = Some(true))
        .collect().map(_.toString).sorted.toSeq
      finally spark.conf.unset("spark.sql.codegen.wholeStage")
    }
    assert(rows(codegen = true) == rows(codegen = false))
    // the fused stage: a starred BroadcastAsofJoin with a parent
    // filter consuming the probe's columns in the same stage
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    try {
      val df = run(l, r, broadcast = Some(true)).filter(col("m_id").isNotNull)
      val plan = finalPlan(df)
      assert("\\*\\(\\d+\\) BroadcastAsofJoin".r.findFirstIn(plan).isDefined,
        s"expected the broadcast as-of inside a codegen stage:\n$plan")
    } finally spark.conf.unset("spark.sql.codegen.wholeStage")
  }

  test("needCopyResult propagates from a multi-output streamed side") {
    import spark.implicits._
    // A multi-match broadcast hash join BELOW the as-of fuses into the
    // same codegen stage and appends several rows per processNext. The
    // stage root (the as-of) must report the streamed side's
    // needCopyResult=true, or WholeStageCodegen skips .copy() and every
    // buffered row aliases the single reused rowWriter buffer — the
    // collect comes back as N copies of the last row.
    val l = (0 until 1000).map(i => (i.toLong, (i % 7).toLong, (i % 200).toLong))
      .toDF("l_id", "k", "ts")
    // two dim rows per key → BHJ multipleOutputForOneInput = true
    val dup = (0 until 7).flatMap(k => Seq((k.toLong, s"a$k"), (k.toLong, s"b$k")))
      .toDF("k", "tag")
    val r = (0 until 300).map(i => (5000L + i, (i % 7).toLong, (i * 2 % 100).toLong))
      .toDF("r_id", "k", "ts")
    def rows(codegen: Boolean): Seq[String] = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
      try {
        val enriched = l.join(broadcast(dup), "k")
        AsofJoinNative.asof(enriched, r, Seq("k"), "ts", "ts",
          Map("r_id" -> "m_id"), broadcast = Some(true))
          .collect().map(_.toString).sorted.toSeq
      } finally spark.conf.unset("spark.sql.codegen.wholeStage")
    }
    val cg = rows(codegen = true)
    assert(cg.distinct.size > 1000, "workload must produce distinct rows")
    assert(cg == rows(codegen = false),
      "codegen rows diverge from interpreted — buffered rows aliased")
  }

  test("empty right side → all-null matches, row count preserved") {
    import spark.implicits._
    val left = Seq((1L, 1L, 10L), (2L, 2L, 20L)).toDF("l_id", "k", "ts")
    val right = Seq.empty[(Long, Long, Long)].toDF("r_id", "k", "ts")
    val out = AsofJoinNative.asof(left, right, Seq("k"), "ts", "ts",
      Map("r_id" -> "m"), broadcast = Some(true))
    assert(out.count() == 2)
    assert(out.filter(col("m").isNotNull).count() == 0)
  }
}
