package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures what whole-stage codegen buys AsofJoinExec: the same
  * merge + parent filter/aggregate, timed with
  * spark.sql.codegen.wholeStage on vs off (min-of-N warm runs each).
  * The codegen path fuses the merge with its parents (no JoinedRow, no
  * per-row UnsafeProjection, no iterator dispatch), so the delta is
  * the per-row interpretation overhead — reported for SURVEY, not
  * asserted (wall-clock ratios are machine-sensitive; the plan-shape
  * and parity contracts live in AsofNativeCodegenSpec).
  *
  * Usage: runMain graft.tools.AsofCgBench [rows] [runs]
  */
object AsofCgBench {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000000
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val left = spark.range(n).select(col("id").as("l_id"),
      (col("id") % 5000).as("k"), ((col("id") * 37) % 100000).as("ts"),
      concat(lit("payload-"), col("id")).as("pl"))
    val right = spark.range(n / 4).select(col("id").as("r_id"),
      (col("id") % 5000).as("k"), ((col("id") * 91) % 100000).as("ts"),
      concat(lit("rp-"), col("id")).as("rp"))

    def query(): DataFrame =
      graft.plans.AsofJoinNative.asof(left, right, Seq("k"), "ts", "ts",
        Map("r_id" -> "m_id", "rp" -> "m_rp"), tieBreak = Seq("r_id"),
        broadcast = Some(false))
        .filter(col("m_id").isNotNull)
        .groupBy((col("k") % 50).as("b"))
        .agg(count(lit(1)).as("c"), sum(length(col("m_rp"))).as("s"))

    def time(codegen: Boolean): Double = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
      query().write.format("noop").mode("overwrite").save() // warm
      (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        query().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    // interleave-resistant: off first, then on, then re-check off
    val off1 = time(codegen = false)
    val on = time(codegen = true)
    val off2 = time(codegen = false)
    val off = math.min(off1, off2)
    println(f"""{"metric":"asof_codegen","rows":$n,"off_sec":$off%.3f,"on_sec":$on%.3f,"speedup":${off / on}%.2f}""")
    spark.stop()
  }
}
