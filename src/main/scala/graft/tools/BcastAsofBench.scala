package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures what the broadcast strategy buys the native as-of on its
  * target shape — a large left stream against a SMALL right timeline
  * (the "enrich events with the in-force config at each ts" workload):
  * the co-partitioned merge pays two hash exchanges + two sorts; the
  * broadcast exec pays one small broadcast + an executor-local index
  * build, and the left side never leaves its scan stage. Reported for
  * SURVEY, not asserted (wall-clock ratios are machine-sensitive; the
  * plan/parity contracts live in BroadcastAsofSpec).
  *
  * Usage: runMain graft.tools.BcastAsofBench [leftRows] [rightRows] [runs]
  */
object BcastAsofBench {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 4000000
    val m = if (args.length > 1) args(1).toInt else 5000
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val left = spark.range(n).select(col("id").as("l_id"),
      (col("id") % 1000).as("k"), ((col("id") * 37) % 100000).as("ts"),
      concat(lit("payload-"), col("id")).as("pl"))
    val right = spark.range(m).select(col("id").as("r_id"),
      (col("id") % 1000).as("k"), ((col("id") * 91) % 100000).as("ts"),
      concat(lit("cfg-"), col("id")).as("cfg"))

    def query(broadcast: Boolean): DataFrame =
      graft.plans.AsofJoinNative.asof(left, right, Seq("k"), "ts", "ts",
        Map("r_id" -> "m_id", "cfg" -> "m_cfg"), tieBreak = Seq("r_id"),
        broadcast = Some(broadcast))
        .filter(col("m_id").isNotNull)
        .groupBy((col("k") % 50).as("b"))
        .agg(count(lit(1)).as("c"), sum(length(col("m_cfg"))).as("s"))

    def time(broadcast: Boolean): Double = {
      query(broadcast).write.format("noop").mode("overwrite").save() // warm
      (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        query(broadcast).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    // parity guard: a wrong result would invalidate the timing claim
    val a = query(broadcast = true).collect().map(_.toString).sorted.toSeq
    val b = query(broadcast = false).collect().map(_.toString).sorted.toSeq
    require(a == b, "broadcast and merge results differ")

    val tMerge = time(broadcast = false)
    val tBcast = time(broadcast = true)
    println(f"[bcastasof] left=$n right=$m merge=$tMerge%.2f s broadcast=$tBcast%.2f s speedup=${tMerge / tBcast}%.2f x")
    spark.stop()
  }
}
