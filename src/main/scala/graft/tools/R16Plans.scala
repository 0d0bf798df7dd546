package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-16 optimization evidence: dumps `.explain("formatted")` for a
  * list of queries into `plans/r16/<query>_<suffix>.txt` (suffix =
  * args(0), e.g. "before"/"after"), normalized with the same volatile-
  * token masking as the committed fixtures so a before/after diff
  * shows plan changes, not exprId churn. Same pinned planning context
  * as [[PlanDump]] (sf0.01, the correctness-gate scale).
  *
  * Usage: runMain graft.tools.R16Plans <suffix> <query> [query...]
  */
object R16Plans {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val names = args.drop(1).toSeq
    val spark = PlanDump.session()
    val dir = java.nio.file.Paths.get("plans/r16")
    java.nio.file.Files.createDirectories(dir)
    names.foreach { name =>
      val plan = PlanDump.normalizedPlan(spark, name)
      java.nio.file.Files.writeString(
        dir.resolve(s"${name}_$suffix.txt"), plan)
      println(s"[r16plans] wrote ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
