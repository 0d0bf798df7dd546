package graft.tools

/** Ad-hoc plan inspector (manual main): print the [[PlanFingerprint]]
  * structural summary and the normalized formatted plan for any
  * registered queries — the quick scale-hygiene check (exchange count,
  * broadcast vs shuffle, pushdown, read schema) for queries that are
  * not in [[PlanDump.Audited]]'s committed-fixture set.
  *
  * Usage: runMain graft.tools.PlanPeek [-v] name [name...]
  * (`-v` additionally prints each normalized formatted plan)
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val verbose = args.contains("-v")
    val names = args.filterNot(_ == "-v").toSeq
    val spark = PlanDump.session()
    names.foreach { name =>
      val fp = PlanFingerprint.of(
        graft.SparkEntry.queries(name)(spark, PlanDump.Sf)).render
      println(s"[peek] $name $fp")
      if (verbose) {
        println(PlanDump.normalizedPlan(spark, name))
        println("-" * 72)
      }
    }
    spark.stop()
  }
}
