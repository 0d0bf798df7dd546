package graft.tools

/** Fingerprint-stability debug harness (manual main).
  *
  * Round-5 verdict found 4 scalar-subquery queries whose fingerprint
  * HASH changed between two idle bench runs while the structural
  * summary (x/s/pf/rc) and timing were identical — i.e. a
  * session-varying token in the canonicalized text that the
  * [[PlanFingerprint.canonText]] masks miss. This tool makes the
  * hashed bytes inspectable: it plans the named queries twice in ONE
  * JVM — once in a fresh session, once after "polluting" the session
  * counters by planning `warmup` other queries — and writes both canon
  * texts to `outDir/<name>.{a,b}.txt`. A byte diff between .a and .b
  * is exactly the token class that needs masking.
  *
  * Usage: runMain graft.tools.FpDebug OUTDIR [WARMUP] [names...]
  */
object FpDebug {

  val Unstable: Seq[String] = Seq(
    "q15_top_supplier", "subquery_above_avg", "q19_brandqty", "q17_small_qty")

  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val warmup = if (args.length > 1) args(1).toInt else 40
    val names = if (args.length > 2) args.drop(2).toSeq else Unstable

    val spark = PlanDump.session()
    def canonOf(name: String): String =
      PlanFingerprint.textOf(graft.SparkEntry.queries(name)(spark, PlanDump.Sf))

    // pass A: fresh counters
    names.foreach { n =>
      java.nio.file.Files.writeString(outDir.resolve(s"$n.a.txt"), canonOf(n))
    }
    // pollute: plan (don't run) a bunch of other queries to advance
    // every session/JVM counter the way a full bench run would
    graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(names.contains).take(warmup)
      .foreach { n =>
        try graft.SparkEntry.queries(n)(spark, PlanDump.Sf)
          .queryExecution.executedPlan
        catch { case _: Throwable => () }
      }
    // pass B: shifted counters
    names.foreach { n =>
      java.nio.file.Files.writeString(outDir.resolve(s"$n.b.txt"), canonOf(n))
    }
    names.foreach { n =>
      val a = java.nio.file.Files.readString(outDir.resolve(s"$n.a.txt"))
      val b = java.nio.file.Files.readString(outDir.resolve(s"$n.b.txt"))
      println(s"[fpdebug] $n stable=${a == b}")
    }
    spark.stop()
  }
}
