package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.Exchange

/** Physical-plan fingerprinting for the bench/audit artifacts.
  *
  * A per-round bench timing alone can't distinguish "this query got
  * slower because the machine was loaded" from "an edit changed the
  * plan" — so every benched query also reports a fingerprint of the
  * plan Spark chose: a hash of the canonicalized physical plan
  * (expr-ids normalized, so it's stable across sessions), the exchange
  * count (each one is a cluster-wide shuffle or broadcast at 100 TB),
  * and a scan summary (scan count, pushed-filter count, total columns
  * read). Two rounds with equal fingerprints and different timings =
  * machine noise; a fingerprint diff = a real plan change to explain.
  */
object PlanFingerprint {

  /** @param hash     12-hex md5 of the canonicalized pre-AQE physical plan
    * @param exchanges  shuffle + broadcast exchange nodes in the plan
    * @param scans      leaf scan nodes
    * @param pushedFilters  filters pushed into file scans (sum)
    * @param readCols   columns actually read across file scans (sum) */
  final case class Fp(hash: String, exchanges: Int, scans: Int,
      pushedFilters: Int, readCols: Int) {
    /** Compact single-token rendering for the bench JSON. */
    def render: String = s"$hash:x$exchanges:s$scans:pf$pushedFilters:rc$readCols"
  }

  /** Fingerprints the query WITHOUT executing it. Uses the AQE
    * INITIAL plan (post-EnsureRequirements, so exchanges are present)
    * rather than `sparkPlan` (no exchanges inserted yet) or the
    * AQE-finalized plan (depends on runtime metrics and only exists
    * after execution) — the initial plan is fully determined by
    * code + statistics, i.e. reproducible across rounds. */
  def of(df: DataFrame): Fp = {
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    // canonicalization normalizes exprIds but NOT (a) the session-global
    // plan_id counter ("[plan_id=175]") — depends on how many queries
    // ran earlier in the session; (b) typed-lambda identities
    // ("$Lambda$3667/0x00007fb6...@71bb6009") — JVM memory addresses;
    // (c) subquery/exchange tags ("scalar-subquery#123", "[id=#45]") —
    // session counters. Mask all of them or fingerprints differ across
    // runs of the IDENTICAL query.
    val canon = plan.canonicalized.toString
      .replaceAll("plan_id=\\d+", "plan_id=*")
      .replaceAll("\\$Lambda\\$\\d+/0x[0-9a-f]+", "\\$Lambda\\$*")
      .replaceAll("@[0-9a-f]{6,}", "@*")
      .replaceAll("#\\d+", "#*")
    val md5 = java.security.MessageDigest.getInstance("MD5")
    val hash = md5.digest(canon.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val exchanges = plan.collect { case e: Exchange => e }.size
    val leaves = plan.collectLeaves()
    val fileScans = plan.collect { case f: FileSourceScanExec => f }
    val pushed = fileScans.map { f =>
      f.metadata.get("PushedFilters") match {
        case Some(s) if s != "[]" => s.count(_ == ',') + 1
        case _ => 0
      }
    }.sum
    val readCols = fileScans.map(_.requiredSchema.size).sum
    Fp(hash, exchanges, leaves.size, pushed, readCols)
  }
}
