package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.CurationOps

/** Two-phase anneal schedule (`mix_anneal_plan`): budget split
  * arithmetic, the quality gate carving phase 2, per-phase caps, and
  * determinism. */
class AnnealPlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Three sources: "clean" (all docs pass the Gopher gate), "mixed"
    * (half pass — the no-stopword violator), "junk" (none pass). */
  private def docs = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val good = "the quick brown fox jumps, over all dogs today."
    val bad = "zzz yyy xxx www vvv uuu."   // no stopword
    (
      (0 until 20).map(i => (i.toLong, "clean", good)) ++
      (20 until 30).map(i => (i.toLong, "mixed", good)) ++
      (30 until 40).map(i => (i.toLong, "mixed", bad)) ++
      (40 until 50).map(i => (i.toLong, "junk", bad))
    ).toDF("doc_id", "source", "text")
  }

  test("phase budgets split by the div-first rule; junk is excluded from phase 2") {
    val rows = CurationOps.annealPlan(docs).collect()
      .map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(2), r.getLong(4), r.getLong(5)))).toMap
    // phase 1 sees all three sources at full mass; phase 2 only the
    // gate survivors: clean at full mass, mixed at half, junk absent
    assert(rows.keySet.map(_._2) == Set("clean", "mixed", "junk"))
    assert(rows.contains((1L, "junk")) && !rows.contains((2L, "junk")))
    val (cleanAvail1, _, _) = rows((1L, "clean"))
    val (cleanAvail2, _, _) = rows((2L, "clean"))
    assert(cleanAvail2 == cleanAvail1, "clean survives the gate whole")
    val (mixedAvail1, _, _) = rows((1L, "mixed"))
    val (mixedAvail2, _, _) = rows((2L, "mixed"))
    assert(mixedAvail2 < mixedAvail1 && mixedAvail2 > 0L,
      "only the gate-passing half of mixed anneals")
    // budget arithmetic: allocations stay within each phase's budget
    val tFull = rows.collect { case ((1L, _), (av, _, _)) => av }.sum
    val b = tFull * CurationOps.EpochBudgetMult
    val b2 = (b / 1000000L) * CurationOps.AnnealFracPpm
    val alloc1 = rows.collect { case ((1L, _), (_, a, _)) => a }.sum
    val alloc2 = rows.collect { case ((2L, _), (_, a, _)) => a }.sum
    assert(alloc1 <= b - b2 && alloc2 <= b2)
    // per-phase repetition cap in ppm
    rows.values.foreach { case (_, _, epochsPpm) =>
      assert(epochsPpm <= CurationOps.EpochMax * 1000000L)
    }
  }

  test("deterministic under repartition") {
    val a = CurationOps.annealPlan(docs).collect().map(_.toSeq).toSet
    val b = CurationOps.annealPlan(docs.repartition(7)).collect()
      .map(_.toSeq).toSet
    assert(a == b)
  }
}
