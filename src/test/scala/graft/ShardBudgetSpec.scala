package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.CurationOps

/** Token-budget mixture selection and deterministic export sharding.
  * The driver gate additionally cross-checks both against DuckDB at
  * sf0.01 (`mix_token_budget`, `export_shards`). */
class ShardBudgetSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val docs =
    Tables.t(spark, "/root/testdata/sf0.001", "documents")

  test("budget mixture: greedy-prefix invariant per stratum") {
    val budget = 800L
    val sel = CurationOps.mixTokenBudget(docs, budget).cache()
    val budgets = CurationOps.MixWeights.map { case (k, f) =>
      k -> Math.round(f * budget)
    }.toMap
    val perLang = sel.groupBy("lang")
      .agg(sum("n_tokens").as("kept"), max("cum_before").as("max_before"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    perLang.foreach { case (lang, (kept, maxBefore, _)) =>
      val b = budgets(lang)
      // every kept doc started under budget; the whole stratum either
      // exhausted its documents or reached the budget (overshoot <= 1 doc)
      assert(maxBefore < b, s"$lang: kept a doc at/after the budget line")
      val total = docs.filter(col("lang") === lang)
        .select(sum(size(graft.ops.TextOps.tokens(col("text")))).cast("long"))
        .head.getLong(0)
      assert(kept >= math.min(b, total),
        s"$lang: under-filled ($kept of min($b, $total))")
    }
    sel.unpersist()
  }

  test("budget mixture: selection is a pure function of content (partitioning-invariant)") {
    val a = CurationOps.mixTokenBudget(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = CurationOps.mixTokenBudget(docs.repartition(13)).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("export shards: positions dense from 1, offsets consistent, assignment deterministic") {
    val out = CurationOps.exportShards(docs, nShards = 8).cache()
    assert(out.count() == docs.count(), "sharding must be a permutation")
    // per-shard positions are exactly 1..n
    val bad = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"),
        countDistinct("pos").as("nd"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1 || col("nd") =!= col("n"))
    assert(bad.isEmpty, "positions must be dense 1..n per shard")
    // cum_bytes at the last position equals the shard's total bytes
    val byShard = out.join(docs.select("doc_id", "n_chars"), "doc_id")
      .groupBy("shard").agg(sum("n_chars").as("total"), max("cum_bytes").as("last"))
      .filter(col("total") =!= col("last"))
    assert(byShard.isEmpty, "running offset must end at the shard total")
    // repartitioning the input changes nothing
    val again = CurationOps.exportShards(docs.repartition(7), nShards = 8)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    out.unpersist()
  }

  test("export shards: plan is one hash exchange, no global sort") {
    val plan = CurationOps.exportShards(docs).queryExecution
      .executedPlan.toString
    assert(!plan.contains("rangepartitioning"),
      s"global sort leaked into the shard plan:\n$plan")
    val nExchange = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(nExchange == 1, s"expected exactly 1 hash exchange, got $nExchange:\n$plan")
  }
}
