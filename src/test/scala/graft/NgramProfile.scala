package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for dedup_ngram_jaccard (not a test — a main,
  * run manually while tuning; kept out of the Bench/Verify surfaces). */
object NgramProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warmup
    spark.range(100000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    val docs = Tables.t(spark, d, "documents")
    time("kernel pass only (shingle_hashes -> noop)") {
      docs.select(col("doc_id"), graft.ops.DedupOps.shingleHashes(col("text")).as("shs"))
        .write.format("noop").mode("overwrite").save()
    }
    time("full ngramJaccardPairs run 1") {
      graft.ops.DedupOps.ngramJaccardPairs(docs).write.format("noop").mode("overwrite").save()
    }
    time("full ngramJaccardPairs run 2") {
      graft.ops.DedupOps.ngramJaccardPairs(docs).write.format("noop").mode("overwrite").save()
    }
    println(s"[prof] output pairs=${graft.ops.DedupOps.ngramJaccardPairs(docs).count()}")
    val stats = docs.select(size(split(col("text"), "\\s+")).as("n")).agg(
      count(lit(1)), avg(col("n")), max(col("n"))).collect()(0)
    println(s"[prof] docs=${stats.getLong(0)} avg_tokens=${stats.getDouble(1)} max=${stats.getInt(2)}")
    spark.stop()
  }
}
