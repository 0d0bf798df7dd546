package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused CC scale probe (manual main). */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.t(spark, "/root/testdata/sf0.1", "documents")
    val docs = (0 until k).map(i =>
      base.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_ unionByName _)
    spark.range(100000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { r =>
      val t0 = System.nanoTime()
      val n = graft.ops.GraphOps.connectedComponents(
        docs.select(col("doc_id").as("node")),
        graft.ops.DedupOps.lshCandidatePairs(docs).toDF("src", "dst")).count()
      println(f"[cc] ${k}x run $r: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
