package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-round cost attribution for the pocket-perceptron trainer. */
object PercProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)")
      .write.format("noop").mode("overwrite").save()
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.1", "documents")
    for (r <- Seq(1, 2, 4, 8)) {
      val t0 = System.nanoTime()
      graft.ops.TextOps.perceptronTrain(docs, rounds = r)
        .write.format("noop").mode("overwrite").save()
      println(f"[probe] rounds=$r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val t0 = System.nanoTime()
    graft.ops.TextOps.perceptronFeatures(docs)
      .write.format("noop").mode("overwrite").save()
    println(f"[probe] featurize only: ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }
}
