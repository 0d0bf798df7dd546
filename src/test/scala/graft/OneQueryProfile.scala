package graft

import org.apache.spark.sql.SparkSession

/** Time a single SparkEntry query at sf0.1 (manual tuning main):
  * `sbt "Test/runMain graft.OneQueryProfile <query_name> [runs]"`. */
object OneQueryProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("dq_profile")
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    val fn = SparkEntry.queries(name)
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
      println(f"[one] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
