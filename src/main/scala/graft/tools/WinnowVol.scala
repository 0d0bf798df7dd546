package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object WinnowVol {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for ((sf, dir) <- Seq("sf0.01" -> "/root/testdata/sf0.01",
        "sf0.1" -> "/root/testdata/sf0.1", "sf1" -> "/tmp/graft_sf1")) {
      val docs = graft.Tables.t(spark, dir, "documents")
      val fps = graft.ops.DedupOps.winnowFingerprints(docs)
      val nFp = fps.count()
      val gatedVol = fps.groupBy("fp").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= 50)
        .agg(sum(col("df") * (col("df") - 1) / 2)).collect()(0)
      println(s"[wv] $sf fps=$nFp gated_pair_volume=${gatedVol.get(0)}")
    }
    spark.stop()
  }
}
