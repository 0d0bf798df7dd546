package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MultimodalOps
import graft.ops.MultimodalOps.MediaRow

/** The decode contract the SQL oracle can't see: batch shape (a real
  * decoder gets fixed-size payload batches) and shuffle-freeness. */
class MultimodalOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("decode preserves every row across partitions and batch boundaries") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // 5 partitions × uneven sizes; batchSize 64 → partial final batches
    val rows = (0L until 1000L).map(i =>
      MediaRow(i, s"payload-$i".getBytes("UTF-8"), Seq("image", "audio", "video")((i % 3).toInt)))
    val ds = spark.createDataset(rows).repartition(5)
    val out = MultimodalOps.decodeMeta(ds).collect()
    assert(out.length == 1000)
    assert(out.map(_.doc_id).toSet == (0L until 1000L).toSet)
    // deterministic: same payload → same fake dimensions
    val m = out.map(r => r.doc_id -> r).toMap
    assert(m(7L).width == MultimodalOps.decodeMeta(ds).collect()
      .find(_.doc_id == 7L).get.width)
    assert(out.forall(r => r.width >= 16 && r.channels >= 1 && r.channels <= 4))
  }

  test("decode is shuffle-free (no Exchange in the plan)") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(MediaRow(1, Array[Byte](1, 2), "image")))
    val plan = MultimodalOps.decodeMeta(ds).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode must not shuffle:\n$plan")
  }
}
