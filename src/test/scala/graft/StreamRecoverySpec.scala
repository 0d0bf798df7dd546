package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** Exactly-once across restart: a streaming query killed and restarted
  * from its checkpoint must neither lose nor duplicate rows, and the
  * dedup operator's seen-keys STATE must survive the restart (a dupe
  * arriving after recovery is still dropped). */
class StreamRecoverySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("file-source stream + dedup state survive a checkpointed restart") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val inDir = Files.createTempDirectory("rec_in").toString
    val outDir = Files.createTempDirectory("rec_out").toString
    val ckDir = Files.createTempDirectory("rec_ck").toString

    def ev(id: Long, minute: Int): (Long, Timestamp, Long, String, Double) =
      (id, Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00"), 1L, "click", 1.0)
    val schema = Seq(ev(0, 0)).toDF("event_id", "ts", "user_id", "event_type", "value").schema

    def start() = {
      val src = spark.readStream.schema(schema).parquet(inDir)
      EventStreams.dedupEvents(src, watermark = "2 hours")
        .select("event_id", "user_id", "event_type")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .outputMode("append").start()
    }

    // batch 1: events 1..3
    Seq(ev(1, 1), ev(2, 2), ev(3, 3))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(inDir)
    val q1 = start()
    q1.processAllAvailable(); q1.stop()

    // batch 2 lands while the query is DOWN: new events 4..5 plus a
    // DUPLICATE of event 2 (state must remember it across restart)
    Seq(ev(4, 10), ev(5, 11), ev(2, 12))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(inDir)
    val q2 = start()
    q2.processAllAvailable(); q2.stop()

    val out = spark.read.parquet(outDir).select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(1L, 2L, 3L, 4L, 5L),
      s"expected exactly-once 1..5, got $out")
  }
}
