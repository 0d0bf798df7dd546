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

  test("keepExpiring: bucket owners AND armed expiry timers survive a restart") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val inDir = Files.createTempDirectory("lsh_in").toString
    val outDir = Files.createTempDirectory("lsh_out").toString
    val ckDir = Files.createTempDirectory("lsh_ck").toString
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val dupA = "duplicate payload arriving in two different micro batches here"
    val dupB = "a second duplicated text whose bucket timer must survive restart"
    def tsm(min: Long) = Timestamp.valueOf(
      java.time.LocalDateTime.of(2026, 1, 1, 10, 0).plusMinutes(min))
    def doc(id: Long, text: String, min: Long) = (id, text, tsm(min))
    val schema = Seq(doc(0, "x", 0)).toDF("doc_id", "text", "ts").schema
    def writeFile(rows: (Long, String, Timestamp)*): Unit =
      rows.toSeq.toDF("doc_id", "text", "ts")
        .coalesce(1).write.mode("append").parquet(inDir)

    // maxFilesPerTrigger=1: each file is its own microbatch, so the
    // watermark advances (and timers fire) BETWEEN files like a live
    // stream, not in one merged batch
    def start() = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
        .withWatermark("ts", "0 seconds")
      graft.streaming.StreamLshDedup.keepExpiring(src, retentionMs = 30L * 60000)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .outputMode("append").start()
    }

    try {
      // phase 1: claim dupA and dupB buckets at T+0 (timers arm at
      // T+30), plus one unique
      writeFile(doc(1, dupA, 0), doc(10, dupB, 0))
      writeFile(doc(2, "completely different text about spark query engines", 5))
      val q1 = start()
      q1.processAllAvailable(); q1.stop()

      // while DOWN: an in-horizon dupA re-send (owner state must be
      // restored for it to drop) and a watermark pusher past T+40
      writeFile(doc(3, dupA, 10))
      writeFile(doc(4, "yet another unrelated document mentioning parquet", 50))

      // phase 2: restart from the checkpoint. d3 must still collide
      // (restored owner), then the pusher advances the watermark past
      // both deadlines: dupA's timer T+40 was re-armed POST-restart by
      // d3's touch, but dupB's T+30 timer was armed PRE-restart and
      // only fires if timer state was checkpointed and restored.
      val q2 = start()
      q2.processAllAvailable()
      // phase 3 on the same query: both dups re-sent after expiry
      writeFile(doc(5, dupA, 100), doc(6, dupB, 100))
      q2.processAllAvailable(); q2.stop()

      val out = spark.read.parquet(outDir)
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L, 10L),
        s"every doc needs a verdict, got ${out.keySet}")
      assert(!out(3L), "in-horizon dup after restart must drop (owner state restored)")
      assert(out(5L), "dupA re-send after horizon must be kept")
      assert(out(6L), "dupB re-send must be kept — its expiry timer was armed " +
        "before the restart, so this fails if timers don't survive the checkpoint")
      assert(out(1L) && out(2L) && out(4L) && out(10L), s"uniques/owners kept: $out")
    } finally prev match {
      case Some(p) => spark.conf.set(provKey, p)
      case None => spark.conf.unset(provKey)
    }
  }
}
